#!/bin/bash
# Installs the compile-gating pre-commit hook (tools/precommit.sh).
set -eu
cd "$(git rev-parse --show-toplevel)"
ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
chmod +x tools/precommit.sh
echo "pre-commit hook installed -> tools/precommit.sh"
