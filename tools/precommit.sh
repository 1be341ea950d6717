#!/bin/bash
# Pre-commit gate: refuse any commit at a SHA that does not compile.
# Installed as .git/hooks/pre-commit (tools/install_hooks.sh); the
# round-16 snapshot shipped a one-line compile error committed 26 s
# before the driver's build proved it broken — this makes that
# impossible. Tests/verify stay in the closing checklist (NOTES.md);
# this hook only guarantees the invariant "every commit builds".
#
# Escape hatch for docs-only commits: SKIP_COMPILE=1 git commit ...
set -u
cd "$(git rev-parse --show-toplevel)"

if [ "${SKIP_COMPILE:-0}" = "1" ]; then
  echo "[precommit] SKIP_COMPILE=1 — skipping compile gate" >&2
  exit 0
fi

# Docs/artifact-only commits (no staged .scala/.sbt/.java) skip the JVM start.
if ! git diff --cached --name-only | grep -qE '\.(scala|sbt|java)$'; then
  exit 0
fi

echo "[precommit] staged JVM sources — running sbt compile Test/compile ..." >&2
if ! sbt -batch compile Test/compile >/tmp/precommit_compile.log 2>&1; then
  echo "[precommit] COMPILE FAILED — commit refused. Tail of log:" >&2
  tail -20 /tmp/precommit_compile.log >&2
  exit 1
fi
echo "[precommit] compile green" >&2
exit 0
