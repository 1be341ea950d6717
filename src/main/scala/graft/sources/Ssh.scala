package graft.sources

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** SFTP download source (reference `SshSource.groovy:51-183`): connect
  * to a remote SSH host, download one or more paths — files or
  * directories, directories recursively — and emit one row per fetched
  * file. The reference rides the JSch library; no SSH library ships in
  * this stack, so this drives the SYSTEM OpenSSH client (`sftp`), which
  * is what every cluster node images anyway — the transport, host-key
  * checking, and key handling are openssh's own, not a reimplementation.
  *
  * Row shape (the reference's keys, Spark-typed): `host`, `port`,
  * `filename` (base name — reference `filename`), `path` (full remote
  * path), `size`, `content` (the file bytes — the columnar analogue of
  * the reference's `stream`; a DataFrame cannot carry open
  * InputStreams).
  *
  * Auth: `identity(user, keyFile)` (publickey) is first-class.
  * `authPass(user, password)` rides OpenSSH's askpass hook
  * (`SSH_ASKPASS_REQUIRE=force` + a transient owner-only helper script
  * that is deleted after the transfer) — the only non-interactive
  * password path OpenSSH offers; prefer keys. `knownHosts(file)` /
  * `enableStrictHostCheck(b)` mirror the reference's host-key surface.
  *
  * Path safety: sftp batch files are LINE-oriented and honor the `!`
  * local-shell escape, so a path containing a control character (a
  * newline splits the batch line) or a double quote (ends the quoted
  * token) could inject batch commands. Such paths are REJECTED before
  * any batch file is written — a `require` here ([[Ssh.pathError]]),
  * a per-row `error` marker in the crawl-grade [[Ssh.fetchMany]].
  *
  * Scale shape: the transfer stages through a local temp directory on
  * the DRIVER — one sequential SFTP channel, exactly the reference's
  * topology — and the staged tree is then read distributed
  * (binaryFile). This is a modest-remote-drop ingest (the reference's
  * use case), not a 100 TB path: at corpus scale land the files on
  * shared storage and read them directly, or use [[Ssh.fetchMany]].
  * The staging tree must outlive the lazy binaryFile scan, so it is
  * deleted by a JVM shutdown hook, not eagerly.
  *
  * Testing note: no sshd exists in this environment, so the specs
  * validate the SFTP leg against the REAL OpenSSH client via its `-D`
  * direct-server flag (`extraArgs`) talking to a protocol-faithful
  * in-test SFTP v3 server; the network/auth leg is openssh's own code
  * and is exercised in any real deployment by the same argv this
  * builder assembles (spec-pinned). */
final case class SshSource(
    host: String,
    port: Int = 22,
    username: Option[String] = None,
    password: Option[String] = None,
    identityFile: Option[String] = None,
    knownHostsFile: Option[String] = None,
    strictHostCheck: Boolean = true,
    paths: Seq[String] = Nil,
    extraArgs: Seq[String] = Nil) {

  def authPass(user: String, pass: String): SshSource =
    copy(username = Some(user), password = Some(pass))

  def identity(user: String, keyFile: java.io.File): SshSource =
    copy(username = Some(user), identityFile = Some(keyFile.getAbsolutePath))

  def knownHosts(file: java.io.File): SshSource =
    copy(knownHostsFile = Some(file.getAbsolutePath))

  def enableStrictHostCheck(enable: Boolean): SshSource =
    copy(strictHostCheck = enable)

  /** Remote paths to fetch; a directory downloads recursively
    * (reference `download(String...)`). */
  def download(remotePaths: String*): SshSource =
    copy(paths = paths ++ remotePaths)

  /** Extra argv for the sftp client (ports/config/testing — e.g. the
    * spec's `-D <server command>`). */
  def withExtraArgs(args: String*): SshSource =
    copy(extraArgs = extraArgs ++ args)

  /** The argv this source hands the OpenSSH client — exposed so specs
    * pin the exact flag assembly (auth, host key, batch mode). */
  private[sources] def command(batchFile: Path): Seq[String] = {
    val target = username.map(u => s"$u@$host").getOrElse(host)
    Seq("sftp", "-b", batchFile.toString, "-P", port.toString) ++
      identityFile.toSeq.flatMap(f => Seq("-i", f)) ++
      knownHostsFile.toSeq.flatMap(f => Seq("-o", s"UserKnownHostsFile=$f")) ++
      Seq("-o", s"StrictHostKeyChecking=${if (strictHostCheck) "yes" else "no"}") ++
      // no password → BatchMode forbids prompts: a wrong key FAILS
      // loudly instead of hanging a headless job on a hidden prompt
      (if (password.isEmpty) Seq("-o", "BatchMode=yes") else Nil) ++
      extraArgs ++ Seq(target)
  }

  /** Run one sftp process for `batchFile` (used on the driver by
    * [[into]] and on EXECUTORS by [[Ssh.fetchMany]] — the case class
    * ships whole). `failOnExit = false` is the lenient per-row mode:
    * the batch's `-get` lines already ignore per-file failures, and
    * the caller reconciles which paths landed. Returns the combined
    * output for error reporting. */
  private[sources] def runSftp(
      batchFile: Path, scratch: Path, failOnExit: Boolean): String = {
    val pb = new ProcessBuilder(command(batchFile): _*)
    pb.redirectErrorStream(true)
    val askpass = password.map { pw =>
      // OpenSSH's non-interactive password hook: a transient helper
      // that prints the secret, forced via SSH_ASKPASS_REQUIRE. The
      // file is CREATED owner-only (rwx------) before the secret is
      // written — never a umask-default window — and deleted in the
      // finally below on success AND failure paths.
      val script = scratch.resolve(s"askpass-${System.nanoTime()}.sh")
      Files.createFile(script,
        java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
          java.nio.file.attribute.PosixFilePermissions.fromString("rwx------")))
      Files.writeString(script,
        s"#!/bin/sh\nprintf '%s' '${pw.replace("'", "'\\''")}'\n")
      pb.environment().put("SSH_ASKPASS", script.toString)
      pb.environment().put("SSH_ASKPASS_REQUIRE", "force")
      if (!pb.environment().containsKey("DISPLAY"))
        pb.environment().put("DISPLAY", ":0")
      script
    }
    try {
      val proc = pb.start()
      val output = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val code = proc.waitFor()
      if (code != 0 && failOnExit)
        throw new IllegalStateException(
          s"SshSource: sftp exited $code for $host:$port\n${output.takeRight(2000)}")
      output
    } finally askpass.foreach(Files.deleteIfExists(_))
  }

  /** Run the transfer and wrap the fetched files as a [[Pipeline]]. */
  def into(spark: SparkSession): Pipeline = {
    require(paths.nonEmpty, "SshSource: no paths to download — call download(...)")
    paths.foreach(p => Ssh.pathError(p).foreach(msg =>
      throw new IllegalArgumentException(s"SshSource: $msg: ${Ssh.printable(p)}")))
    val staging = Files.createTempDirectory("graft-ssh")
    // the staged tree must outlive the LAZY binaryFile scan below, so
    // it is reclaimed at JVM exit, not eagerly (ADVICE r19)
    Ssh.deleteRecursivelyOnExit(staging)
    val norm = paths.map(_.stripSuffix("/"))
    val batch = norm.zipWithIndex
      .map { case (p, i) => s"""get -R "$p" "$staging/k$i"""" }
      .mkString("", "\n", "\n")
    val batchFile = Files.writeString(staging.resolve("batch"), batch)

    runSftp(batchFile, staging, failOnExit = true)
    Files.deleteIfExists(batchFile)

    // staged tree → rows, read DISTRIBUTED; local staged paths map
    // back to remote paths by the k<i> prefix each batch line created.
    // Patterns anchor on the STAGING ROOT (quoted), never a bare
    // .*/k<i>/: a remote subtree that itself contains a directory
    // named k<i> must not be able to shift the match (ADVICE r19).
    val df = spark.read.format("binaryFile")
      .option("recursiveFileLookup", true)
      .load(staging.toString)
    val local = col("path")
    val stagingQ = java.util.regex.Pattern.quote(staging.toString)
    val remote = coalesce(norm.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        when(local.rlike(s"$stagingQ/k$i/"),
          concat(lit(p + "/"), regexp_extract(local, s"$stagingQ/k$i/(.*)", 1))),
        when(local.endsWith(s"$staging/k$i"), lit(p)))
    }: _*)
    val out = df.select(
      lit(host).as("host"),
      lit(port).as("port"),
      element_at(split(remote, "/"), -1).as("filename"),
      remote.as("path"),
      col("length").as("size"),
      col("content"))
    Pipeline.of(s"ssh($host:$port)", out)
  }
}

/** The loopback SFTP fixture behind the ssh gates and specs — the
  * analogue of `com.sun.net.httpserver` for the HTTP gates, which the
  * JDK does not provide for SFTP: a protocol-faithful read-only SFTP
  * v3 server over stdio (`TestSftpServer.java`, shipped as a
  * resource — the one deliberate test artifact in the main jar, see
  * COVERAGE.md — compiled ONCE per JVM), which the REAL OpenSSH
  * client connects to through its `-D` direct-server flag — so the
  * wire bytes on the client side of every gate/spec are openssh's
  * own, with no network or sshd needed. */
object SftpFixture {
  /** Compiled once per JVM: extract the server source, `javac` it to
    * a scratch classes dir, and return the `-D` command line that
    * runs the CLASS (no per-connection single-file source compile —
    * the r19 gate paid 4 JDK compiles per run). Falls back to
    * single-file source mode if no system compiler is present. */
  private lazy val compiledCommand: String = {
    val in = getClass.getResourceAsStream("/TestSftpServer.java")
    require(in != null, "TestSftpServer.java resource missing")
    val dir = Files.createTempDirectory("graft-sftp-fixture")
    Ssh.deleteRecursivelyOnExit(dir)
    val f = dir.resolve("TestSftpServer.java")
    try Files.copy(in, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    if (javac == null) s"java $f"
    else {
      val rc = javac.run(null, null, null,
        "-encoding", "UTF-8", "-d", dir.toString, f.toString)
      require(rc == 0, s"TestSftpServer.java failed to compile (javac rc=$rc)")
      s"java -cp $dir TestSftpServer"
    }
  }

  /** The `-D` command line that serves SFTP over stdio. */
  def serverCommand(): String = compiledCommand
}

object Ssh {
  /** Reference `SshSource.ssh(remoteHost, port)`. */
  def ssh(remoteHost: String, port: Int = 22): SshSource =
    SshSource(remoteHost, port)

  /** Why `p` cannot be written into an sftp batch file, or None if it
    * is safe. sftp batch files are line-oriented and honor the `!`
    * LOCAL-SHELL escape, so an embedded newline/CR is command
    * injection (remote-data-to-local-command on the executor for
    * [[fetchMany]], whose paths are crawl-grade row data); any other
    * control character is rejected with it, and a double quote would
    * end the quoted token. */
  private[sources] def pathError(p: String): Option[String] =
    if (p == null) Some("null path")
    else if (p.exists(_ < 0x20))
      Some("path contains a control character (sftp batch injection guard)")
    else if (p.contains("\""))
      Some("path contains a double quote (unsupported in sftp batch)")
    else None

  /** Control chars rendered visibly for error messages. */
  private[sources] def printable(p: String): String =
    if (p == null) "null"
    else p.flatMap(c => if (c < 0x20) f"\\x$c%02x" else c.toString)

  // one shutdown hook, many paths — registered lazily so JVMs that
  // never touch ssh pay nothing
  private val exitDeletions =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDeletions.forEach(p => deleteRecursivelyNow(p))))

  private[graft] def deleteRecursivelyNow(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }

  /** Register `p` for recursive deletion at JVM exit (staging trees
    * that must outlive a lazy scan — ADVICE r19). */
  private[sources] def deleteRecursivelyOnExit(p: Path): Unit = {
    hookInstalled
    exitDeletions.add(p)
  }

  /** Distributed per-row SFTP fetch — [[graft.sources.Http.requestMany]]'s
    * shape for remote file drops, and the scale-out form of
    * [[SshSource.into]]: `df` carries a remote FILE path per row; rows
    * round-robin across `parallelism` tasks; each task drives one sftp
    * process per `batchSize` rows (never a process per row), and each
    * row gains `content` (the fetched bytes) and `error` (NULL on
    * success). Fetching is crawl-grade LENIENT per row: batch lines
    * use sftp's `-` prefix so a missing remote file marks its own
    * row's `error` instead of killing the partition — one bad path in
    * a million can't kill the ingest. NULL paths and paths that fail
    * the batch-injection guard ([[pathError]]: control chars, `"`)
    * pass through with an error marker — crawl data is UNTRUSTED and
    * a newline in a path must never become a batch line. Auth /
    * host-key / extra-arg config rides a [[SshSource]] built with the
    * same fluent verbs (`download` paths on it are ignored — the
    * DataFrame is the path source here).
    *
    * Scale shape: the exchange below moves only the (small) path
    * rows (`repartition`, not `coalesce` — the requestMany lesson:
    * coalesce would throttle the whole upstream plan to `parallelism`
    * tasks), and content bytes materialize straight into each task's
    * rows — no driver staging, no shared filesystem needed. Disk
    * math: rows are fetched in sub-batches of `batchSize` files, each
    * file's bytes deleted as its row emits, so a task's scratch disk
    * is bounded by `batchSize × max-file-size` REGARDLESS of
    * partition size (r19 verdict #2); total concurrent connections =
    * `parallelism` (one live process per task at a time; a task runs
    * ceil(rows/batchSize) processes sequentially). Size `batchSize`
    * down for huge files, up to amortize connection setup on small
    * ones. */
  def fetchMany(
      df: org.apache.spark.sql.DataFrame, pathCol: String,
      config: SshSource, parallelism: Int = 8,
      batchSize: Int = 256): Pipeline = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Seq("content", "error").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val pathIdx = df.schema.fieldIndex(pathCol)
    val cfg = config
    val bs = batchSize
    val outSchema = df.schema
      .add("content", org.apache.spark.sql.types.BinaryType)
      .add("error", org.apache.spark.sql.types.StringType)
    val out = df.repartition(parallelism).mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val scratch = Files.createTempDirectory("graft-ssh-many")
        // backstop for task-kill paths where the iterator never drains
        deleteRecursivelyOnExit(scratch)
        // LAZY sub-batching: at most `bs` staged files exist at once,
        // so a huge partition never accumulates a huge scratch tree
        val rows = it.grouped(bs).flatMap { group =>
          val fetchable = group.zipWithIndex.filter { case (r, _) =>
            !r.isNullAt(pathIdx) && pathError(r.getString(pathIdx)).isEmpty
          }
          val batch = fetchable.map { case (r, i) =>
            s"""-get "${r.getString(pathIdx)}" "$scratch/f$i""""
          }.mkString("", "\n", "\n")
          val batchFile = Files.writeString(scratch.resolve("batch"), batch)
          val output =
            if (fetchable.isEmpty) ""
            else cfg.runSftp(batchFile, scratch, failOnExit = false)
          Files.deleteIfExists(batchFile)
          group.zipWithIndex.map { case (r, i) =>
            val extra: Seq[Any] =
              if (r.isNullAt(pathIdx)) Seq(null, "null path")
              else pathError(r.getString(pathIdx)) match {
                case Some(msg) => Seq(null, msg)
                case None =>
                  val f = scratch.resolve(s"f$i")
                  if (Files.isRegularFile(f)) {
                    val bytes = Files.readAllBytes(f)
                    Files.deleteIfExists(f)
                    Seq(bytes, null)
                  } else Seq(null,
                    s"not fetched: ${r.getString(pathIdx)} " +
                      s"(sftp tail: ${output.takeRight(200).replace('\n', ' ')})")
              }
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extra)
          }
        }
        // reclaim scratch the moment the partition drains — don't
        // wait for the JVM-exit backstop (ADVICE r19); also drop the
        // backstop entry so a long-lived executor's hook list doesn't
        // accumulate one dead path per task
        new Iterator[org.apache.spark.sql.Row] {
          def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) { deleteRecursivelyNow(scratch); exitDeletions.remove(scratch) }
            h
          }
          def next(): org.apache.spark.sql.Row = rows.next()
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    Pipeline.of(s"sshMany(${cfg.host}:${cfg.port})", out)
  }
}
