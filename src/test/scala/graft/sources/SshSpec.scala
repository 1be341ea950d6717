package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** SshSource specs. No sshd exists in this environment, so the SFTP
  * leg runs against the REAL OpenSSH client via `sftp -D` talking to
  * the in-test SFTP v3 server (`src/test/resources/TestSftpServer.java`,
  * executed through JDK single-file source mode) — the wire bytes on
  * the client side are openssh's own, so a protocol error in either
  * the batch assembly or the row mapping fails here. The network/auth
  * leg (host keys, identities, askpass) is pinned at the argv level:
  * those flags are consumed by openssh itself, unchanged, on a real
  * deployment. */
class SshSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ssh-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def serverCmd: String = SftpFixture.serverCommand()

  private def fixtureRoot: Path = {
    val root = Files.createTempDirectory("graft-ssh-fixture")
    Files.createDirectories(root.resolve("data/sub"))
    Files.writeString(root.resolve("data/people.csv"), "id,name\n1,alpha\n2,beta\n")
    Files.writeString(root.resolve("data/sub/note.txt"), "hello world\n")
    Files.write(root.resolve("solo.bin"), Array[Byte](0, 1, 2, -1))
    root
  }

  test("recursive directory + single file download through the real sftp client") {
    val root = fixtureRoot
    val rows = Ssh.ssh("example.test")
      .download(s"$root/data", s"$root/solo.bin")
      .withExtraArgs("-D", serverCmd)
      .into(spark)
      .toDF
      .collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[String]("filename"), r.getAs[Array[Byte]]("content")))
      .toMap
    assert(rows.keySet == Set(
      s"$root/data/people.csv", s"$root/data/sub/note.txt", s"$root/solo.bin"))
    assert(rows(s"$root/data/people.csv")._1 == "people.csv")
    assert(new String(rows(s"$root/data/people.csv")._2) == "id,name\n1,alpha\n2,beta\n")
    assert(new String(rows(s"$root/data/sub/note.txt")._2) == "hello world\n")
    assert(rows(s"$root/solo.bin")._2.toSeq == Seq[Byte](0, 1, 2, -1))
  }

  test("row shape carries the reference's keys: host, port, filename, path, size, content") {
    val root = fixtureRoot
    val df = Ssh.ssh("example.test", 2222)
      .download(s"$root/solo.bin")
      .withExtraArgs("-D", serverCmd)
      .into(spark).toDF
    assert(df.columns.toSeq ==
      Seq("host", "port", "filename", "path", "size", "content"))
    val r = df.collect()(0)
    assert(r.getAs[String]("host") == "example.test")
    assert(r.getAs[Int]("port") == 2222)
    assert(r.getAs[Long]("size") == 4L)
  }

  test("argv assembly: identity, known hosts, strict checking, batch mode, password") {
    val batch = java.nio.file.Path.of("/tmp/b")
    val key = Ssh.ssh("h", 2200).identity("u", new java.io.File("/k/id_ed25519"))
      .knownHosts(new java.io.File("/k/known")).command(batch)
    assert(key.containsSlice(Seq("-P", "2200")))
    assert(key.containsSlice(Seq("-i", "/k/id_ed25519")))
    assert(key.containsSlice(Seq("-o", "UserKnownHostsFile=/k/known")))
    assert(key.containsSlice(Seq("-o", "StrictHostKeyChecking=yes")))
    // keyed/headless → BatchMode forbids hidden prompts
    assert(key.containsSlice(Seq("-o", "BatchMode=yes")))
    assert(key.last == "u@h")
    val lax = Ssh.ssh("h").enableStrictHostCheck(false).command(batch)
    assert(lax.containsSlice(Seq("-o", "StrictHostKeyChecking=no")))
    assert(lax.last == "h") // no username → bare host
    // password auth must NOT set BatchMode (it would suppress askpass)
    val pw = Ssh.ssh("h").authPass("u", "s3cret").command(batch)
    assert(!pw.containsSlice(Seq("-o", "BatchMode=yes")))
    assert(pw.last == "u@h")
  }

  test("fetchMany: distributed per-row fetch — content lands, bad rows mark errors, job survives") {
    import spark.implicits._
    val root = fixtureRoot
    val paths = Seq(
      s"$root/data/people.csv",
      s"$root/data/sub/note.txt",
      s"$root/no-such-file",       // lenient: marks its own row only
      null.asInstanceOf[String],   // null path passes through
      s"$root/solo.bin")
    val df = paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "remote_path")
    val out = Ssh.fetchMany(df, "remote_path",
      Ssh.ssh("example.test").withExtraArgs("-D", serverCmd),
      parallelism = 3)
      .toDF.collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("content"), r.getAs[String]("error"))).toMap
    assert(out.size == 5)
    assert(new String(out(0L)._1) == "id,name\n1,alpha\n2,beta\n" && out(0L)._2 == null)
    assert(new String(out(1L)._1) == "hello world\n" && out(1L)._2 == null)
    assert(out(4L)._1.toSeq == Seq[Byte](0, 1, 2, -1))
    // the missing file marks ITS row; the partition's other rows land
    assert(out(2L)._1 == null && out(2L)._2.contains("not fetched"))
    assert(out(3L)._1 == null && out(3L)._2 == "null path")
  }

  test("missing remote path and quoted-path guard fail loudly") {
    val root = fixtureRoot
    val e = intercept[IllegalStateException](
      Ssh.ssh("example.test")
        .download(s"$root/no-such-file")
        .withExtraArgs("-D", serverCmd)
        .into(spark))
    assert(e.getMessage.contains("sftp exited"))
    intercept[IllegalArgumentException](
      Ssh.ssh("h").download("/path/with\"quote").into(spark))
    intercept[IllegalArgumentException](Ssh.ssh("h").into(spark))
  }

  test("batch-injection guard: control-character paths are rejected, never executed") {
    import spark.implicits._
    val root = fixtureRoot
    val nonce = s"graft-pwned-${System.nanoTime()}"
    val marker = java.nio.file.Path.of(s"/tmp/$nonce")
    // a crawl-supplied path that would line-split the sftp batch file
    // and ride the `!` local-shell escape — the r19 injection vector
    val hostile = s"""$root/x"\n!touch $marker\n"""
    val cr = s"$root/y\rz"
    val df = Seq(
      (0L, s"$root/solo.bin"),      // clean row in the SAME partition
      (1L, hostile),
      (2L, cr),
      (3L, s"$root/data/people.csv"))
      .toDF("id", "remote_path")
    val out = Ssh.fetchMany(df, "remote_path",
      Ssh.ssh("example.test").withExtraArgs("-D", serverCmd),
      parallelism = 1)
      .toDF.collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("content"), r.getAs[String]("error"))).toMap
    // the injected command must NOT have run
    assert(!Files.exists(marker), "sftp batch injection executed a local command")
    // hostile rows carry error markers; content stays null
    assert(out(1L)._1 == null && out(1L)._2.contains("control character"))
    assert(out(2L)._1 == null && out(2L)._2.contains("control character"))
    // clean rows in the same partition still fetch
    assert(out(0L)._1.toSeq == Seq[Byte](0, 1, 2, -1) && out(0L)._2 == null)
    assert(new String(out(3L)._1) == "id,name\n1,alpha\n2,beta\n" && out(3L)._2 == null)
    // the driver-staged form REFUSES the same paths up front
    val e = intercept[IllegalArgumentException](
      Ssh.ssh("h").download(hostile).into(spark))
    assert(e.getMessage.contains("control character"))
    intercept[IllegalArgumentException](Ssh.ssh("h").download(cr).into(spark))
  }

  test("fetchMany sub-batches: batchSize=2 over 5 rows (>1 sftp round) — identical output") {
    import spark.implicits._
    val root = fixtureRoot
    val paths = Seq(
      s"$root/data/people.csv",
      s"$root/data/sub/note.txt",
      s"$root/no-such-file",
      s"$root/solo.bin",
      s"$root/data/people.csv")
    val df = paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "remote_path")
    def run(bs: Int) = Ssh.fetchMany(df, "remote_path",
      Ssh.ssh("example.test").withExtraArgs("-D", serverCmd),
      parallelism = 1, batchSize = bs)
      .toDF.collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Array[Byte]]("content")).map(_.toSeq),
          r.getAs[String]("error") == null)).toMap
    // parallelism=1 puts all 5 rows in one partition; batchSize=2
    // forces ceil(5/2)=3 sftp rounds against one round at 256 —
    // staged bytes stay bounded by batchSize, output must not change
    val chunked = run(2)
    val whole = run(256)
    assert(chunked == whole)
    assert(chunked(0L)._1.get == "id,name\n1,alpha\n2,beta\n".getBytes.toSeq)
    assert(chunked(2L)._2 == false) // lenient miss survives sub-batching
    assert(chunked(4L)._1.get == chunked(0L)._1.get)
  }

  test("askpass helper is deleted on the sftp FAILURE path too") {
    val scratch = Files.createTempDirectory("graft-askpass-spec")
    val batch = Files.writeString(scratch.resolve("batch"), "get \"/nope\" \"/nope\"\n")
    val cfg = Ssh.ssh("example.test").authPass("u", "s3cret")
      .withExtraArgs("-D", serverCmd)
    intercept[IllegalStateException](cfg.runSftp(batch, scratch, failOnExit = true))
    import scala.jdk.CollectionConverters._
    val leftover = Files.list(scratch).iterator().asScala
      .filter(_.getFileName.toString.startsWith("askpass-")).toList
    assert(leftover.isEmpty, s"askpass script leaked: $leftover")
  }
}
