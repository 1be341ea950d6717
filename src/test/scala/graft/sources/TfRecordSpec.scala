package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord/tf.Example source+sink: framing golden bytes (the public
  * TensorFlow constants — any TFRecord reader must accept our files),
  * full-type roundtrip, absent-feature NULLs, the documented
  * double→float32 narrowing, corruption policy (strict typed /
  * lenient prefix), and loud type rejects. */
class TfRecordSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tfrecord-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-tfr-$tag").toString

  test("framing golden bytes: length, masked CRC32C, payload CRC") {
    // TF's own worked constants: crc32c("") masked = 0xa282ead8 + rot(0)
    val framed = TfRecord.frame(Array.emptyByteArray)
    assert(framed.length == 16)
    // length field: 0 as u64le
    assert(framed.take(8).forall(_ == 0))
    // independently computed masked crcs
    def masked(bytes: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32C(); c.update(bytes, 0, bytes.length)
      val crc = c.getValue.toInt
      ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    }
    val lenCrc = java.nio.ByteBuffer.wrap(framed, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(lenCrc == masked(new Array[Byte](8)))
    val dataCrc = java.nio.ByteBuffer.wrap(framed, 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(dataCrc == masked(Array.emptyByteArray))
    // deframe inverts frame for arbitrary payloads
    val rnd = new scala.util.Random(5L)
    val payloads = (0 until 50).map { _ =>
      val a = new Array[Byte](rnd.nextInt(500)); rnd.nextBytes(a); a
    }
    val file = payloads.toArray.flatMap(TfRecord.frame)
    val back = TfRecord.deframe(file, lenient = false)
    assert(back.size == 50)
    back.zip(payloads).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("full-type roundtrip incl. arrays; absent features read as NULL") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("l", LongType),
      StructField("i", IntegerType),
      StructField("b", BooleanType),
      StructField("f", FloatType),
      StructField("arr_s", ArrayType(StringType)),
      StructField("arr_l", ArrayType(LongType)),
      StructField("arr_f", ArrayType(FloatType))))
    val rows = Seq(
      Row("héllo", Array[Byte](1, 2, -3), Long.MaxValue, -42, true, 1.5f,
        Seq("a", "", "ccc"), Seq(-1L, 0L, Long.MinValue), Seq(0.25f, -2f)),
      // every field null: no features written, all read back NULL
      Row(null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("roundtrip")
    TfRecord.write(df, dir)
    val back = TfRecord.read(spark, dir, schema).collect()
      .sortBy(r => if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
    assert(back.length == 2)
    val n = back(0) // the all-null row sorts first
    assert((0 until 9).forall(n.isNullAt))
    val v = back(1)
    assert(v.getString(0) == "héllo")
    assert(v.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, -3))
    assert(v.getLong(2) == Long.MaxValue)
    assert(v.getInt(3) == -42 && v.getBoolean(4) && v.getFloat(5) == 1.5f)
    assert(v.getSeq[String](6) == Seq("a", "", "ccc"))
    assert(v.getSeq[Long](7) == Seq(-1L, 0L, Long.MinValue))
    assert(v.getSeq[Float](8) == Seq(0.25f, -2f))
  }

  test("double narrows to float32 (tf.Example has no double list) — documented") {
    import spark.implicits._
    val dir = tmp("double")
    TfRecord.write(Seq((1L, 0.1)).toDF("id", "d"), dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DoubleType)))
    val got = TfRecord.read(spark, dir, schema).collect().head.getDouble(1)
    assert(got == 0.1f.toDouble) // exactly the float32 narrowing, not 0.1
  }

  test("corruption: strict fails typed; lenient keeps the decoded prefix") {
    import spark.implicits._
    val dir = tmp("corrupt")
    TfRecord.write((1L to 20L).toDF("id").coalesce(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = Files.readAllBytes(file.toPath)
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x5a).toByte
    Files.write(file.toPath, bytes)
    // drop the Hadoop local-FS checksum sidecar: the test corrupts the
    // DATA path (TFRecord's own CRCs), not the transport layer
    Files.deleteIfExists(Paths.get(dir, s".${file.getName}.crc"))
    val schema = StructType(Seq(StructField("id", LongType)))
    val strict = intercept[Exception] {
      TfRecord.read(spark, dir, schema).count()
    }
    def causes(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(causes(strict).exists(_.isInstanceOf[java.io.IOException]))
    val kept = TfRecord.read(spark, dir, schema, lenient = true)
      .collect().map(_.getLong(0)).sorted
    assert(kept.length == 19, s"lenient must keep the 19 clean records, got ${kept.length}")
  }

  test("present-but-empty Feature (no kind set) reads as NULL, not a kind-mismatch NPE") {
    // a hostile/foreign shard can hold `feature { key: "a" value {} }`
    // — a Feature message with NO bytes/float/int64 kind. Our writer
    // never emits this, so hand-assemble the wire bytes: Example >
    // features(field 1) > map entry { key(field 1) = "a",
    // value(field 2) = empty Feature }
    val entry = Array[Byte](0x0a, 0x01, 'a', 0x12, 0x00) // key "a", empty value
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0a, features.length.toByte) ++ features
    val dir = tmp("emptyfeat")
    Files.write(Paths.get(dir, "part-00000.tfrecord"), TfRecord.frame(example))
    val out = TfRecord.read(spark, dir,
      StructType(Seq(StructField("a", StringType)))).collect()
    assert(out.length == 1 && out.head.isNullAt(0),
      s"empty-kind feature must read as NULL, got ${out.toSeq}")
    // same under an array-typed ask
    val outArr = TfRecord.read(spark, dir,
      StructType(Seq(StructField("a", ArrayType(LongType))))).collect()
    assert(outArr.length == 1 && outArr.head.isNullAt(0))
  }

  test("loud rejects: unsupported column type; kind mismatch on read") {
    import spark.implicits._
    val bad = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("id", "ts")
    intercept[IllegalArgumentException] { TfRecord.write(bad, tmp("rej")) }
    val dir = tmp("mismatch")
    TfRecord.write(Seq((1L, "text")).toDF("id", "s"), dir)
    val wrong = StructType(Seq(
      StructField("id", LongType), StructField("s", LongType))) // s is bytes
    val e = intercept[Exception] { TfRecord.read(spark, dir, wrong).count() }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).exists(t =>
        t.getMessage != null && t.getMessage.contains("read schema")))
  }

  test("projected reads skip unrequested features — even undecodable ones") {
    import spark.implicits._
    // a record carrying a feature whose VALUE bytes are garbage: a
    // projection that doesn't ask for it must read clean (the value is
    // sliced, never parsed); asking for everything fails typed
    val base = TfRecord.encodeExample(Row(7L),
      StructType(Seq(StructField("id", LongType))))
    val junkVal = Array[Byte](0x1a, 0x03, 0x0a, 0xFF.toByte, 0xFF.toByte) // truncated varint
    val entry = Array[Byte](0x0a, 4) ++ "junk".getBytes ++
      Array[Byte](0x12, junkVal.length.toByte) ++ junkVal
    val features2 = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val payload = base ++ Array[Byte](0x0a, features2.length.toByte) ++ features2
    val dir = tmp("lazy")
    Files.write(Paths.get(dir, "part-00000.tfrecord"), TfRecord.frame(payload))
    val idOnly = StructType(Seq(StructField("id", LongType)))
    assert(TfRecord.read(spark, dir, idOnly).collect().head.getLong(0) == 7L)
    intercept[java.io.IOException] { TfRecord.decodeExample(payload) }
  }

  test("multi-partition write: one shard per partition, all rows back") {
    import spark.implicits._
    val dir = tmp("shards")
    TfRecord.write((1L to 100L).toDF("id").repartition(8), dir)
    val shards = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tfrecord"))
    assert(shards == 8)
    val schema = StructType(Seq(StructField("id", LongType)))
    val back = TfRecord.read(spark, dir, schema).collect().map(_.getLong(0))
    assert(back.sorted.toSeq == (1L to 100L))
  }

  test("writeShardFiles: file NNNNN = shard NNNNN, rank order inside each file") {
    import spark.implicits._
    val dir = tmp("shardfiles")
    // 23 rows over 6 shards of 4 (last partial); scrambled input order
    // and a deliberately adversarial upstream layout (2 partitions, so
    // several shard ids share every task before the direct partitioner)
    val rows = scala.util.Random.shuffle(
      (0L until 23L).map(r => (r * 37 % 97, r / 4, r)).toList)
    val df = rows.toDF("payload", "shard_id", "rank").repartition(2)
    TfRecord.writeShardFiles(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).sortBy(_.getName)
    assert(files.length == 6, "exactly one file per shard")
    val schema = StructType(Seq(StructField("payload", LongType),
      StructField("shard_id", LongType), StructField("rank", LongType)))
    files.zipWithIndex.foreach { case (f, i) =>
      assert(f.getName == f"part-$i%05d.tfrecord")
      val in = TfRecord.read(spark, f.getPath, schema).collect()
      // every row in file i is shard i, in ascending rank order,
      // exactly the ranks [4i, 4i+4) ∩ [0, 23)
      assert(in.forall(_.getLong(1) == i.toLong))
      val ranks = in.map(_.getLong(2)).toSeq
      assert(ranks == (4L * i until math.min(4L * i + 4, 23L)))
      assert(in.forall(r => r.getLong(0) == r.getLong(2) * 37 % 97))
    }
    // loud reject: a shard id outside [0, nShards) cannot happen from
    // assignShuffledShards, but a hand-built frame with a negative id
    // must fail, not silently route
    val bad = Seq((1L, -1L, 0L), (2L, 5L, 1L)).toDF("payload", "shard_id", "rank")
    val e = intercept[org.apache.spark.SparkException](
      TfRecord.writeShardFiles(bad, tmp("shardbad")))
    assert(e.getMessage.contains("shard_id") ||
      Option(e.getCause).exists(_.getMessage.contains("shard_id")))
  }

  test("cross-implementation: the stdlib-python decoder reads our bytes exactly") {
    // tools/tfrecord_check.py was written from the PUBLIC specs and
    // shares no code with the Scala encoder/decoder — a wire-format
    // deviation our own reader happens to mirror (wrong field number,
    // unmasked CRC, wrong endianness) would roundtrip in-JVM but
    // disagree here
    import spark.implicits._
    val dir = tmp("crossimpl")
    TfRecord.write(Seq(
      (1L, "alpha", Seq(10L, -20L, 0L), 1.5f),
      (2L, "béta", Seq(Long.MaxValue), -0.25f)).toDF("id", "s", "ls", "f")
      .coalesce(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val p = new ProcessBuilder("python3", "tools/tfrecord_check.py",
      file.getAbsolutePath).start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes, "UTF-8")
    assert(p.waitFor() == 0, s"python decoder failed: $err")
    val lines = out.trim.split("\n")
    assert(lines.length == 2, s"expected 2 records, got:\n$out")
    // line 1: {"f": float 1.5, "id": int64 [1], "ls": [10,-20,0], "s": bytes ["alpha"]}
    assert(lines(0).contains(""""id": {"kind": "int64", "values": [1]}"""), lines(0))
    assert(lines(0).contains(""""s": {"kind": "bytes", "values": ["alpha"]}"""), lines(0))
    assert(lines(0).contains(""""ls": {"kind": "int64", "values": [10, -20, 0]}"""), lines(0))
    assert(lines(0).contains(""""f": {"kind": "float", "values": [1.5]}"""), lines(0))
    assert(lines(1).contains(""""s": {"kind": "bytes", "values": ["béta"]}"""), lines(1))
    assert(lines(1).contains(
      s""""ls": {"kind": "int64", "values": [${Long.MaxValue}]}"""), lines(1))
    assert(lines(1).contains(""""f": {"kind": "float", "values": [-0.25]}"""), lines(1))
  }

  test("fuzz: garbage payloads and frames only ever fail typed") {
    // a CRC-valid frame can still carry arbitrary bytes (an attacker,
    // or a non-Example TFRecord file) — the proto decoder must reject
    // with IOException, never an index/negative-size/match error; and
    // deframe on random bytes must reject typed or return cleanly
    val rnd = new scala.util.Random(20260814L)
    (0 until 1000).foreach { i =>
      val a = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(a)
      try { TfRecord.decodeExample(a); () }
      catch {
        case _: java.io.IOException => ()
        case t: Throwable => fail(
          s"decodeExample case $i: uncontrolled ${t.getClass.getName}: ${t.getMessage}")
      }
      try { TfRecord.deframe(a, lenient = false); () }
      catch {
        case _: java.io.IOException => ()
        case t: Throwable => fail(
          s"deframe case $i: uncontrolled ${t.getClass.getName}: ${t.getMessage}")
      }
      assert(TfRecord.deframe(a, lenient = true) != null) // never throws
    }
  }

  test("gzip shards roundtrip and mix with plain shards in one dir") {
    import spark.implicits._
    val dir = tmp("gzip")
    TfRecord.write((1L to 30L).toDF("id").repartition(2), dir, gzip = true)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".tfrecord.gz")) == 2, names.mkString(", "))
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(TfRecord.read(spark, dir, schema).collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 30L))
    // a dir mixing plain and gz shards reads as one table
    val mixed = tmp("mixed")
    TfRecord.write((1L to 10L).toDF("id").coalesce(1), mixed)
    val extra = TfRecord.frame(TfRecord.encodeExample(
      Row(11L), StructType(Seq(StructField("id", LongType)))))
    val gz = new java.io.ByteArrayOutputStream()
    val go = new java.util.zip.GZIPOutputStream(gz)
    go.write(extra); go.close()
    Files.write(Paths.get(mixed, "more.tfrecord.gz"), gz.toByteArray)
    assert(TfRecord.read(spark, mixed, schema).collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 11L))
  }

  test("failed write keeps previous data (shared staged commit)") {
    import spark.implicits._
    val dir = tmp("commit")
    TfRecord.write((1L to 10L).toDF("id"), dir)
    val doomed = (1L to 50L).toDF("id").repartition(2)
      .select(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") === 33L,
        org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.lit("boom")))
        .otherwise(org.apache.spark.sql.functions.col("id")).as("id"))
    intercept[Exception] { TfRecord.write(doomed, dir) }
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(TfRecord.read(spark, dir, schema).count() == 10L)
  }
}
