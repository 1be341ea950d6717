package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Source-parity specs mirroring the reference's source tests
  * (CsvSource/JsonSource/ZipSource/ConcatSource fixtures, SURVEY §5):
  * headerless CSV with supplied headers, separator/escaping options,
  * ragged rows, JSON path descent + includeRoot, JSONL, zip entries. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sources-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp: Path = Files.createTempDirectory("graft-src")

  test("csv: header row, all-string ingestion, quoted separator") {
    val f = tmp.resolve("people.csv")
    Files.writeString(f,
      "id,name,comment\n1,Bob,\"a, quoted comment\"\n2,Sue,plain\n")
    val df = Sources.csv(spark, f.toString).toDF
    assert(df.columns.toSeq == Seq("id", "name", "comment"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.where(col("comment") === "a, quoted comment").count() == 1)
  }

  test("csv: headerless with user-supplied headers and separator") {
    val f = tmp.resolve("weblog.csv")
    Files.writeString(f, "2020-01-01|200|c1\n2020-01-02|404|c2\n")
    val df = Sources.csv(spark, f.toString, separator = "|",
      headers = Seq("date", "status", "client")).toDF
    assert(df.columns.toSeq == Seq("date", "status", "client"))
    assert(df.count() == 2)
    assert(df.where(col("status") === "404").count() == 1)
  }

  test("csv: escaping=false keeps quote characters verbatim") {
    val f = tmp.resolve("unescaped.csv")
    // reference unescaped.csv semantics (PipelineTest.groovy:995-1020):
    // with escaping off, quotes are ordinary characters, not delimiters
    Files.writeString(f, "id,note\n1,\"not a quote\n2, \"half open\n")
    val df = Sources.csv(spark, f.toString, escaping = false).toDF
    assert(df.count() == 2)
    assert(df.where(col("note") === "\"not a quote").count() == 1)
    assert(df.where(col("note") === " \"half open").count() == 1)
  }

  test("csv: ragged rows padded with null") {
    val f = tmp.resolve("ragged.csv")
    Files.writeString(f, "a,b,c\n1,2,3\n4,5\n6\n")
    val df = Sources.csv(spark, f.toString).toDF
    assert(df.count() == 3)
    assert(df.where(col("c").isNull).count() == 2)
  }

  test("json: array document with path descent and includeRoot") {
    val f = tmp.resolve("nested.json")
    Files.writeString(f,
      """{"status": 1, "items": [
        |  {"name": "a", "price": 1.5, "color": ["red", "blue"]},
        |  {"name": "b", "price": 2.5, "color": ["green"]}
        |]}""".stripMargin)
    val df = Sources.json(spark, f.toString, descent = Seq("items")).toDF
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("name", "price", "color"))
    // nested arrays survive as first-class values (reference: row.color is a list)
    assert(df.where(col("name") === "a").select(size(col("color"))).head().getInt(0) == 2)

    val withRoot = Sources.json(spark, f.toString,
      descent = Seq("items"), includeRoot = true).toDF
    assert(withRoot.columns.contains("_root_json"))
    assert(withRoot.select(col("_root_json")).head().getString(0).contains("\"status\":1"))
  }

  test("jsonl: one object per line, missing fields null-padded") {
    val f = tmp.resolve("rows.jsonl")
    Files.writeString(f,
      """{"firstName": "A", "band": "X"}
        |{"firstName": "B"}
        |""".stripMargin)
    val df = Sources.jsonl(spark, f.toString).toDF
    assert(df.count() == 2)
    assert(df.where(col("band").isNull).count() == 1)
  }

  test("collection: maps with insertion-ordered union schema") {
    val p = Sources.collection(spark, Seq(
      Map("id" -> 1, "name" -> "Bob"),
      Map("id" -> 2, "name" -> "Sue", "age" -> 52)))
    val df = p.toDF
    assert(df.columns.toSeq == Seq("id", "name", "age"))
    assert(df.where(col("age").isNull).count() == 1)
    assert(df.schema("age").dataType.typeName == "integer")
  }

  test("zipEntries: one row per entry with executor-side extraction") {
    val dir = tmp
    val zf = dir.resolve("arch.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zf))
    zos.putNextEntry(new ZipEntry("a.txt")); zos.write("hello".getBytes); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("sub/b.txt")); zos.write("world!".getBytes); zos.closeEntry()
    zos.close()
    val df = Sources.zipEntries(spark, dir.toString).toDF
    assert(df.count() == 2)
    val rows = df.select("entry", "size").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a.txt" -> 5L, "sub/b.txt" -> 6L))
  }

  test("archiveEntries: commons-compress auto-detects zip") {
    val dir = tmp
    val zf = dir.resolve("arch2.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zf))
    zos.putNextEntry(new ZipEntry("x.bin")); zos.write(Array[Byte](1, 2, 3)); zos.closeEntry()
    zos.close()
    val df = Sources.archiveEntries(spark, dir.toString, "*.zip").toDF
    assert(df.count() == 1)
    assert(df.select("size").head().getLong(0) == 3L)
  }

  test("concat of sources unions by name") {
    val a = Sources.collection(spark, Seq(Map("id" -> 1)))
    val b = Sources.collection(spark, Seq(Map("id" -> 2, "extra" -> "x")))
    assert(Sources.concat(a, b).toDF.count() == 2)
  }

  test("orc and parquet sources round-trip typed schemas through Pipeline.save") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-columnar").toString
    val df = Seq[(Long, String, java.sql.Timestamp)](
      (1L, "a", java.sql.Timestamp.valueOf("2026-01-02 03:04:05")),
      (2L, null, null)).toDF("id", "s", "ts")
    graft.etl.Pipeline.of("t", df).save(s"$dir/o", format = "orc").go()
    graft.etl.Pipeline.of("t", df).save(s"$dir/p", format = "parquet").go()
    Seq(Sources.orc(spark, s"$dir/o"), Sources.parquet(spark, s"$dir/p")).foreach { src =>
      val back = src.toDF.orderBy("id")
      // names+types must survive; nullability is always true off a file
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)), s"schema drift: ${back.schema}")
      assert(back.collect().map(_.toString).toSeq ==
        df.orderBy("id").collect().map(_.toString).toSeq)
    }
  }
}
