package graft.sinks

import graft.etl.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Sink round-trips in the reference's count/format-assertion style
  * (`JsonSinkTest.groovy:26-38`, `PipelineTest.groovy:850-901`). */
class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sinks-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def people: DataFrame = Seq(
    (1, "Bob", "a multi\nline comment"),
    (2, "Randy", ""),
    (3, "Penny", null)
  ).toDF("id", "name", "comment")

  val tmp = Files.createTempDirectory("graft-sinks")

  test("CsvFileSink: single file, always-quote, newline to literal backslash-n") {
    val f = tmp.resolve("people.csv").toString
    new CsvFileSink(f).write(people.orderBy("id"))
    val lines = Files.readAllLines(java.nio.file.Paths.get(f))
    assert(lines.size == 4) // header + 3 rows — embedded newline did NOT split a record
    assert(lines.get(0) == "\"id\",\"name\",\"comment\"")
    assert(lines.get(1) == "\"1\",\"Bob\",\"a multi\\nline comment\"")
    assert(lines.get(2) == "\"2\",\"Randy\",") // empty stays unquoted-empty
    assert(lines.get(3) == "\"3\",\"Penny\",") // null same
  }

  test("JsonFileSink: reference array format, nulls kept; jsonl mode") {
    val f = tmp.resolve("people.json").toString
    new JsonFileSink(f).write(people.orderBy("id"))
    val text = Files.readString(java.nio.file.Paths.get(f))
    val lines = text.split("\n", -1).toSeq
    // [ + one object-with-comma per row + blank + ] (reference quirk,
    // JsonSink.groovy:42,50,80)
    assert(lines.head == "[")
    assert(lines(1).startsWith("{\"id\":1,") && lines(1).endsWith(","))
    assert(lines(3).contains("\"comment\":null")) // nulls kept
    assert(lines.takeRight(2) == Seq("", "]"))

    val fl = tmp.resolve("people.jsonl").toString
    new JsonFileSink(fl, jsonObjectPerLine = true).write(people)
    val jl = Files.readAllLines(java.nio.file.Paths.get(fl))
    assert(jl.size == 3 && jl.get(0).startsWith("{"))
  }

  test("saveAs pushes the sink result row downstream (reference chaining)") {
    val f = tmp.resolve("chained.csv").toString
    val out = Pipeline.of("people", people)
      .saveAs(new CsvFileSink(f))
      .toDF
      .collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("file") == f)
    assert(row.getAs[String]("filename").endsWith("chained.csv"))
    assert(Files.exists(java.nio.file.Paths.get(f)))
  }

  test("progress keeps counts and flow intact") {
    val stat = Pipeline.of(people).progress(every = 1).go()
    assert(stat.loaded == 3)
  }
}
