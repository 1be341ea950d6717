package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Legacy-xls parity specs against the reference suite's own
  * `players.xls` fixture (produced by real Excel/POI): the counts its
  * XlsSourceTest asserts — 7 rows x 6 columns, string-typed values,
  * only the ID=7 row's `score` null, color groups green=2/blue=1/
  * purple=1 — plus startOnRow behavior. */
class XlsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-xls-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val playersXls = "/root/reference/src/test/resources/players.xls"
  private def havePlayers = new java.io.File(playersXls).exists()

  test("players.xls golden parity: shape, IDs, groups (reference XlsSourceTest)") {
    assume(havePlayers)
    val df = Xls.read(spark, playersXls).toDF
    assert(df.count() == 7)
    assert(df.columns.length == 6)
    assert(df.columns.contains("ID") && df.columns.contains("color"))
    val ids = df.select("ID").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == (1 to 7).map(_.toString).sorted)
    val colors = df.groupBy("color").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(colors("green") == 2L)
    assert(colors("blue") == 1L)
    assert(colors("purple") == 1L)
    // reference: only row ID=7 may have a null (its score cell)
    val nullRows = df.filter(df.columns.map(col(_).isNull).reduce(_ || _))
      .select("ID").collect().map(_.getString(0)).toSet
    assert(nullRows.subsetOf(Set("7")))
  }

  test("players.xls startOnRow shifts the header row") {
    assume(havePlayers)
    // startOnRow=1: the first DATA row becomes the header, 6 rows left
    val df = Xls.read(spark, playersXls, startOnRow = 1).toDF
    assert(df.count() == 6)
  }
}
