package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared gate query must RUN — r8's lesson.
  *
  * In round 8 the driver regenerated the testdata (events.ts went from
  * TIMESTAMP(NANOS)-read-as-long to timestamp[us]) and q_session started
  * crashing at analysis; nothing in the suite executed the gate queries
  * themselves, so the snapshot shipped with a query that silently fell
  * out of CORRECTNESS_r08.json (89 rows for 90 declared). This spec
  * closes that hole: every `SparkEntry.queries` entry is executed
  * end-to-end at sf0.001 and must produce a row count without throwing.
  * Result VALUES are the driver's DuckDB gate's job; this spec only pins
  * "declared implies runnable" — plus the queries/oracleSql key
  * consistency the driver assumes.
  */
class GateQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-gate-queries")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0) // the point is that count() returned at all
    }
  }
}
