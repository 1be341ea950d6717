package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates: approximate answers within declared error of the
  * exact computation; exact top-k equals the full sort. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sketches-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  lazy val events = graft.Tables.load(spark, "/root/testdata/sf0.01", "events")
  lazy val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")

  test("approxDistinct within declared rsd of the exact distinct count") {
    val exact = events.select("user_id").distinct().count()
    val approx = Sketches.approxDistinct(events, $"user_id", rsd = 0.05)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"approx=$approx exact=$exact")
  }

  test("approxVocabulary counts distinct normalized tokens") {
    val exact = docs
      .select(explode(TextOps.tokens(TextOps.normalized($"text"))).as("t"))
      .distinct().count()
    val approx = Sketches.approxVocabulary(docs, "text", rsd = 0.05)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"approx=$approx exact=$exact")
  }

  test("approxQuantiles bracket the exact quantiles") {
    val probs = Seq(0.25, 0.5, 0.9)
    val approx = Sketches.approxQuantiles(docs, $"n_chars", probs, accuracy = 10000)
    val exact = docs.stat.approxQuantile("n_chars", probs.toArray, 0.0)
    probs.indices.foreach { i =>
      assert(math.abs(approx(i) - exact(i)) / exact(i) < 0.05,
        s"p=${probs(i)} approx=${approx(i)} exact=${exact(i)}")
    }
  }

  test("topValues equals the exact frequency ranking") {
    val got = Sketches.topValues(events, $"event_type", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = events.groupBy("event_type").count()
      .orderBy($"count".desc, $"event_type".asc).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }
}
