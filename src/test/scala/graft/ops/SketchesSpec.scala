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

  test("bucketByQuantile: exact terciles label hand-computed data; nulls stay null") {
    val df = Seq(
      ("a", 1L, Option(10.0)), ("a", 2L, Option(20.0)), ("a", 3L, Option(30.0)),
      ("a", 4L, Option(40.0)), ("a", 5L, Option(50.0)), ("a", 6L, Option(60.0)),
      ("a", 7L, Option.empty[Double]),
      // stratum b shifted by 100: its own cutoffs, not a's
      ("b", 8L, Option(110.0)), ("b", 9L, Option(120.0)), ("b", 10L, Option(130.0))
    ).toDF("s", "k", "score")
    val out = Sketches.bucketByQuantile(df, "score", Some("s"), exact = true)
      .select("k", "bucket").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // stratum a: q1/3 of (10..60) = 26.67, q2/3 = 43.33
    assert(out(1L).contains("head") && out(2L).contains("head"))
    assert(out(3L).contains("middle") && out(4L).contains("middle"))
    assert(out(5L).contains("tail") && out(6L).contains("tail"))
    assert(out(7L).isEmpty)
    // stratum b is judged against its own distribution
    assert(out(8L).contains("head") && out(10L).contains("tail"))
  }

  test("bucketByQuantile: a NULL stratum is its own group, not blanket 'tail'") {
    // failed langid is routine — null-stratum rows must meet their own
    // cutoff row through the null-safe join, not fall through to the
    // last label because an equality join nulled their cutoffs
    val df = Seq(
      (Option("a"), 1L, 10.0), (Option("a"), 2L, 20.0), (Option("a"), 3L, 30.0),
      (Option.empty[String], 4L, 1.0), (Option.empty[String], 5L, 2.0),
      (Option.empty[String], 6L, 3.0)
    ).toDF("s", "k", "score")
    val out = Sketches.bucketByQuantile(df, "score", Some("s"), exact = true)
      .select("k", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) == "head" && out(6L) == "tail", s"got $out")
  }

  test("bucketByQuantile: approx labels are monotone in score within a stratum") {
    val out = Sketches.bucketByQuantile(docs, "n_chars", Some("lang"))
      .select("lang", "n_chars", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(r => rank(r._3)).toSet.size >= 2) // cutoffs actually split
      rows.sortBy(_._2).foldLeft(0) { (prev, r) =>
        val b = rank(r._3)
        assert(b >= prev, s"label regressed in score order: $r"); b
      }
    }
    // global (no stratum): one cutoff row, same monotonicity
    val g = Sketches.bucketByQuantile(docs, "n_chars", None)
      .select("n_chars", "bucket").collect().map(r => (r.getLong(0), r.getString(1)))
    g.sortBy(_._1).foldLeft(0) { (prev, r) =>
      val b = rank(r._2); assert(b >= prev); b
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
