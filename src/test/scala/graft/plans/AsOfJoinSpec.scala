package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-asof-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Independent oracle: union + window last(ignoreNulls) composition
    * (the shape the plan node exists to avoid — perfect for
    * cross-checking results). Strictly-before is encoded by sorting
    * right rows ahead of left rows at equal time and ending the frame
    * at the previous row. */
  private def asOfViaWindow(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("k"), col("t"), lit(true).as("__is_l__"),
      lit(null).cast("long").as("__rt__"), lit(null).cast("double").as("__rv__"))
    val r = right.select(col("rk").as("k"), col("rt").as("t"), lit(false).as("__is_l__"),
      col("rt").as("__rt__"), col("v").as("__rv__"))
    // left rows sort BEFORE right rows at equal t, so a right row with
    // rt == lt is outside the (unbounded, -1) frame: strictly-before
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("__is_l__").cast("int").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("m_t", last(col("__rt__"), ignoreNulls = true).over(w))
      .withColumn("m_v", last(col("__rv__"), ignoreNulls = true).over(w))
      .filter(col("__is_l__"))
      .select("k", "t", "m_t", "m_v")
  }

  private def mkData(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val left = Seq.fill(400)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.toDF("k", "t")
    val right = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct // unique (k, t): the winning row is unambiguous
      .map { case (k, t) => (k, t, t * 0.5) }
      .toDF("rk", "rt", "v")
    (left, right)
  }

  test("as-of join matches the window-composition oracle on random data") {
    val (left, right) = mkData(7)
    val got = AsOf.join(left, right,
        leftOn = Seq("k"), rightOn = Seq("rk"),
        leftTimeCol = "t", rightTimeCol = "rt")
      .select(col("k"), col("t"), col("rt").as("m_t"), col("v").as("m_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    val want = asOfViaWindow(left, right)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got.size == left.count())
    assert(got == want)
  }

  test("as-of join matches the oracle on random data WITH null keys and times") {
    val rnd = new scala.util.Random(13)
    def maybe[A](v: A): Option[A] = if (rnd.nextInt(10) == 0) None else Some(v)
    val left = Seq.fill(300)((maybe(rnd.nextInt(4).toLong), maybe(rnd.nextInt(500).toLong)))
      .distinct.toDF("k", "t")
    val right = Seq.fill(200)((maybe(rnd.nextInt(4).toLong), maybe(rnd.nextInt(500).toLong)))
      .distinct
      .map { case (k, t) => (k, t, rnd.nextDouble()) }
      .toDF("rk", "rt", "v")
    // SQL-null-semantics oracle: null-key/null-time rows on either side
    // never participate in a match; null-side left rows null-pad
    val validLeft = left.filter($"k".isNotNull && $"t".isNotNull)
    val validRight = right.filter($"rk".isNotNull && $"rt".isNotNull)
    val matched = asOfViaWindow(validLeft, validRight)
    val padded = left.exceptAll(validLeft)
      .select($"k", $"t",
        lit(null).cast("long").as("m_t"), lit(null).cast("double").as("m_v"))
    val want = matched.unionByName(padded)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet

    val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("rt").as("m_t"), col("v").as("m_v"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == want)
  }

  test("unmatched left rows null-pad; match is strictly before") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (3L, 1L, 9.0)).toDF("rk", "rt", "v")
    val rows = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .orderBy("k", "t").collect()
    // (1,10): right (1,10) is NOT strictly before -> null
    assert(rows(0).isNullAt(2))
    // (1,20): latest strictly-before is (1,15)
    assert(rows(1).getLong(3) == 15L && rows(1).getDouble(4) == 2.0)
    // (2,5): no key match -> null
    assert(rows(2).isNullAt(2))
  }

  test("SQL null semantics: null times and null keys never match") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(10L)),             // normal: matches (1, 5)
      (Option(1L), None),                    // null left time -> null-pad
      (None, Option(10L))                    // null left key -> null-pad
    ).toDF("k", "t")
    val right = Seq(
      (Option(1L), None, 99.0),              // null right time: never a match
      (Option(1L), Option(5L), 1.0),
      (None, Option(5L), 2.0)                // null right key: never a match
    ).toDF("rk", "rt", "v")
    val rows = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "rt", "v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(rows == Set(
      (Some(1L), Some(10L), Some(5L), Some(1.0)), // real match, not the null-time v=99 row
      (Some(1L), None, None, None),
      (None, Some(10L), None, None)))
  }

  test("mismatched key/time types are rejected loudly") {
    import spark.implicits._
    val left = Seq((1, 10)).toDF("k", "t")               // int
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v") // long
    intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
    }
  }

  test("plans as the dedicated physical operator") {
    val (left, right) = mkData(11)
    val df = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
    df.collect() // finalize the (adaptive) physical plan
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    // AQE wraps subtrees in leaf QueryStageExec nodes — unwrap to search
    def containsAsOf(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case _: AsOfJoinExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        containsAsOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        containsAsOf(q.plan)
      case other => other.children.exists(containsAsOf)
    }
    assert(containsAsOf(qe.executedPlan),
      s"expected AsOfJoinExec in:\n${qe.executedPlan}")
  }
}
