package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the shuffle-topology helpers: salting (skew) and
  * bucketing (co-location). Correctness first (identical results to the
  * plain formulation), then the plan property each helper exists for. */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scale-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def countShuffles(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case s: ShuffleExchangeLike => 1 + s.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  test("distributed star-contraction CC handles a 20k-node graph and matches the driver path") {
    // the gate corpus only ever exercises the driver union-find path;
    // this pins the DISTRIBUTED path (maxDriverEdges = 0) on a graph
    // with long chains, a big star, and many islands at real size
    val rnd = new scala.util.Random(11)
    val chain = (0L until 2000L).map(i => (i, i + 1))                 // one long chain
    val star = (0L until 2000L).map(i => (500000L, 500001L + i))      // one big star
    val random = Seq.fill(26000)(
      (10000L + rnd.nextInt(18000), 10000L + rnd.nextInt(18000)))     // islands
    val edges = (chain ++ star ++ random).toDF("a", "b")
    val dist = Graph.connectedComponents(edges, "a", "b", maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == driver)
    assert((0L to 2000L).forall(dist(_) == 0L))      // chain collapsed
    assert(dist(500001L) == 500000L)                  // star rooted at hub min
  }

  test("Skew.saltedJoin returns exactly the plain join's rows, hot key split across salts") {
    // one pathologically hot key (900 of 1000 rows) + a long tail
    val left = ((1 to 900).map(i => (42L, i)) ++ (1 to 100).map(i => (i.toLong % 7, -i)))
      .toDF("k", "v")
    val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSeq
    assert(salted.sortBy(_.toString) == plain.sortBy(_.toString))

    // the hot key's rows really do spread over multiple salt values
    val salts = left.withColumn("__salt__", floor(rand(42L) * 8).cast("int"))
      .where($"k" === 42L).select("__salt__").distinct().count()
    assert(salts > 1, "salt must vary within a join key")
  }

  test("AQE splits a skewed sort-merge join partition (the no-salt runtime path)") {
    // Skew.saltedJoin is the PLANNED mitigation; AQE's skew-join split
    // is the RUNTIME one — this locks that our sessions leave it
    // operable (a refactor that pinned shuffle partitioning or disabled
    // AQE would break it silently). Thresholds are lowered so the
    // test-size hot partition qualifies as skewed.
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 100
      val left = ((1 to 20000).map(i => (42L, s"$i$pad")) ++
        (1 to 500).map(i => (i.toLong % 7, s"-$i$pad"))).toDF("k", "v")
      val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so THIS dataset's adaptive plan is the
      // one that executes — count() builds its own QueryExecution
      assert(joined.collect().length == 20500)
      val qe = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      def find(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: QueryStageExec => find(q.plan)
        case other => other +: other.children.flatMap(find)
      }
      val smj = find(qe.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n${qe.executedPlan}")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the skewed join:\n${qe.executedPlan}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom decontamination and catalog dedup survive with broadcast disabled") {
    // the review removed forced broadcast() on the fold-back joins so
    // blocklist-scale tainted/dup sets can shuffle; this pins that the
    // shuffle path (the big-data regime) still makes exact verdicts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
      val evalDf = docs.filter(col("doc_id") % 20 === 0)
      val corpus = docs.filter(col("doc_id") % 20 =!= 0)
      val b = Contamination.decontaminateBloom(
        corpus, evalDf, "doc_id", "text", broadcastEval = false)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val j = Contamination.decontaminate(
        corpus, evalDf, "doc_id", "text", broadcastEval = false)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(b == j && b.nonEmpty)
      val shipped = docs.filter(col("doc_id") % 7 === 0)
      val kept = Dedup.exactCrossDedup(
        docs, shipped, "doc_id", "text", broadcastReference = false)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept.nonEmpty && kept.forall(_ % 7 != 0))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("Bucketing.coLocatedJoin plans with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i)).toDF("k", "v")
    val dims = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_test_facts", Seq("k"), numBuckets = 4)
    Bucketing.writeBucketed(dims, "graft_test_dims", Seq("k"), numBuckets = 4)
    // forbid broadcast so the shuffle-free property is the bucketing's doing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "graft_test_facts", "graft_test_dims", Seq("k"))
      assert(joined.count() == 1000)
      val qe = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      assert(countShuffles(qe.executedPlan) == 0,
        s"bucketed join should not shuffle:\n${qe.executedPlan}")

      // control: the same join over non-bucketed frames shuffles both sides
      val unbucketed = facts.join(dims, Seq("k"))
      unbucketed.count()
      val qe2 = unbucketed.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      assert(countShuffles(qe2.executedPlan) >= 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_test_facts")
      spark.sql("DROP TABLE IF EXISTS graft_test_dims")
    }
  }
}
