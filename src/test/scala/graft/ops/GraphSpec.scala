package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (large-star/small-star) against a local
  * union-find ground truth. */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graph-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // maxDriverEdges = 0 forces the distributed star-contraction path;
  // the default exercises the driver union-find path. Every test runs
  // BOTH and asserts they agree.
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val driver = Graph.connectedComponents(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.connectedComponents(df, "src", "dst", maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist, "driver union-find and star contraction disagree")
    driver
  }

  /** Local union-find with path compression for ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // root-relabel to the component MINIMUM, matching the contract
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("chain collapses to one component rooted at the min") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components, duplicate/reversed edges, self-loops") {
    val edges = Seq((10L, 20L), (20L, 10L), (10L, 10L), (20L, 20L),
      (30L, 40L), (40L, 50L), (7L, 7L))
    assert(cc(edges) == Map(
      10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 30L, 7L -> 7L))
  }

  test("long chain (worst case for star contraction) converges") {
    val n = 64
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.size == n)
    assert(got.values.toSet == Set(1L))
  }

  test("random graph matches local union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    assert(cc(edges) == unionFind(edges))
  }

  test("clusterDedup keeps exactly the component minima") {
    val df = (0L to 9L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val kept = Dedup.clusterDedup(df, "id", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 7L, 8L, 9L))
    val clusters = Dedup.nearDupClusters(df, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("minhashClusterDedup collapses a duplicate chain the greedy rule splits") {
    // B is near-identical to both A and C, but A and C differ enough
    // that LSH may never emit (A, C) — transitivity must still put all
    // three in one cluster and keep only A
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val mid = (0 until 40).map(i => if (i % 10 == 0) s"mid$i" else s"tok$i").mkString(" ")
    val far = (0 until 40).map(i => if (i % 5 == 0) s"mid$i" else s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, mid), (3L, far),
      (4L, "completely different text about unrelated things entirely")).toDF("id", "text")
    val kept = Dedup.minhashClusterDedup(docs, "id", "text", threshold = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(4L))
    assert(kept.contains(1L))
    assert(!kept.contains(2L)) // chained into 1's cluster
  }

  test("nearDupClusters replaces an existing cluster_id column on a second pass") {
    val df = (0L to 4L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val first = Dedup.nearDupClusters(df, "id", Seq((0L, 1L)).toDF("id1", "id2"))
    // second pass over the already-clustered frame with new pairs
    val second = Dedup.nearDupClusters(first, "id", Seq((3L, 4L)).toDF("id1", "id2"))
    val got = second.select("id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
    assert(second.columns.count(_ == "cluster_id") == 1)
  }

  test("driver union-find emits a distributed relation, never a LocalRelation") {
    // the assignments feed joins in nearDupClusters/clusterDedup — an
    // up-to-8M-row LocalRelation embedded in that plan would be driver
    // memory + plan-size poison, so the output must be a parallelized
    // (ExternalRDD-backed) relation
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val cc = Graph.connectedComponents(pairs, "id1", "id2")
    val hasLocalRelation = cc.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(!hasLocalRelation)
    assert(cc.collect().length == 5)
  }

  test("scale-0 decimal ids (parquet BIGINT surrogates) are accepted") {
    val ddf = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("id", "text")
      .withColumn("id", org.apache.spark.sql.functions.col("id").cast("decimal(18,0)"))
    val kept = Dedup.clusterDedup(ddf, "id", Seq((0L, 1L)).toDF("id1", "id2"))
    assert(kept.count() == 2) // 1 deduped into 0's cluster; exact through cast
  }

  test("cluster APIs reject non-integral id columns loudly") {
    // string/UUID ids would cast to NULL inside connected components
    // and silently dedup nothing — the contract is enforced up front
    val sdf = Seq(("a", "x"), ("b", "y")).toDF("id", "payload")
    val spairs = Seq(("a", "b")).toDF("id1", "id2")
    val lpairs = Seq((0L, 1L)).toDF("id1", "id2")
    val ldf = Seq((0L, "x"), (1L, "y")).toDF("id", "text")
    for (thunk <- Seq(
        () => Dedup.nearDupClusters(sdf, "id", lpairs),
        () => Dedup.clusterDedup(sdf, "id", lpairs),
        () => Dedup.clusterDedup(ldf, "id", spairs),
        () => Dedup.minhashClusterDedup(sdf, "id", "payload"))) {
      val e = intercept[IllegalArgumentException](thunk())
      assert(e.getMessage.contains("integral column"))
    }
  }
}
