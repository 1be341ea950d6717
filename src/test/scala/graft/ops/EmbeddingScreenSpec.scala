package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast embedding screen
  * ([[Dedup.broadcastEmbeddingScreen]] / [[Dedup.screenEmbeddings]] /
  * [[graft.functions.MaxCatalogCosine]]): exact-arm parity with the
  * join path, banded subset/recall, loud guards, NULL passthrough. */
class EmbeddingScreenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-embedding-screen")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.load(spark, dir, "embeddings")
  private def corpus = emb.filter(col("vec_id") % 5 =!= 0)
  private def catalogDf = emb.filter(col("vec_id") % 5 === 0)

  test("exact screen == the join path's exact verdicts, value-for-value") {
    val bc = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val screened = Dedup.screenEmbeddings(corpus, "embedding", bc, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val joinSurvivors = Dedup.crossCorpusEmbeddingDedup(
      corpus, Dedup.embeddingCatalog(catalogDf, "vec_id", "embedding"),
      "id", "embedding", "vec_id", "embedding", threshold = 0.35, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(screened == joinSurvivors)
    // and the emitted max cosine is bit-identical to a driver-side
    // max over CosineSim's own fold (the oracle-parity arithmetic)
    val cat = catalogDf
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](1).toArray)
    val probes = corpus.limit(20)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"),
        graft.functions.screenExprs.max_catalog_cosine(
          VectorOps.asDouble(col("embedding")), bc).as("mc"))
      .collect()
    probes.foreach { r =>
      val a = r.getSeq[Double](1).toArray
      def cos(b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val expect = cat.map(cos).filterNot(_.isNaN).max
      assert(r.getDouble(2) == expect,
        s"vec ${r.getLong(0)}: screen max ${r.getDouble(2)} != $expect")
    }
  }

  test("banded screen: exact survivors subset, drops are true hits, recall floor") {
    val bcB = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", threshold = 0.35, banded = true)
    val bcE = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val banded = Dedup.screenEmbeddings(corpus, "embedding", bcB, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Dedup.screenEmbeddings(corpus, "embedding", bcE, 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    // a banded drop is decided by an exact cosine — it can only MISS
    // hits, never invent them
    assert(exact.subsetOf(banded))
    val exactDropped = all.size - exact.size
    val bandedDropped = all.size - banded.size
    assert(exactDropped > 0, "fixture has no hits — spec proves nothing")
    val recall = bandedDropped.toDouble / exactDropped
    assert(recall >= 0.6, f"banded screen recall $recall%.3f < 0.6")
  }

  test("loud guards: probe dim mismatch, over-size catalog; empty catalog and NULL vectors pass") {
    import spark.implicits._
    val bc = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val skinny = Seq((1L, Seq(0.1, 0.2, 0.3))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Dedup.screenEmbeddings(skinny, "embedding", bc, 0.35).collect())
    assert(e.getMessage.contains("dims") ||
      Option(e.getCause).exists(_.getMessage.contains("dims")))
    intercept[IllegalArgumentException](
      Dedup.broadcastEmbeddingScreen(
        catalogDf, "vec_id", "embedding", banded = false, maxEntries = 3))
    // empty catalog: nothing can hit, everything survives
    val bcEmpty = Dedup.broadcastEmbeddingScreen(
      catalogDf.filter(lit(false)), "vec_id", "embedding", banded = false)
    assert(Dedup.screenEmbeddings(corpus, "embedding", bcEmpty, 0.35).count()
      == corpus.count())
    // NULL embedding: no vector, no verdict — survives
    val withNull = Seq((1L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
    assert(Dedup.screenEmbeddings(withNull, "embedding", bc, 0.35).count() == 1)
  }

  test("catalog handle reuse: zero catalog jobs across repeated screens") {
    // the broadcast returned by broadcastEmbeddingScreen is the
    // reusable handle: collection happens THERE, and N subsequent
    // screens — different thresholds, different frames — run as pure
    // scan+filter jobs with no catalog-side work. Pinned by job-group
    // accounting: each screen's collect() is exactly ONE job (a
    // re-collection of the catalog would add its own jobs to the
    // group; so would a join or shuffle smuggled into the screen).
    val sc = spark.sparkContext
    val bcE = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", banded = false)
    val bcB = Dedup.broadcastEmbeddingScreen(
      catalogDf, "vec_id", "embedding", threshold = 0.35, banded = true)
    // pre-materialize the probe frames so the measured jobs are the
    // screens' own (a fresh parquet read can add listing jobs)
    val probeA = corpus.collect()
    val probeDf = spark.createDataFrame(
      sc.parallelize(probeA.toIndexedSeq, 4), corpus.schema)
    def screenJobs(label: String)(run: => Unit): Int = {
      val group = s"screen-reuse-$label-${System.nanoTime()}"
      sc.setJobGroup(group, label)
      try run finally sc.clearJobGroup()
      // listener-bus feed of the status store is async — poll briefly
      def n = sc.statusTracker.getJobIdsForGroup(group).length
      val deadline = System.currentTimeMillis() + 10000
      while (n < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      n
    }
    val j1 = screenJobs("exact")(
      Dedup.screenEmbeddings(probeDf, "embedding", bcE, 0.35).collect())
    val j2 = screenJobs("exact-2nd")(
      Dedup.screenEmbeddings(probeDf, "embedding", bcE, 0.5).collect())
    val j3 = screenJobs("banded")(
      Dedup.screenEmbeddings(probeDf, "embedding", bcB, 0.35).collect())
    assert(j1 == 1 && j2 == 1 && j3 == 1,
      s"expected exactly 1 job per screen, got ($j1, $j2, $j3) — " +
        "a screen re-collected the catalog or grew a shuffle")
  }

  test("updateEmbeddingCatalog: deterministic min-id per duplicate vector, schema preserved") {
    import spark.implicits._
    val cat = Seq((10L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "embedding")
    // additions carry a vector ALREADY in the catalog under a larger
    // id, a duplicate PAIR within the batch, and one fresh vector
    val add = Seq((99L, Seq(1.0, 0.0)), (7L, Seq(0.5, 0.5)),
      (4L, Seq(0.5, 0.5)), (20L, Seq(0.2, 0.8)))
      .toDF("id", "embedding")
    val merged = Dedup.updateEmbeddingCatalog(cat, add)
    assert(merged.columns.toSeq == Seq("id", "embedding"))
    val got = merged.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // smallest id wins per distinct vector: 10 beats 99, 4 beats 7
    assert(got.keySet == Set(10L, 3L, 4L, 20L))
    assert(got(4L) == Seq(0.5, 0.5))
    // repeated merges of the same batches are byte-identical (the
    // persisted-catalog property dropDuplicates could not promise)
    val again = Dedup.updateEmbeddingCatalog(cat, add).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == got)
  }

  test("crossCorpusEmbeddingNearDups: empty-corpus branch keeps the catalog id2 type") {
    import spark.implicits._
    // string catalog ids vs long corpus ids — the branch that found
    // no non-null vector must type id2 off the CATALOG, matching the
    // normal branch's schema
    val catalog = Seq(("c1", Seq(1.0, 0.0))).toDF("cid", "embedding")
    val corpusEmpty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val corpusFull = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val emptySchema = Dedup.crossCorpusEmbeddingNearDups(
      corpusEmpty, catalog, "cid", "embedding", "vec_id", "embedding").schema
    val fullOut = Dedup.crossCorpusEmbeddingNearDups(
      corpusFull, catalog, "cid", "embedding", "vec_id", "embedding",
      threshold = 0.9)
    assert(emptySchema.map(f => (f.name, f.dataType))
      == fullOut.schema.map(f => (f.name, f.dataType)))
    // and the two branches union cleanly (the downstream-consumer shape)
    assert(fullOut.unionByName(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        emptySchema)).count() == fullOut.count())
  }

  test("crossCorpusEmbeddingNearDupsExact: oversize catalog fails loudly, not OOM") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val bigCat = spark.range(10)
      .select(col("id").as("cid"), array(lit(1.0), lit(0.0)).as("embedding"))
    val e = intercept[IllegalArgumentException](
      Dedup.crossCorpusEmbeddingNearDupsExact(
        corpus, bigCat, "cid", "embedding", "vec_id", "embedding",
        threshold = 0.5, maxEntries = 3))
    assert(e.getMessage.contains("banded join"))
    // within bounds the exact arm still answers
    assert(Dedup.crossCorpusEmbeddingNearDupsExact(
      corpus, bigCat.limit(2), "cid", "embedding", "vec_id", "embedding",
      threshold = 0.5, maxEntries = 3).count() == 2)
  }

  test("signature screen: banded == exact == brute force for maxHamming < bands (pigeonhole)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def sig() = Seq.fill(64)(rnd.nextInt(2))
    val catalogSigs = Seq.fill(40)(sig())
    // probes: 20 random (far), 20 catalog members with 0-5 bits
    // flipped (must hit), 5 with exactly 6 flips (must survive at 5)
    def flip(s: Seq[Int], k: Int): Seq[Int] = {
      val idx = rnd.shuffle((0 until 64).toList).take(k).toSet
      s.zipWithIndex.map { case (b, i) => if (idx(i)) 1 - b else b }
    }
    val probes =
      Seq.tabulate(20)(i => (i.toLong, sig())) ++
        Seq.tabulate(20)(i => (100L + i, flip(catalogSigs(i % 40), i % 6))) ++
        Seq.tabulate(5)(i => (200L + i, flip(catalogSigs(i), 6)))
    val catDf = catalogSigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "sig")
    val probeDf = probes.toDF("id", "sig")
    val bcB = Dedup.broadcastSignatureScreen(catDf, "sig", bands = 8)
    val bcE = Dedup.broadcastSignatureScreen(catDf, "sig", bands = 0)
    def survivors(bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.SigScreenCatalog]) =
      Dedup.screenSignatures(probeDf, "sig", bc, maxHamming = 5)
        .select("id").collect().map(_.getLong(0)).toSet
    // brute force on the driver
    def ham(a: Seq[Int], b: Seq[Int]) = a.zip(b).count(p => p._1 != p._2)
    val brute = probes.filter { case (_, s) =>
      catalogSigs.forall(c => ham(s, c) > 5) }.map(_._1).toSet
    assert(survivors(bcE) == brute)
    assert(survivors(bcB) == brute,
      "banded screen must be verdict-exact when maxHamming < bands")
    // all 0-5-flip probes dropped, all 6-flip probes kept
    assert((100L until 120L).forall(id => !brute.contains(id) ||
      // a random flip may coincide with another member — only the
      // designed 0-flip copies are guaranteed drops
      probes.find(_._1 == id).exists(p => catalogSigs.forall(c => ham(p._2, c) > 5))))
    assert((200L until 205L).forall(id =>
      survivors(bcB).contains(id) == brute.contains(id)))
    // width mismatch fails loudly; NULL signature survives
    val skinny = Seq((1L, Seq.fill(32)(1))).toDF("id", "sig")
    val e = intercept[Exception](
      Dedup.screenSignatures(skinny, "sig", bcB, 5).collect())
    assert(e.getMessage.contains("bits") ||
      Option(e.getCause).exists(_.getMessage.contains("bits")))
    val withNull = Seq((1L, null.asInstanceOf[Seq[Int]])).toDF("id", "sig")
    assert(Dedup.screenSignatures(withNull, "sig", bcB, 5).count() == 1)
    // empty catalog: everything survives
    val bcEmpty = Dedup.broadcastSignatureScreen(
      catDf.filter(lit(false)), "sig", bands = 8)
    assert(Dedup.screenSignatures(probeDf, "sig", bcEmpty, 5).count()
      == probes.size)
  }
}
