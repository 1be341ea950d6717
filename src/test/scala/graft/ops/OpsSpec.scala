package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the beyond-reference operators (dedup, similarity search,
  * text analysis, multimodal plumbing) on synthetic fixtures with known
  * ground truth. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // corpus with two exact dups, one near-dup pair, and distinct rest
  def docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 0
    (3L, "completely different text about database engines and query optimization"),
    (4L, "yet another unrelated document discussing spark partitions and shuffles"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("TextOps: tokenCount / ratios / fingerprint / shingles") {
    val d = docs.select(
      TextOps.tokenCount($"text").as("n"),
      TextOps.alphaRatio($"text").as("ar"),
      TextOps.fingerprint($"text").as("fp"),
      TextOps.shingles($"text", 3).as("sh")).where($"n" === 14)
    val row = d.head()
    assert(row.getAs[Double]("ar") > 0.8)
    assert(row.getAs[String]("fp").length == 32)
    assert(row.getSeq[String](3).size == 12) // 14 tokens -> 12 3-grams
  }

  test("TextOps: shingles of short text fall back to whole text") {
    val sh = docs.where($"doc_id" === 5)
      .select(TextOps.shingles($"text", 5)).head().getSeq[String](0)
    assert(sh == Seq("short text"))
  }

  test("TextOps: langId picks dominant stopword language") {
    val d = Seq(
      (1, "the cat and the dog of the house is big"),
      (2, "el gato y la casa que los perros el dia"),
      (3, "der hund und die katze nicht der haus"),
      (4, "le chat et les chiens des maisons est grand")
    ).toDF("id", "text")
    val preds = d.select($"id", TextOps.langId($"text").as("p"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(preds == Map(1 -> "en", 2 -> "es", 3 -> "de", 4 -> "fr"))
  }

  test("TextOps.bpeishTokens: alnum runs + standalone marks, no whitespace or empty tokens") {
    val d = Seq(
      (1L, "don't"), (2L, "a. b"), (3L, "   "), (4L, "你好 ab"), (5L, "x2,y")
    ).toDF("id", "text")
    val toks = d.select($"id", TextOps.bpeishTokens($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(toks(1L) == List("don", "'", "t"))
    assert(toks(2L) == List("a", ".", "b")) // the old lookaround split emitted a " " token here
    assert(toks(3L) == Nil)                 // and a single empty token here
    assert(toks(4L) == List("你", "好", "ab")) // CJK: one token per char
    assert(toks(5L) == List("x2", ",", "y"))
    val n = d.select(TextOps.bpeishTokenCount($"text")).collect().map(_.getInt(0))
    assert(n.toList == List(3, 3, 0, 3, 3))
  }

  test("TextOps: rollingHash is order-sensitive, fingerprint is not") {
    val d = Seq((1, "alpha beta gamma"), (2, "gamma beta alpha")).toDF("id", "text")
    val rh = d.select(TextOps.rollingHash($"text")).collect().map(_.getLong(0))
    assert(rh(0) != rh(1))
    val fp = d.select(TextOps.fingerprint($"text")).collect().map(_.getString(0))
    assert(fp(0) != fp(1)) // different normalized content
  }

  test("Dedup.exact keeps smallest id per duplicate text") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L, 4L, 5L)) // doc 1 dropped
  }

  test("Dedup.exact keeps a real row when the order column is all-null in a group") {
    val df = Seq(
      (Option.empty[Long], "same text here"), (Option.empty[Long], "same text here"),
      (Option(5L), "different text entirely")
    ).toDF("ord", "text")
    val kept = Dedup.exact(df, "text", "ord").collect()
    assert(kept.length == 2)
    assert(kept.forall(r => r.getString(1) != null)) // no fabricated all-null row
  }

  test("Dedup.exactCrossDedup drops fingerprint matches only, keeps null text, honors empty reference") {
    val corpus = Seq(
      (1L, Option("Alpha  beta\tgamma")),     // normalization variant of ref — dropped
      (2L, Option("alpha beta gamma")),       // exact ref text — dropped
      (3L, Option("unrelated document")),     // clean
      (4L, Option.empty[String])              // null text — always kept
    ).toDF("doc_id", "text")
    val reference = Seq((100L, "alpha beta gamma"), (101L, "other ref")).toDF("doc_id", "text")
    val kept = Dedup.exactCrossDedup(corpus, reference, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
    // empty reference: everything survives
    val all = Dedup.exactCrossDedup(
      corpus, reference.filter($"doc_id" < 0), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L, 4L))
    // the shuffled-verify path makes the same verdicts
    val shuffled = Dedup.exactCrossDedup(
      corpus, reference, "doc_id", "text", broadcastReference = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shuffled == kept)
    // the catalog form (persisted fingerprints instead of reference
    // text) makes the same verdicts through a save/load round-trip
    val catDir = java.nio.file.Files.createTempDirectory("graft-fp-cat").toString + "/c"
    Dedup.fingerprints(reference, "text").write.parquet(catDir)
    val viaCatalog = Dedup.exactCrossDedupByFingerprint(
      corpus, spark.read.parquet(catDir), "fingerprint", "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaCatalog == kept)
  }

  test("exactCrossDedupByFingerprint approximate mode keeps null-text docs through a bloom false positive") {
    // xxhash64(NULL) returns the SEED (42), not NULL — so every
    // null-text doc probes the same constant key, and a single bloom
    // false positive on it would drop them all if the probe weren't
    // gated on the fingerprint (r7 advice regression). Saturate a tiny
    // bloom so key 42 IS a false positive, then assert null rows live.
    val catFps = (0 until 200).map(i => Tuple1(s"catfp$i")).toDF("fp")
    val bloom = catFps.select(xxhash64(col("fp")).as("__h__"))
      .stat.bloomFilter("__h__", 200, 0.9)
    assume(bloom.mightContainLong(42L),
      "test precondition: the saturated bloom must FP on the null probe key")
    val corpus = Seq(
      (1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("clean document text"))).toDF("doc_id", "text")
    val kept = Dedup.exactCrossDedupByFingerprint(
      corpus, catFps, "fp", "doc_id", "text", fpp = 0.9, approximate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L).subsetOf(kept),
      s"null-text docs must always be kept, got $kept")
  }

  test("updateFingerprintCatalog: the incremental loop converges to the full corpus fingerprint set") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "ALPHA   beta" /* dup of 1 after normalization */),
      (4L, "epsilon"), (5L, Option.empty[String].orNull: String)).toDF("doc_id", "text")
    val batch1 = docs.filter($"doc_id" <= 2)
    val batch2 = docs.filter($"doc_id" > 2)
    val cat1 = Dedup.fingerprints(batch1, "text")
    val kept2 = Dedup.exactCrossDedupByFingerprint(
      batch2, cat1, "fingerprint", "doc_id", "text")
    // doc 3 duplicates doc 1 across batches and drops; the null doc survives
    assert(kept2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L, 5L))
    val cat2 = Dedup.updateFingerprintCatalog(cat1, "fingerprint", kept2, "text")
    // merged catalog == fingerprints of everything shipped (null text contributes none)
    val direct = Dedup.fingerprints(docs.filter($"doc_id" =!= 3L), "text")
    assert(cat2.collect().map(_.getString(0)).toSet ==
      direct.collect().map(_.getString(0)).toSet)
    // idempotent: merging the same survivors again changes nothing
    val cat3 = Dedup.updateFingerprintCatalog(cat2, "fingerprint", kept2, "text")
    assert(cat3.count() == cat2.count())
    // same typed-column guard as the read half
    val binCat = Seq(Tuple1("a" * 32)).toDF("fp").select(unhex($"fp").as("fp"))
    val e = intercept[IllegalArgumentException] {
      Dedup.updateFingerprintCatalog(binCat, "fp", kept2, "text")
    }
    assert(e.getMessage.contains("expected"))
  }

  test("Dedup.crossCorpusDedupBySignatures matches the text screen through a parquet catalog") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val shipped = docs.filter($"doc_id" % 10 === 0)
    val crawl = docs.filter($"doc_id" % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sig-cat").toString + "/c"
    Dedup.signatureCatalog(shipped, "doc_id", "text",
      shingleN = 5, numHashes = 64, charShingles = true)
      .write.parquet(dir)
    val viaCatalog = Dedup.crossCorpusDedupBySignatures(
      crawl, spark.read.parquet(dir), "id", "sig", "doc_id", "text",
      shingleN = 5, numHashes = 64, threshold = 0.8, charShingles = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same verdicts as the in-memory screen-only text form
    val hits = Dedup.crossCorpusNearDups(
      crawl, shipped, "doc_id", "text",
      shingleN = 5, numHashes = 64, threshold = 0.8,
      exactVerify = false, charShingles = true)
      .select("id1").collect().map(_.getLong(0)).toSet
    val direct = crawl.select("doc_id").collect().map(_.getLong(0)).toSet -- hits
    assert(viaCatalog == direct)
    // the corpus has planted cross-slice near-dups, so something dropped
    assert(viaCatalog.size < crawl.count())
  }

  test("catalog misuse fails loudly: wrong signature width, binary fingerprints, null sigs filtered") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, Option.empty[String].orNull: String)).toDF("doc_id", "text")
    // null-text docs write no dead catalog rows
    val cat = Dedup.signatureCatalog(docs, "doc_id", "text", numHashes = 32)
    assert(cat.count() == 1)
    // width mismatch = silent under-dedup without the guard
    val e = intercept[IllegalArgumentException] {
      Dedup.crossCorpusDedupBySignatures(
        docs, cat, "id", "sig", "doc_id", "text", numHashes = 64)
    }
    assert(e.getMessage.contains("numHashes"))
    // a binary fingerprint catalog would hash mojibake and match nothing
    val binCat = Seq(Tuple1("a" * 32)).toDF("fp")
      .select(unhex($"fp").as("fp"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.exactCrossDedupByFingerprint(docs, binCat, "fp", "doc_id", "text")
    }
    assert(e2.getMessage.contains("expected"))
  }

  test("Dedup.minhashNearDups finds exact and near dups, not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup always caught
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) || Set(a, b).contains(4L) })
  }

  test("dedup/LSH ops leave no cached frames behind (no persist leaks)") {
    spark.catalog.clearCache()
    Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5).count()
    Dedup.simhashNearDups(docs, "doc_id", "text",
      bits = 64, bands = 8, maxHamming = 10).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "candidatePairs must unpersist every intermediate before returning")
  }

  test("Dedup.crossCorpusNearDups/Dedup.crossCorpusDedup: cross-side pairs only") {
    // corpus: 0/1 duplicate REFERENCE doc 100; 2/3 duplicate EACH OTHER
    // but nothing in the reference -> an in-corpus pair must neither be
    // emitted nor deduped
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "spark partitions and shuffles dominate the cost of wide transformations"),
      (3L, "spark partitions and shuffles dominate the cost of wide transformations"),
      (4L, "completely unrelated corpus document about gardening and soil quality")
    ).toDF("doc_id", "text")
    val reference = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "reference only content on medieval architecture and cathedrals")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusNearDups(corpus, reference, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 100L }) // exact cross dup
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 100L }) // near cross dup
    // id1 always corpus-side, id2 always reference-side, jaccard >= t
    assert(pairs.forall { case (a, b, j) => a <= 4L && b >= 100L && j >= 0.5 })
    val kept = Dedup.crossCorpusDedup(corpus, reference, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L)) // 0/1 dropped; the in-corpus 2/3 pair untouched
  }

  test("crossCandidatePairs leaves no cached frames behind") {
    spark.catalog.clearCache()
    Dedup.crossCorpusNearDups(docs, docs.withColumn("doc_id", col("doc_id") + 100),
      "doc_id", "text", shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "crossCandidatePairs must unpersist both signature frames before returning")
  }

  test("Dedup.minhashDedup drops greedy losers") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept.contains(0L) && !kept.contains(1L))
  }

  test("Dedup.simhashNearDups: identical docs at hamming 0") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text",
      bits = 64, bands = 8, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 1L && h == 0 })
  }

  test("Dedup.ngramJaccardPairs equals naive all-pairs; prune loses nothing") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = docs.select($"doc_id".as("id1"), $"text".as("t1"))
    val naive = a.crossJoin(docs.select($"doc_id".as("id2"), $"text".as("t2")))
      .where($"id1" < $"id2")
      .withColumn("jaccard", Dedup.ngramJaccard($"t1", $"t2", 2))
      .where($"jaccard" >= 0.5)
      .select("id1", "id2", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == naive)
    assert(got.exists { case (a1, b1, _) => a1 == 0L && b1 == 1L }) // exact dup pair
  }

  test("Dedup.ngramJaccardPairsBlocked returns the identical pair set to the all-pairs form") {
    // the 100 TB path (LSH screen + exact verify) vs the exact
    // enumeration, over the real sf0.001 documents table UNSCOPED —
    // stronger than the gate's doc_id < 250 slice
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    val allPairs = Dedup.ngramJaccardPairs(
      corpus, "doc_id", "text", shingleN = 5, threshold = 0.8)
      .collect().map(key).toSet
    val blocked = Dedup.ngramJaccardPairsBlocked(
      corpus, "doc_id", "text", shingleN = 5, threshold = 0.8)
      .collect().map(key).toSet
    assert(blocked == allPairs,
      s"missing=${allPairs -- blocked} extra=${blocked -- allPairs}")
    assert(allPairs.nonEmpty) // the corpus must actually exercise this
  }

  test("Dedup.ngramJaccard: identical=1, disjoint=0") {
    val d = Seq(("abcdef", "abcdef", "zzzzzz")).toDF("a", "b", "c")
    val r = d.select(
      Dedup.ngramJaccard($"a", $"b", 3).as("same"),
      Dedup.ngramJaccard($"a", $"c", 3).as("diff")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("VectorOps: cosine of identical/orthogonal vectors") {
    val d = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    ).toDF("a", "b", "c")
    val r = d.select(
      VectorOps.cosine($"a", $"b").as("same"),
      VectorOps.cosine($"a", $"c").as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("VectorOps.bruteForceTopK ranks planted neighbor first") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f)), // near query 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = VectorOps.bruteForceTopK(vecs, vecs.where($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 1L)
    assert(top(0).getAs[Double]("cosine") > 0.99)
  }

  test("Dedup.embeddingNearDupsExact finds all pairs above threshold; embeddingDedup drops losers") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val near = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val noise = (2L until 40L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val vecs = ((0L, base) +: (1L, near) +: noise).toDF("vec_id", "embedding")

    // exact pairs must equal a naive all-pairs cosine filter
    val got = Dedup.embeddingNearDupsExact(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = vecs.select($"vec_id".as("id1"), VectorOps.asDouble($"embedding").as("v1"))
    val b = vecs.select($"vec_id".as("id2"), VectorOps.asDouble($"embedding").as("v2"))
    val naive = a.crossJoin(b).where($"id1" < $"id2")
      .where(VectorOps.cosine($"v1", $"v2") >= 0.9)
      .select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((0L, 1L)))

    val kept = Dedup.embeddingDedup(vecs, "vec_id", "embedding", 0.9, exact = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L))
  }

  test("Dedup.semanticNearDups/semDedup: planted pairs found, each pair emitted once") {
    spark.catalog.clearCache()
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val near = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val base2 = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val noise = (4L until 40L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val vecs = ((0L, base) +: (1L, near) +: (2L, base2) +: (3L, base2) +: noise)
      .toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDupsFixedCells(vecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 4, replication = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical vectors always share their nearest cell; the perturbed
    // pair is covered by replication=2
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 1L })
    assert(pairs.exists { case (a, b, c) => a == 2L && b == 3L && c >= 0.999 })
    // replication met pairs in up to 2 shared cells — each emitted once
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    val kept = Dedup.semDedupFixedCells(vecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 4, replication = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L))
    assert(kept.contains(2L) && !kept.contains(3L))
    // the DEFAULT (corpus-sized, 40 vecs * 2 / 20 -> 4 cells: the
    // same quantizer regime) drops the same planted losers; the
    // semDedupAuto alias must keep working
    val keptAuto = Dedup.semDedupAuto(vecs, "vec_id", "embedding",
      threshold = 0.9, targetCell = 20, replication = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptAuto.contains(0L) && !keptAuto.contains(1L))
    assert(keptAuto.contains(2L) && !keptAuto.contains(3L))
    // the sizing guard fails loudly past the driver-trainable bound
    intercept[IllegalArgumentException] {
      Dedup.semanticNearDupsAuto(vecs, "vec_id", "embedding",
        threshold = 0.9, targetCell = 2, replication = 1000000)
    }
    // the under-sized-quantizer guard: every cell over the cap must
    // fail loudly, not silently return zero pairs
    val boom = intercept[IllegalStateException] {
      Dedup.semanticNearDupsFixedCells(vecs, "vec_id", "embedding",
        threshold = 0.9, nCells = 2, replication = 1, maxCell = 3)
    }
    assert(boom.getMessage.contains("under-sized"))
    // no cached frames left behind
    assert(spark.sharedState.cacheManager.isEmpty,
      "semanticNearDups must unpersist the indexed frame before returning")
  }

  test("Report.corpusReport: rollup levels, dup rate, approx within HLL error") {
    // src A: 3 docs, one exact dup pair (after normalization) -> 2 distinct
    // src B: 2 docs, both distinct
    val corpus = Seq(
      ("A", "the quick brown fox"),
      ("A", "  THE   quick "), // normalizes to "the quick" — no dup
      ("A", "the quick brown fox"), // exact dup
      ("B", "one two three"),
      ("B", "four five six seven")
    ).toDF("source", "text")
    val rows = Report.corpusReport(corpus, "text", Seq("source"))
      .collect().map(r => (r.getAs[Any]("source"), r.getAs[Int]("gid"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("dup_rate")))
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    val a = byKey(("A", 0))
    assert(a._3 == 3 && a._5 == 2)
    assert(a._6 == 1.0 - 2.0 / 3)
    assert(a._4 == 4 + 2 + 4) // token counts
    val b = byKey(("B", 0))
    assert(b._3 == 2 && b._5 == 2 && b._6 == 0.0)
    val total = byKey((null, 1))
    assert(total._3 == 5 && total._5 == 4 && total._4 == 17)
    // approx path: HLL distinct within its standard error on the real table
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Report.corpusReport(docs, "text", Seq("source"))
      .filter(col("gid") === 1).head().getAs[Long]("n_distinct")
    val approx = Report.corpusReport(docs, "text", Seq("source"), approxDistinct = true)
      .filter(col("gid") === 1).head().getAs[Long]("n_distinct")
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL distinct $approx too far from exact $exact")
  }

  test("RangeJoin.pointInInterval matches the naive nested-loop join exactly once per pair") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "x")
    val intervals = Seq(
      (1L, 0.0, 25.0), (2L, 10.0, 40.0), (3L, 39.5, 140.0), // overlapping, varied widths
      (4L, 200.0, 300.0) // empty
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", binWidth = 30.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = points.crossJoin(intervals)
      .where($"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == naive.sorted) // same pairs, no duplicates from bin overlap
    assert(got.size == got.toSet.size)
  }

  test("RangeJoin.pointInInterval plans as an equi-join, not a nested loop") {
    val points = (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("pid", "x")
    val intervals = Seq((1L, 0.0, 10.0), (2L, 5.0, 30.0)).toDF("iid", "lo", "hi")
    val df = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", binWidth = 10.0)
    df.collect() // finalize the adaptive plan
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    def hasNestedLoop(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasNestedLoop(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => hasNestedLoop(q.plan)
      case other => other.children.exists(hasNestedLoop)
    }
    assert(!hasNestedLoop(qe.executedPlan),
      s"binned range join degenerated to a nested loop:\n${qe.executedPlan}")
  }

  test("reserved-column collisions fail loudly instead of mis-joining") {
    val withBin = Seq((1L, 2.0, 9L)).toDF("pid", "x", "__bin__")
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(withBin, "x", intervals, "lo", "hi", binWidth = 10.0)
    }
    assert(e1.getMessage.contains("__bin__"))

    val withSalt = Seq((1L, 0)).toDF("k", "__salt__")
    val plain = Seq((1L, "a")).toDF("k", "name")
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(withSalt, plain, Seq("k"), factor = 4)
    }
    assert(e2.getMessage.contains("__salt__"))
  }

  test("VectorOps.lshNeighbors recalls a planted near-dup pair") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(32)(rnd.nextGaussian().toFloat)
    val near = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val noise = (2L until 100L).map(i => (i, Seq.fill(32)(rnd.nextGaussian().toFloat)))
    val vecs = ((0L, base) +: (1L, near) +: noise).toDF("vec_id", "embedding")
    val pairs = VectorOps.lshNeighbors(vecs, "vec_id", "embedding",
      nPlanes = 16, rowsPerBand = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("Multimodal: mime sniffing + meta struct + stub decode plumbing") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3, 4, 5)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 9)
    val d = Seq((1L, jpeg), (2L, png)).toDF("id", "payload")
    val rows = Multimodal.withMediaMeta(d, "payload")
      .select($"id", $"media_meta.mime".as("mime"), $"media_meta.size_bytes".as("sz"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.contains((1L, "image/jpeg", 9L)))
    assert(rows.contains((2L, "image/png", 9L)))

    // RIFF containers disambiguate on the form tag: WEBP/WAVE/AVI are
    // distinct and an unrecognized/truncated form is NOT audio/wav
    def riff(form: String) = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ form.getBytes
    val riffs = Seq((1L, riff("WEBP")), (2L, riff("WAVE")), (3L, riff("AVI ")),
      (4L, riff("ACON")), (5L, "RIFF".getBytes ++ Array[Byte](0, 0))).toDF("id", "payload")
    val mimes = riffs.select($"id", Multimodal.sniffMime($"payload").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(mimes(1L) == "image/webp")
    assert(mimes(2L) == "audio/wav")
    assert(mimes(3L) == "video/x-msvideo")
    assert(mimes(4L) == "application/octet-stream")
    assert(mimes(5L) == "application/octet-stream")

    // container magics: Ogg capture pattern and the EBML signature
    val conts = Seq(
      (1L, "OggS".getBytes ++ new Array[Byte](8)),
      (2L, Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte) ++
        new Array[Byte](8))).toDF("id", "payload")
    val cm = conts.select($"id", Multimodal.sniffMime($"payload").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cm(1L) == "audio/ogg")
    assert(cm(2L) == "video/x-matroska")

    val feats = Multimodal.decodeFeaturesStub(d, "payload", dim = 8)
    assert(feats.schema("features").dataType == Multimodal.featureSchema)
    val f = feats.select($"features").collect().map(_.getSeq[Float](0))
    assert(f.forall(_.size == 8))
    // deterministic: same payload -> same features
    val f2 = Multimodal.decodeFeaturesStub(d, "payload", dim = 8)
      .select($"features").collect().map(_.getSeq[Float](0))
    assert(f.toSeq == f2.toSeq)
  }

  test("Multimodal.frameSampleStub emits offset structs") {
    val d = Seq((1L, Array.fill[Byte](100)(7))).toDF("id", "payload")
    val frames = d.select(Multimodal.frameSampleStub($"payload", 25).as("fr"))
      .select(explode($"fr").as("f")).select($"f.frame_index", $"f.byte_offset")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(frames.length == 4)
    assert(frames.contains((3, 75)))
  }
}
