package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming parity: the streamed windowed aggregation over the events
  * table must equal the same aggregation computed in batch. */
class StreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("windowedAgg over a file stream matches the batch computation") {
    // stage the events table (ts in whatever physical type the testdata
    // generation wrote — Tables.eventTime adapts) as a stream dir
    val eventsRaw = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val events = eventsRaw
      .select(graft.Tables.eventTime(eventsRaw).as("ts"),
        col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = Streams.parquetStream(spark, dir, events.schema)
    val agg = Streams.windowedAgg(stream, "ts", "1 hour", "1 hour", "1 hour",
      Seq("event_type"))(count(lit(1)).as("n"))
    Streams.runToMemory(agg, "windowed", OutputMode.Append())

    val streamed = spark.table("windowed")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val batch = events
      .groupBy(window(col("ts"), "1 hour").as("window"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    // append mode only emits windows the watermark has closed; every
    // emitted window must match batch, and most windows must be emitted
    val s = streamed.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = batch.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(s.nonEmpty)
    assert(s.forall { case (k, v) => b.get(k).contains(v) })
    assert(s.size >= b.size / 2)
  }

  test("checkpointed file-sink query resumes exactly-once across restarts") {
    // the durability half of the streaming engine: the checkpoint's
    // offset/commit logs must make a RESTARTED query process only the
    // files that arrived since the last commit — no replay of already
    // sunk data, no gap. This is what lets a 100 TB ingest survive a
    // driver loss without deduplicating its own output afterwards.
    val src = Files.createTempDirectory("graft-ckpt-src").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-log").toString
    def run(): Unit = {
      val q = spark.readStream
        .schema("id LONG")
        .parquet(s"$src/*.parquet")
        .withColumn("doubled", col("id") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    (1L to 50L).toDF("id").coalesce(1).write.parquet(s"$src/batch1.parquet")
    run()
    (51L to 80L).toDF("id").coalesce(1).write.parquet(s"$src/batch2.parquet")
    run() // restart: must pick up ONLY batch2
    run() // restart with no new data: must add nothing
    val got = spark.read.parquet(out).select("id", "doubled").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 80, s"expected exactly-once 80 rows, got ${got.length}")
    assert(got.map(_._1).sorted.toSeq == (1L to 80L))
    assert(got.forall { case (i, d) => d == i * 2 })
  }

  test("stateless corpus ops (repetition/sampling/langid) are streaming-identical") {
    // the text-quality and consistent-sampling family is pure
    // projection/filter — it must produce EXACTLY the batch result
    // when applied to an unbounded source
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-stream-docs").toString
    docs.write.mode("overwrite").parquet(dir)

    def enrich(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.sampleByHash(df, col("doc_id"), 0.5, ":st")
        .select(col("doc_id"),
          graft.ops.TextOps.repetitionRatio(col("text"), 3).as("rep"),
          graft.ops.TextOps.langId(col("text")).as("lang"),
          graft.ops.Sampling.splitByHash(col("doc_id"),
            Seq("train" -> 0.75, "test" -> 0.25), ":sp").as("split"))

    Streams.runToMemory(
      enrich(Streams.parquetStream(spark, dir, docs.schema)), "corpus_ops")
    val streamed = spark.table("corpus_ops").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3))).toMap
    val batch = enrich(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("soft sampling and epoch oversampling are streaming-identical (stateless hash decisions)") {
    // the round-14/15 sampling verbs are pure projection/filter/explode
    // — per-row decisions from (key, salt) hashes and driver-side
    // multiplicity literals, no aggregation — so an unbounded source
    // must yield EXACTLY the batch result. This is the point of the
    // hash-based design: df.sample could not survive a stream.
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    val dir = Files.createTempDirectory("graft-stream-sample").toString
    docs.write.mode("overwrite").parquet(dir)
    val mult = Seq("en" -> 1.4, "de" -> 2.5, "zh" -> 0.6)

    def soft(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.sampleByProbability(
        df, col("doc_id"), col("n_chars").cast("double") / 500.0, ":ss")
        .select("doc_id", "lang")
    def epochs(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.oversampleByMultiplicity(
        df, col("doc_id"), "lang", mult, ":se")
        .select("doc_id", "copy")

    Streams.runToMemory(
      soft(Streams.parquetStream(spark, dir, docs.schema)), "soft_stream")
    Streams.runToMemory(
      epochs(Streams.parquetStream(spark, dir, docs.schema)), "epoch_stream")
    val softStreamed = spark.table("soft_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val softBatch = soft(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(softStreamed.nonEmpty && softStreamed == softBatch)
    val epochStreamed = spark.table("epoch_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val epochBatch = epochs(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(epochStreamed.nonEmpty && epochStreamed == epochBatch)
    // the replication side is real on the stream too: some doc carries
    // copy >= 1 (de is boosted past 2 sure copies)
    assert(epochStreamed.exists(_._2 >= 1))
  }

  test("streaming decontaminateFilter equals the batch join-form decontaminate") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val evalDf = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val dir = Files.createTempDirectory("graft-stream-decon").toString
    corpus.write.mode("overwrite").parquet(dir)

    // one test, two parities: the stateless filter form must equal the
    // join form in batch, and streaming it must change nothing
    val streamed = graft.ops.Contamination.decontaminateFilter(
      Streams.parquetStream(spark, dir, corpus.schema), evalDf, "doc_id", "text")
    Streams.runToMemory(streamed, "decon_stream")
    val s = spark.table("decon_stream").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Contamination.decontaminate(corpus, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s.nonEmpty && s.size < corpus.count())
    assert(s == b)
  }

  test("streaming approximate decontaminateBloom equals its batch form and never keeps a tainted doc") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val evalDf = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val dir = Files.createTempDirectory("graft-stream-bloom").toString
    corpus.write.mode("overwrite").parquet(dir)

    // the approximate form is a pure stateless filter (the bloom is
    // built from the BATCH eval side before the stream starts), so it
    // streams unchanged; one-sided error means it may drop extra
    // clean docs but must agree with itself and never keep contamination
    val streamed = graft.ops.Contamination.decontaminateBloom(
      Streams.parquetStream(spark, dir, corpus.schema), evalDf,
      "doc_id", "text", approximate = true)
    Streams.runToMemory(streamed, "bloom_stream")
    val s = spark.table("bloom_stream").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Contamination.decontaminateBloom(
      corpus, evalDf, "doc_id", "text", approximate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = graft.ops.Contamination.decontaminate(corpus, evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s.nonEmpty && s == b)
    assert(s.subsetOf(exact))
  }

  test("streaming approximate catalog dedup equals its batch form, never keeps a true dup") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val shipped = docs.filter(col("doc_id") % 7 === 0)
    val catalog = graft.ops.Dedup.fingerprints(shipped, "text")
    val dir = Files.createTempDirectory("graft-stream-cat").toString
    docs.write.mode("overwrite").parquet(dir)

    def dedup(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.exactCrossDedupByFingerprint(
        df, catalog, "fingerprint", "doc_id", "text", approximate = true)
    Streams.runToMemory(
      dedup(Streams.parquetStream(spark, dir, docs.schema)), "cat_stream")
    val s = spark.table("cat_stream").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = dedup(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s.nonEmpty && s == b)
    // one-sided: every shipped doc (a true duplicate of itself) is gone
    assert(s.forall(_ % 7 != 0))
  }

  test("LM and NB scoring are streaming-identical (stateless broadcast models)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val model = graft.ops.LmScore.train(
      docs.filter(col("doc_id") % 10 === 0), "text")
    val nb = graft.ops.NbClassifier.train(
      docs.filter(col("doc_id") % 10 === 0), "text", col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = Files.createTempDirectory("graft-stream-lm").toString
    corpus.write.mode("overwrite").parquet(dir)

    def score(df: org.apache.spark.sql.DataFrame) =
      graft.ops.NbClassifier.withNbScore(
        graft.ops.LmScore.withLmScore(df, "text", model), "text", nb)
    Streams.runToMemory(
      score(Streams.parquetStream(spark, dir, corpus.schema)), "lm_stream")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lm_logprob", "nb_score", "nb_score_positive").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    val s = key(spark.table("lm_stream"))
    val b = key(score(corpus))
    assert(s.nonEmpty && s == b)
  }

  test("chunking, cleaning and redaction are streaming-identical") {
    // chunkDocuments is projection + generate and cleanText/redactPii
    // are pure column chains — all must stream without modification
    // and produce exactly the batch rows
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-stream-chunks").toString
    docs.write.mode("overwrite").parquet(dir)

    def xform(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextOps.chunkDocuments(
        df.withColumn("text",
          graft.ops.TextOps.redactPii(graft.ops.TextOps.cleanText(col("text")))),
        "doc_id", "text", maxTokens = 32, overlap = 8)

    Streams.runToMemory(
      xform(Streams.parquetStream(spark, dir, docs.schema)), "chunk_ops")
    val streamed = spark.table("chunk_ops").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    val batch = xform(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("BPE encode-to-ids and token counting are streaming-identical (stateless broadcast model)") {
    // the tensor pipeline's encode step must run unchanged on a
    // stream: bpe_ids/bpe_tokens are stateless expressions under a
    // broadcast model, so streamed rows carry exactly the batch ids
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val model = graft.ops.Bpe.train(
      docs.filter(col("doc_id") % 10 === 0), "text", numMerges = 12)
    val bc = graft.ops.Bpe.broadcastModel(spark, model)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = Files.createTempDirectory("graft-stream-bpeids").toString
    corpus.write.mode("overwrite").parquet(dir)
    def enc(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Bpe.withTokenIds(
        graft.ops.Bpe.withTokenCount(df, "text", "n_tok", bc), "text", "ids", bc)
    Streams.runToMemory(
      enc(Streams.parquetStream(spark, dir, corpus.schema)), "bpe_ids_stream")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tok", "ids").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    val s = key(spark.table("bpe_ids_stream"))
    val b = key(enc(corpus))
    assert(s.nonEmpty && s == b)
    // counts and ids agree with each other too
    s.values.foreach { case (n, ids) => assert(ids.length == n) }
  }

  test("gopher rules, URL canonicalization and mixture sampling are streaming-identical") {
    // all three are pure projection/filter chains — the quality gate,
    // the web-corpus dedup key, and the data-mixing decision must
    // apply to a live stream unchanged, row for row
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft-stream-gopher").toString
    docs.write.mode("overwrite").parquet(dir)

    def xform(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.sampleByStratum(df, col("doc_id"), col("lang"),
        Seq("en" -> 0.75), defaultFraction = 0.5, salt = ":sm")
        .select(col("doc_id"),
          graft.ops.TextOps.gopherPass(
            graft.ops.TextOps.gopherSignals(col("text"))).as("pass"),
          graft.ops.UrlOps.normalizeUrl(
            concat(lit("HTTPS://Ex.COM:443/d/"), col("doc_id").cast("string"),
              lit("?utm_source=s"))).as("url_norm"))

    Streams.runToMemory(
      xform(Streams.parquetStream(spark, dir, docs.schema)), "gopher_ops")
    val streamed = spark.table("gopher_ops").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    val batch = xform(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming minhash near-dup pairs match the batch screen across triggers, emitted once") {
    val dup = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = dup.replace("today", "tonight")
    val batch1 = Seq(
      (0L, dup, "2026-01-01 10:00:00"),
      (3L, "completely different text about database engines and query optimization",
        "2026-01-01 10:00:01"))
    val batch2 = Seq(
      (1L, dup, "2026-01-01 10:00:02"),
      (2L, near, "2026-01-01 10:00:03"),
      (4L, "yet another unrelated document discussing spark partitions and shuffles",
        "2026-01-01 10:00:04"),
      // redelivery of doc 0 (at-least-once source): must neither
      // re-emit its pairs nor pair with itself
      (0L, dup, "2026-01-01 10:00:05"))
    def toDf(s: Seq[(Long, String, String)]) =
      s.toDF("doc_id", "text", "tss")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val dir = Files.createTempDirectory("graft-stream-lsh").toString
    // two separate files + maxFilesPerTrigger=1 -> the pair spans TWO
    // triggers, so detection must come from the keyed state, not from
    // within-batch comparison (file ingestion order is unspecified —
    // assertions are on unordered pairs)
    toDf(batch1).repartition(1).write.mode("append").parquet(dir)
    toDf(batch2).repartition(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(toDf(batch1).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val pairs = Streams.minhashNearDupPairs(stream, "doc_id", "text", "ts",
      watermarkDelay = "1 hour", shingleN = 2, numHashes = 64, bands = 32,
      threshold = 0.5)
    Streams.runToMemory(pairs.toDF(), "lsh_pairs")
    val got = spark.table("lsh_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = got.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSeq
    // exactly one emission per pair despite 32 banding collisions
    assert(keys.distinct.length == keys.length, s"duplicate emissions: ${got.toSeq}")
    // pair set AND estimates equal the batch screen on the same corpus
    val all = toDf(batch1).unionByName(toDf(batch2))
    val expected = graft.ops.Dedup.minhashNearDups(all, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5, exactVerify = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(keys.toSet == expected.keySet, s"got ${keys.toSet} vs ${expected.keySet}")
    got.foreach { case (a, b, est) =>
      assert(est == expected((math.min(a, b), math.max(a, b))))
    }
    assert(expected.keySet.contains((0L, 1L))) // the cross-trigger exact dup
    assert(!keys.contains((0L, 0L)), "redelivered doc paired with itself")
  }

  test("streaming LSH bucket saturates like the batch cap: silent past maxBucket") {
    val dup = "identical boilerplate text repeated across many crawled documents today"
    val rows = (0L until 5L).map(i => (i, dup, s"2026-01-01 10:00:0$i"))
    def toDf(s: Seq[(Long, String, String)]) =
      s.toDF("doc_id", "text", "tss")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val dir = Files.createTempDirectory("graft-stream-lsh-sat").toString
    toDf(rows).repartition(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(toDf(rows).schema).parquet(dir)
    val pairs = Streams.minhashNearDupPairs(stream, "doc_id", "text", "ts",
      watermarkDelay = "1 hour", shingleN = 2, numHashes = 64, bands = 32,
      threshold = 0.5, maxBucket = 2)
    Streams.runToMemory(pairs.toDF(), "lsh_sat")
    val got = spark.table("lsh_sat").collect().map(r => (r.getLong(0), r.getLong(1)))
    // pairs only among the first maxBucket arrivals; the bucket then
    // latches saturated and emits nothing for docs 2..4 (the batch
    // path drops the whole over-cap bucket — streaming cannot retract
    // the one pair already emitted, but must go silent)
    assert(got.toSet == Set((0L, 1L)), s"got ${got.toSeq}")
  }

  test("a late row cannot regress a saturated bucket's timeout and resurrect it") {
    val dup = "identical boilerplate text repeated across many crawled documents today"
    def toDf(s: Seq[(Long, String, String)]) =
      s.toDF("doc_id", "text", "tss")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val dir = Files.createTempDirectory("graft-stream-lsh-late").toString
    // trigger sequence (maxFilesPerTrigger=1, files ordered by mtime):
    //  1. three dups at 10:00 -> (0,1) emitted, bucket saturates
    //  2. a LATE dup (09:05, inside the 1h watermark) plus a fresh
    //     unrelated row at 11:10 that pushes the watermark to 10:10 —
    //     before the fix, the late row dragged the saturated bucket's
    //     timeout back to 10:05 (< watermark)
    //  3. an unrelated watermark-advancer with no data for the bucket —
    //     the regressed timeout would fire HERE and erase the latch
    //  4. two dups at 10:30 — a resurrected bucket would pair them
    val batches = Seq(
      Seq((0L, dup, "2026-01-01 10:00:00"), (1L, dup, "2026-01-01 10:00:01"),
        (2L, dup, "2026-01-01 10:00:02")),
      Seq((3L, dup, "2026-01-01 09:05:00"),
        (4L, "an unrelated document about spark shuffles", "2026-01-01 11:10:00")),
      Seq((5L, "another unrelated document about joins", "2026-01-01 11:20:00")),
      Seq((6L, dup, "2026-01-01 10:30:00"), (7L, dup, "2026-01-01 10:30:01")))
    batches.foreach { b =>
      toDf(b).repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes -> deterministic trigger order
    }
    val stream = spark.readStream.schema(toDf(batches.head).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val pairs = Streams.minhashNearDupPairs(stream, "doc_id", "text", "ts",
      watermarkDelay = "1 hour", shingleN = 2, numHashes = 64, bands = 32,
      threshold = 0.5, maxBucket = 2)
    Streams.runToMemory(pairs.toDF(), "lsh_late")
    val got = spark.table("lsh_late").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((0L, 1L)), s"saturated bucket resurrected: ${got.toSeq}")
  }

  test("the state horizon must cover the watermark delay (loud contract)") {
    val df = Seq((0L, "a", "2026-01-01 10:00:00")).toDF("doc_id", "text", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val e = intercept[IllegalArgumentException] {
      Streams.minhashNearDupPairs(df, "doc_id", "text", "ts",
        watermarkDelay = "2 hours", stateHorizonMs = 3600L * 1000)
    }
    assert(e.getMessage.contains("must cover the watermark delay"))
  }

  test("dedupExact drops later copies of the same fingerprint, keeps distinct docs") {
    val dir = Files.createTempDirectory("graft-stream3").toString
    val docs = Seq(
      ("2024-01-01 00:00:00", 1L, "the quick brown fox"),
      ("2024-01-01 00:01:00", 2L, "The quick  brown FOX"), // same fingerprint as 1
      ("2024-01-01 00:02:00", 3L, "a completely different document"),
      ("2024-01-01 00:03:00", 4L, "the quick brown fox")   // dup again
    ).toDF("ts_s", "doc_id", "text")
      .select(to_timestamp(col("ts_s")).as("ts"), col("doc_id"), col("text"))
    docs.write.mode("overwrite").parquet(dir)

    val stream = Streams.parquetStream(spark, dir, docs.schema)
    val deduped = Streams.dedupExact(stream, "text", "ts", "10 minutes")
    Streams.runToMemory(deduped, "deduped", OutputMode.Append())

    val kept = spark.table("deduped").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 2) // one representative per fingerprint
    assert(kept.contains(3L))
    assert((kept - 3L).subsetOf(Set(1L, 2L, 4L))) // one of the three copies
  }

  test("runBounded returns a self-contained frame and drops its temp view") {
    val dir = Files.createTempDirectory("graft-bounded").toString
    val docs = Seq((1L, "alpha"), (2L, "beta"), (1L, "alpha"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val before = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_bounded_run_")).count()
    val out = Streams.runBounded(
      Streams.parquetStream(spark, dir, docs.schema), OutputMode.Append())
    assert(out.count() == 3L)
    // result usable, but no view accumulated (repeated bench sweeps
    // must not grow driver memory by one full result copy per run)
    val after = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_bounded_run_")).count()
    assert(after == before)
    assert(out.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 1L, 2L))
  }

  test("gapSessions (flatMapGroupsWithState) matches the native session_window in batch") {
    // events for two keys with deliberate >gap silences; files split so
    // maxFilesPerTrigger=1 forces multiple triggers and the advancing
    // watermark closes sessions via the event-time timeout
    val dir = Files.createTempDirectory("graft-sessions").toString
    def ev(key: Long, minute: Int, v: Double) =
      (key, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), v)
    val early = Seq(
      ev(1L, 0, 1.0), ev(1L, 1, 2.0), ev(1L, 2, 3.0),   // session A: 0-2
      ev(1L, 10, 4.0), ev(1L, 11, 5.0),                 // session B: 10-11
      ev(2L, 5, 10.0))                                  // session C: 5
    val late = Seq(ev(2L, 40, 20.0), ev(1L, 45, 6.0))   // push watermark far ahead
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    early.toDF("key", "ts", "value").repartition(1).write.parquet(s"$dir/f1")
    late.toDF("key", "ts", "value").repartition(1).write.parquet(s"$dir/f2")
    val staged = s"$dir/stream"
    new java.io.File(staged).mkdirs()
    // stage in arrival order: f1 strictly before f2 — the file source
    // orders by modification time, and a same-millisecond copy could let
    // the late file go first, discarding every early event as beyond the
    // watermark
    def stage(src: String, prefix: String, mtime: Long): Unit =
      java.nio.file.Files.list(java.nio.file.Paths.get(src)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val dst = java.nio.file.Paths.get(staged, prefix + p.getFileName)
          java.nio.file.Files.copy(p, dst)
          dst.toFile.setLastModified(mtime)
        }
      }
    val now = System.currentTimeMillis()
    stage(s"$dir/f1", "a_", now - 60000)
    stage(s"$dir/f2", "b_", now)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .as[(Long, java.sql.Timestamp, Double)]
      .map { case (k, ts, v) => Streams.SessionEvent(k, ts, v) }
    val sessions = Streams.gapSessions(stream, gapMs = 5 * 60 * 1000L, "1 minute")
    Streams.runToMemory(sessions.toDF(), "sessions", OutputMode.Append())

    val streamed = spark.table("sessions")
      .select("key", "start", "end", "count", "sum")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    // batch oracle: the native session_window over the same rows
    val all = (early ++ late).toDF("key", "ts", "value")
    val batch = all
      .groupBy(col("key"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("count"), sum("value").as("sum"))
      // session_window's end is exclusive (last event + gap); gapSessions
      // reports the last EVENT time — align by subtracting the gap
      .select(col("key"), col("w.start").as("start"),
        (col("w.end").cast("long") - 5 * 60).cast("timestamp").as("end"),
        col("count"), col("sum"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    // every emitted session must equal a batch session; the three early
    // sessions are all past the final watermark, so all must be emitted
    assert(streamed.subsetOf(batch), s"streamed=$streamed\nbatch=$batch")
    assert(streamed.size >= 3, s"expected the 3 closed sessions, got $streamed")
  }

  test("runningTotals keeps per-key state across triggers") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    Seq((1L, 2.0), (1L, 3.0), (2L, 5.0)).toDF("user_id", "value")
      .write.mode("overwrite").parquet(dir)
    val stream = Streams.parquetStream(spark, dir,
      Seq((1L, 1.0)).toDF("user_id", "value").schema)
      .as[(Long, Double)]
    val totals = Streams.runningTotals(stream)
    Streams.runToMemory(totals.toDF(), "totals", OutputMode.Update())
    val out = spark.table("totals")
      .groupBy("key").agg(max("count").as("n"), max("sum").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 5.0), (2L, 1L, 5.0)))
  }
}
