package graft

import org.apache.spark.sql.SparkSession

/** Multi-decade scaling measurement: the [[BenchScale]] methodology
  * (cold warm-up run, steady = min of two repeats, per-query log-log
  * slope) over FOUR corpus sizes — sf0.01 → sf0.1 → an sf1-equivalent
  * (10 replicas) → an sf2.6-equivalent (26 replicas, [[ScaleCorpus]]'s
  * rotation ceiling) — so each family shows two consecutive decade
  * slopes, and the worst families a third ~0.4-decade confirmation
  * point. One decade cannot separate fixed overhead from the
  * asymptote; the SECOND decade is where a superlinear term surfaces;
  * the THIRD point confirms (or falsifies) the decade-2 trend.
  *
  * Beyond timings, the artifact carries an ATTRIBUTION section
  * ([[graft.ops.ScaleStats]]): per-stage candidate-pair and
  * bucket/cell-occupancy counts for the similarity-dedup flagships,
  * measured at mid/hi/xhi; at xhi additionally the cluster family's
  * CC round structure and the auto-semantic train-vs-pair timing
  * split. Attribution from round 11's first run (the reason the
  * corpus-sized quantizer is now the DEFAULT semantic path):
  *  - semantic at fixed nCells=8: candidate pairs 0.999M → 100.0M for
  *    a 10× corpus — exact quadratic cell fill (Σ n_c² with n_c ∝ n);
  *    the auto-sized default pins occupancy and returns to linear.
  *  - minhash: every stage linear (pairs 1816 → 19238, screen
  *    survivors 278 → 2659, zero capped buckets) — its slope rise is
  *    fixed overhead amortizing toward slope 1.0, benign.
  *
  * The headline is SPLIT: `worst_production` covers the shipping
  * paths; `worst_diagnostic` isolates the deliberately-pinned
  * fixed-quantizer row (q_dedup_semantic_fixed), whose quadratic
  * regime is the measured thing the production default avoids — a
  * dashboard should quote the production number.
  *
  * Covers the heavy dedup set plus the ANN / pack / exact-dedup
  * families (documents + embeddings only — the tables ScaleCorpus
  * replicates). Output: one JSON line to stdout and
  * BENCH_SCALE_r22.json in the working directory.
  *
  * Usage: BenchScaleTwoDecades [loDir midDir hiDir xhiDir]  (defaults:
  * /root/testdata/sf0.01, /root/testdata/sf0.1, /tmp/graft-sf1,
  * /tmp/graft-sf26)
  */
object BenchScaleTwoDecades {

  /** The deliberately-pinned diagnostic rows, reported under
    * `worst_diagnostic` and excluded from the production headline. */
  val diagnosticQueries: Set[String] = Set("q_dedup_semantic_fixed")

  val queries: Seq[String] = BenchScale.heavyQueries ++ Seq(
    "q_dedup_exact", "q_dedup_semantic", "q_dedup_semantic_fixed",
    // q_simsearch_lsh (fixed 4-bit bands) ran here through r15's
    // sweep, which measured it saturating at sf1+ (all 64 buckets
    // capped, 0 pairs) — the all-capped guard now FAILS that shape
    // loudly, so the scale row is the corpus-sized plan instead; the
    // fixed-band gate still runs in the sf0.1 bench and in the
    // attribution section (where its guard trip is the datapoint)
    "q_simsearch_ivf", "q_simsearch_lsh_auto", "q_pack",
    "q_simsearch_quant", "q_project_rp_full",
    // round-13 full-corpus families: real-token budgeting/packing/
    // chunking (BPE encode is the per-row cost), the two mixture ops
    // (prefix-sum + scan shapes), and boundary-table packing — all
    // expected ~linear
    "q_sample_budget_bpe", "q_pack_bpe", "q_chunk_bpe",
    "q_sample_temperature", "q_mixture_order", "q_shards_boundaries",
    // round-17 family: whole-document next-fit packing over the full
    // corpus (encode + one bucket shuffle + streaming fold — expected
    // ~linear, the one-exchange plan audited in PackingSpec)
    "q_pack_whole_full",
    // round-14 families: encode-only THROUGHPUT (fixed model, whole
    // corpus — a tokenizer regression must show as a slope, not an
    // anecdote) and the full text→ids→fixed-length-sequences pipeline
    "q_bpe_encode_full", "q_pack_ids_full",
    // round-18 family: banded cross-corpus embedding dedup at corpus
    // scale (combined-population band plan + cross-side-only bucket
    // collisions — expected ~linear like the lsh_auto row)
    "q_dedup_cross_embedding_full")

  /** Scale-only run shapes that are not gate queries: the gate form of
    * q_project_rp caps at 300 vectors (the oracle's brute-force
    * scope), which would measure filter pruning, not the operator —
    * the scale row projects the FULL corpus (one codegen'd pass,
    * expect flat-to-linear, like q_simsearch_quant's full-corpus
    * fit+encode+score, which runs as its gate form unchanged). */
  val extraThunks: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "q_project_rp_full" -> ((s, dir) =>
        ops.VectorOps.randomProject(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          outDim = 16, tag = "rp")),
      // encode-only throughput: the fixed gate model over the FULL
      // corpus, reduced to one total so column pruning cannot skip the
      // encode (a bare select(...).count() would) — the row's time IS
      // tokens/sec up to the corpus token total, expected ~linear
      "q_bpe_encode_full" -> ((s, dir) =>
        Tables.load(s, dir, "documents")
          .agg(org.apache.spark.sql.functions.sum(
            ops.Bpe.tokenCount(org.apache.spark.sql.functions.col("text"),
              SparkEntry.bpeGateBc(s))).as("total_tokens"))),
      // LSH at the corpus-sized band plan (lshPlan re-plans bits and
      // band count from n at the op's 0.7 design threshold) — the
      // production shape that cannot saturate by corpus growth
      "q_simsearch_lsh_auto" -> ((s, dir) =>
        ops.VectorOps.lshNeighborsAuto(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding")),
      // the full tensor pipeline at corpus scale: encode to ids +
      // bucketed prefix sum + piece explode + one groupBy into
      // 1024-id fixed-length sequences
      "q_pack_ids_full" -> ((s, dir) =>
        ops.Packing.packTokenIds(
          ops.Bpe.withTokenIds(Tables.load(s, dir, "documents"),
            "text", "__ids__", SparkEntry.bpeGateBc(s)),
          "doc_id", "__ids__", seqLen = 1024, padId = 0)),
      // banded cross-corpus embedding dedup over the FULL corpus at
      // the op's lshNeighbors design threshold (0.7 — the regime the
      // band plan is sized for; this corpus's max pairwise cosine is
      // ~0.51, so the row measures candidate generation + screen cost
      // on a realistic no-overlap crawl, the common production case)
      "q_dedup_cross_embedding_full" -> ((s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val vid = org.apache.spark.sql.functions.col("vec_id")
        ops.Dedup.crossCorpusEmbeddingDedup(
          emb.filter(vid % 5 =!= 0),
          ops.Dedup.embeddingCatalog(
            emb.filter(vid % 5 === 0), "vec_id", "embedding"),
          "id", "embedding", "vec_id", "embedding", threshold = 0.7)
      }),
      // whole-document next-fit packing at corpus scale (the SFT
      // shape): encode + oversize filter + ONE bucket shuffle +
      // streaming per-bucket fold
      "q_pack_whole_full" -> ((s, dir) =>
        // the encoded column must not shadow packWholeDocs' internal
        // __ids__ working name (the op guards it loudly)
        ops.Packing.packWholeDocs(
          ops.Bpe.withTokenIds(Tables.load(s, dir, "documents"),
            "text", "__tok__", SparkEntry.bpeGateBc(s))
            .filter(org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.col("__tok__"))
              .between(1, 1024)),
          "doc_id", "__tok__", seqLen = 1024, padId = 0)))

  /** Worst families by mid→hi slope in BENCH_SCALE_r10 (+ the cluster
    * path and the default corpus-sized semantic): these also run the
    * xhi point. q_dedup_semantic_fixed (nCells=8) deliberately does
    * NOT run xhi: at 26 replicas every cell exceeds maxCell and the
    * operator FAILS LOUDLY (under-sized-quantizer guard) instead of
    * returning zero pairs — the attribution section still records its
    * cell occupancy there via ScaleStats, which measures without
    * running the guarded pair stage. */
  val xhiQueries: Seq[String] = Seq(
    "q_dedup_semantic", "q_dedup_minhash",
    "q_dedup_cross", "q_dedup_minhash_cluster", "q_dedup_cluster",
    "q_prep_mix", "q_simsearch_quant", "q_project_rp_full",
    "q_bpe_encode_full", "q_pack_ids_full",
    "q_dedup_cross_embedding_full")

  /** xhi is 26 replicas vs hi's 10: 0.415 decades. */
  private val xhiDecades = math.log10(26.0 / 10.0)

  def main(args: Array[String]): Unit = {
    val dirs = if (args.length == 4) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/tmp/graft-sf1", "/tmp/graft-sf26")
    val Seq(loDir, midDir, hiDir, xhiDir) = dirs
    // the scale sweeps are as machine-sensitive as the bench, and the
    // xhi points are where drift most resembles a slope — same fixed
    // single-thread anchor as Bench, so a cross-round slope dispute is
    // one division (r14 verdict #6)
    val anchorMs = Bench.cpuAnchorMs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qmap = SparkEntry.queries ++ extraThunks
    val missing = queries.filterNot(qmap.contains)
    require(missing.isEmpty, s"BenchScaleTwoDecades: unknown queries $missing")

    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    dirs.foreach { dir =>
      val qs = if (dir == xhiDir) xhiQueries else queries
      Seq("documents", "embeddings").foreach(n =>
        Tables.load(spark, dir, n).count())
      qs.foreach { name =>
        def once(): Double = {
          val t0 = System.nanoTime()
          qmap(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = once()
        val steady = math.min(once(), once())
        System.err.println(
          f"[bench-scale2] $name%-26s $dir%-24s cold=$cold%7.2fs steady=$steady%7.2fs")
        times((name, dir)) = steady
      }
    }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def slope(lo: Double, hi: Double): Double = math.log10(hi / math.max(lo, 1e-3))

    // per-stage attribution for the two flagship similarity families
    // (mid/hi/xhi): candidate-pair populations are the cost driver,
    // and their growth rate attributes each family's timing slope
    def jmap(m: Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val attribution = Seq(midDir, hiDir, xhiDir).map { dir =>
      val docs = Tables.load(spark, dir, "documents")
      val emb = Tables.load(spark, dir, "embeddings")
      val mh = ops.ScaleStats.minhash(docs, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8,
        maxBucket = 200, charShingles = true)
      val se = ops.ScaleStats.semantic(emb, "vec_id", "embedding",
        threshold = 0.4, nCells = 8, replication = 2)
      val n = emb.filter(org.apache.spark.sql.functions.col("embedding").isNotNull).count()
      val autoCells = math.max(2L, (n * 2 + 511) / 512).toInt
      val seAuto = ops.ScaleStats.semantic(emb, "vec_id", "embedding",
        threshold = 0.4, nCells = autoCells, replication = 2)
      // the r14 watch item (q_simsearch_lsh/_exact at the top of the
      // uniform drift band): band rows / candidate pairs / sig-vs-
      // verify timing split at the gate's exact parameters, so the
      // next cross-round ratio is attributable to a stage or to the
      // anchor
      val ls = ops.ScaleStats.lsh(emb, "vec_id", "embedding",
        nPlanes = 16, rowsPerBand = 4, threshold = 0.25)
      // the corpus-sized plan's occupancy next to the fixed shape's:
      // the fixed 4-bit bands trip the all-capped guard at sf1+, the
      // planned shape must show pairable buckets and live pairs there
      val (planPlanes, planRows) = ops.VectorOps.lshPlan(n, 0.7)
      val lsAuto = ops.ScaleStats.lsh(emb, "vec_id", "embedding",
        nPlanes = planPlanes, rowsPerBand = planRows, threshold = 0.7) +
        ("n_planes" -> planPlanes.toLong) + ("rows_per_band" -> planRows.toLong)
      // the two steeper hi→xhi families get the deeper treatment at
      // the LAST two points (r11 verdict #6): the cluster family's
      // per-stage volumes + CC round structure (default path, AND the
      // distributed path forced so its round shape is on record), and
      // the auto-semantic train-vs-pair timing split
      val deep =
        if (dir == midDir) ""
        else {
          val cl = ops.ScaleStats.cluster(docs, "doc_id", "text", shingleN = 8)
          val clDist = ops.ScaleStats.cluster(docs, "doc_id", "text",
            shingleN = 8, maxDriverEdges = 0)
          val ph = ops.ScaleStats.semanticPhases(emb, "vec_id", "embedding",
            threshold = 0.4, targetCell = 512, replication = 2)
          // the r13 hi→xhi watch item (cross 0.629): per-stage pair
          // volumes + screen-vs-verify timing split at the q_dedup_cross
          // parameters, so the slope attributes to a stage
          val crossCol = org.apache.spark.sql.functions.col("doc_id")
          def crossOnce() = ops.ScaleStats.cross(
            docs.filter(crossCol % 10 =!= 0), docs.filter(crossCol % 10 === 0),
            "doc_id", "text", shingleN = 5, numHashes = 64, bands = 8,
            threshold = 0.8, maxBucket = 200, charShingles = true)
          val cr = crossOnce()
          // the r17 watch item: the hi→xhi slopes of q_dedup_cross and
          // q_dedup_semantic oscillate 0.55↔0.81 / 0.81↔1.06 BETWEEN
          // same-code runs. One measurement cannot attribute a band —
          // repeat each family's stage split in the SAME process and
          // emit both: the volume fields must agree exactly (the
          // plans are deterministic), so whichever STAGE TIMING moves
          // between the repeats is the band's carrier (and the band
          // is thereby attributed to scheduler/cache variance on that
          // stage's scan volume, not to plan shape).
          val cr2 = crossOnce()
          val ph2 = ops.ScaleStats.semanticPhases(emb, "vec_id", "embedding",
            threshold = 0.4, targetCell = 512, replication = 2)
          // the r18 watch item (q_simsearch_lsh_auto carried the
          // worst production mid→hi slope, 0.556): the lsh_auto split
          // repeated in the SAME process at hi/xhi. The volume fields
          // (rows, band_rows, buckets, candidate_pairs) and the plan
          // fields (n_planes, rows_per_band — already per-dir above)
          // must agree exactly between the repeats; whatever remains
          // of the slope after candidate_pairs growth and the
          // n_planes·rows plan widening is the timing swing BETWEEN
          // repeats — the scheduler/cache variance carrier, same
          // discipline as cross/semantic.
          val lsAuto2 = ops.ScaleStats.lsh(emb, "vec_id", "embedding",
            nPlanes = planPlanes, rowsPerBand = planRows, threshold = 0.7) +
            ("n_planes" -> planPlanes.toLong) +
            ("rows_per_band" -> planRows.toLong)
          // the r19 watch item (q_dedup_semantic hi→xhi oscillates
          // 0.63↔0.98 between same-code runs at equal candidate
          // volumes): the semantic CANDIDATE-VOLUME split repeated in
          // the SAME process at hi/xhi — semantic_auto already carries
          // the volume fields (assignments, cells, candidate_pairs,
          // emitted_pairs) per dir; this repeat must reproduce them
          // EXACTLY (the auto plan is deterministic), so the slope
          // band attributes to timing variance on a fixed plan, the
          // same discipline lsh_auto got in r19.
          val seAuto2 = ops.ScaleStats.semantic(emb, "vec_id", "embedding",
            threshold = 0.4, nCells = autoCells, replication = 2) +
            ("n_cells" -> autoCells.toLong)
          s""","cluster":${jmap(cl)},"cluster_distributed":${jmap(clDist)},""" +
            s""""semantic_auto_phases":${jmap(ph)},""" +
            s""""semantic_auto_phases_repeat":${jmap(ph2)},""" +
            s""""semantic_auto_repeat":${jmap(seAuto2)},""" +
            s""""cross":${jmap(cr)},"cross_repeat":${jmap(cr2)},""" +
            s""""lsh_auto_repeat":${jmap(lsAuto2)}"""
        }
      System.err.println(s"[bench-scale2] attribution $dir done")
      s""""$dir":{"minhash":${jmap(mh)},"lsh":${jmap(ls)},""" +
        s""""lsh_auto":${jmap(lsAuto)},""" +
        s""""semantic_fixed8":${jmap(se)},""" +
        s""""semantic_auto":${jmap(seAuto + ("n_cells" -> autoCells.toLong))}$deep}"""
    }.mkString("{", ",", "}")

    val entries = queries.map { name =>
      val Seq(lo, mid, hi) = Seq(loDir, midDir, hiDir).map(d => times((name, d)))
      val reliable = lo >= 1e-3 && mid >= 1e-3
      val xhiPart = times.get((name, xhiDir)).map { x =>
        s""","t_xhi_sec":${r3(x)},"slope_hi_xhi":${r3(slope(hi, x) / xhiDecades)}"""
      }.getOrElse("")
      s""""$name":{"t_sec":[${r3(lo)},${r3(mid)},${r3(hi)}],""" +
        s""""slope_lo_mid":${r3(slope(lo, mid))},"slope_mid_hi":${r3(slope(mid, hi))},""" +
        s""""slope_two_decade":${r3(slope(lo, hi) / 2)},"reliable":$reliable$xhiPart}"""
    }
    // SPLIT headline (r11 verdict #2): the number a dashboard quotes
    // is the worst PRODUCTION slope; the deliberately-pinned
    // diagnostic row (fixed-quantizer semantic — the quadratic regime
    // the default avoids) is reported apart so it cannot masquerade
    // as a shipping-path regression
    def worstOf(qs: Seq[String]): (String, Double) = {
      val w = qs.maxBy(n => slope(times((n, midDir)), times((n, hiDir))))
      (w, slope(times((w, midDir)), times((w, hiDir))))
    }
    val (wProd, wProdSlope) = worstOf(queries.filterNot(diagnosticQueries))
    val (wDiag, wDiagSlope) = worstOf(queries.filter(diagnosticQueries))
    val line = s"""{"metric":"max_second_decade_slope_production","value":${r3(wProdSlope)},""" +
      s""""unit":"log10(t_hi/t_mid) per decade of rows","worst_query":"$wProd",""" +
      s""""worst_production":{"query":"$wProd","slope_mid_hi":${r3(wProdSlope)}},""" +
      s""""worst_diagnostic":{"query":"$wDiag","slope_mid_hi":${r3(wDiagSlope)},""" +
      s""""note":"deliberately-pinned fixed-nCells quantizer — the measured-quadratic regime the default (corpus-sized) path avoids"},""" +
      s""""sf_dirs":${dirs.map(d => s""""$d"""").mkString("[", ",", "]")},""" +
      s""""cpu_anchor_ms":${r3(anchorMs)},""" +
      s""""synthetic_hi":true,"xhi_replicas":26,"queries":{${entries.mkString(",")}},""" +
      s""""attribution":$attribution}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Path.of("BENCH_SCALE_r22.json"), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench-scale2] write failed: $e") }
    println(line)
    spark.stop()
  }
}
