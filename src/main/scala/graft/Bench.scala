package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the scale factor in
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Methodology: three INTERLEAVED sweeps over the whole query set. Sweep
  * 1 (cold) is dominated by one-time whole-stage-codegen compilation of
  * each query's plan shapes; the reported steady-state number is the
  * MINIMUM of each query's sweep-2 and sweep-3 runs. Interleaving is the
  * r8 lesson: back-to-back repeats of ONE query all land inside the same
  * contention window, so min-of-2 defended against a contended RUN but
  * not a contended MINUTE (BENCH_r08 showed 4-13x "regressions" that
  * re-measured at 1-2x on a quiet machine). With full sweeps between a
  * query's repeats (~30s apart at sf0.1), a contention burst must span
  * the whole bench to poison both samples; min over the two sweeps then
  * converges to the true cost from above — it can only over-report
  * contention, never under-report work.
  *
  * The JSON line reports steady-state per query (`queries`) plus scalar
  * totals for both; per-query cold times go to stderr only. The FULL
  * line is the LAST stdout line (r22 — the driver parses the final
  * JSON line, and r18-r21 all recorded "parsed": null while a
  * queries-less summary sat last); it is kept short (3-decimal
  * rounding, no second map, no prose fields) and is ALSO written whole
  * to BENCH_LOCAL.json in the working directory, so a truncated
  * tail-capture can never be the only artifact.
  */
object Bench {

  /** 1-minute load average, read before Spark spins up (so it reflects
    * EXTERNAL machine load) and again at the end. BENCH_r11/r12 both
    * shipped closing numbers from a ~3.7×-contended machine that a
    * quiet re-run did in ~70% (steady) / ~27% (cold) of the time — the
    * artifact now self-describes the load it was captured under. */
  private def loadAvg1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Path.of("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Fixed single-thread CPU anchor: 2e8 xorshift steps, min of two
    * JIT-warmed runs. Round 14 measured a UNIFORM ~1.37× slowdown vs
    * BENCH_r13 across untouched pure-JDK queries — machine-speed
    * drift, but only provable by per-query forensics; this anchor
    * makes the next such comparison one division (same code, same
    * anchor → anchor ratio ≈ machine ratio). */
  private[graft] def cpuAnchorMs(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    once(); math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadAvg1()
    val anchorMs = cpuAnchorMs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor threads, parquet footer reads, codegen
    // of a trivial plan) so the first timed query isn't charged startup
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val names = SparkEntry.queries.keys.toSeq.sorted
    def once(name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L }
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def sweep(label: String): Map[String, (Double, Long)] = {
      val m = names.map(n => n -> once(n)).toMap
      System.err.println(f"[bench] sweep $label done: total=${m.valuesIterator.map(_._1).sum}%.1fs")
      m
    }
    val cold = sweep("1/cold")
    val s1 = sweep("2/steady")
    val s2 = sweep("3/steady")

    // contention defense (r12 lesson: the recorded artifact carried
    // 435s-cold numbers a quiet machine does in 117s): when the cold
    // sweep lands far above the steady sweeps — the signature of a
    // contended capture window, not of codegen (quiet cold/steady is
    // ~1.4×) — or the machine was visibly loaded before Spark started,
    // run ONE more steady sweep so at least one sample has a chance to
    // land outside the burst. Min-of-sweeps then discards the poisoned
    // ones. Thresholds (tightened per the r18 verdict: a 5.68-load,
    // 1.68-cold/steady driver record measured 14% above the
    // idle-machine close of the SAME SHA yet reported
    // contended_suspect=false): the extra-sweep TRIGGER fires at
    // cold/steady > 1.5 or 1-min load > cpus/8 at start — a false
    // trigger costs one extra sweep, cheap insurance. The RECORDED
    // flag is computed separately below from the FINAL (min-of-all-
    // sweeps) ratio at > 1.6 plus the load condition: a measured-idle
    // run whose 2-sweep ratio grazes 1.5 (observed 1.49 final at load
    // 0.93) must not ship labeled contended, while r18's miss (1.68
    // at load 5.68) flags on both conditions.
    // SUCCESSFUL runs only: a fast-throwing failed query contributes a
    // near-zero steady time that would inflate the cold/steady ratio and
    // trigger (or mask) the extra sweep on failure noise, not load
    val okNames = names.filter(n =>
      cold(n)._2 >= 0 && (s1(n)._2 >= 0 || s2(n)._2 >= 0))
    val coldTotal0 = okNames.map(cold(_)._1).sum
    val steadyTotal0 = okNames.map { n =>
      val ok = Seq(s1(n), s2(n)).filter(_._2 >= 0)
      ok.map(_._1).min
    }.sum
    val contendedSuspect =
      coldTotal0 / math.max(steadyTotal0, 1e-3) > 1.5 ||
        loadBefore > cpus.toDouble / 8
    val s3 = if (contendedSuspect) {
      System.err.println(
        f"[bench] CONTENTION SUSPECT (cold/steady=${coldTotal0 / math.max(steadyTotal0, 1e-3)}%.2f, " +
          f"load_before=$loadBefore%.1f) — running one extra steady sweep")
      Some(sweep("4/extra"))
    } else None

    val results = names.map { name =>
      val runs = Seq(s1(name), s2(name)) ++ s3.map(_(name))
      // min over SUCCESSFUL runs only: a fast-throwing failed run must
      // not under-report the steady cost it never paid
      val ok = runs.filter(_._2 >= 0)
      val steady = if (ok.nonEmpty) ok.map(_._1).min else runs.map(_._1).max
      val counts = (Seq(cold(name)) ++ runs).map(_._2)
      System.err.println(
        f"[bench] $name%-24s cold=${cold(name)._1}%7.2fs steady=$steady%7.2fs " +
          f"(sweeps ${s1(name)._1}%.2f/${s2(name)._1}%.2f) rows=${counts.last}")
      if (counts.distinct.size != 1) // a run failed or row counts diverged: flag, keep the bench alive
        System.err.println(s"[bench] WARNING $name row counts differ across runs: ${counts.mkString("/")}")
      (name, cold(name)._1, steady, counts.exists(_ < 0) || counts.distinct.size != 1)
    }
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val steadyObj = results
      .map { case (k, _, s, _) => "\"" + k + "\":" + r3(s) }.mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val totalCold = results.map(_._2).sum
    val failed = results.filter(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val loadAfter = loadAvg1()
    // the RECORDED flag (see the trigger comment above): final ratio
    // after the extra sweep had its chance to repair the steady floor
    val contendedFinal =
      totalCold / math.max(total, 1e-3) > 1.6 ||
        loadBefore > cpus.toDouble / 8
    val loadPart =
      s""""load_avg_before":${r3(loadBefore)},"load_avg_after":${r3(loadAfter)},""" +
        s""""cpu_anchor_ms":${r3(anchorMs)},""" +
        s""""cold_steady_ratio":${r3(totalCold / math.max(total, 1e-3))},""" +
        s""""contended_suspect":$contendedFinal,"extra_sweeps":${s3.size},"""
    // The FULL one-line JSON (per-query map included) is the LAST
    // stdout line — r21 verdict: the driver's parser reads the final
    // JSON line of the output, and rounds 18-21 all recorded
    // "parsed": null because the last line was a compact summary
    // WITHOUT the `queries` map (the full line before it fell off the
    // tail capture). The summary (same scalars, no map) now prints
    // FIRST, purely for humans reading a truncated tail; the full
    // line is kept minimal (the r21 "timing" prose dropped) and is
    // also written whole to BENCH_LOCAL.json so no capture window can
    // ever be the only artifact.
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.length},"total_cold":${r3(totalCold)},"failed":$failed,$loadPart"sf":"$sfDir","queries":$steadyObj}"""
    try java.nio.file.Files.writeString(java.nio.file.Path.of("BENCH_LOCAL.json"), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e") }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.length},"total_cold":${r3(totalCold)},"failed":$failed,$loadPart"sf":"$sfDir","note":"summary; the full line with the queries map follows LAST (and in BENCH_LOCAL.json)"}""")
    println(line)
    spark.stop()
  }
}
