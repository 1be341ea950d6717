package graft

import org.apache.spark.sql.SparkSession

/** Scaling-exponent benchmark: runs the heaviest dedup/decontamination
  * queries at two scale factors a decade apart (sf0.01 → sf0.1) and
  * reports the per-query log-log slope
  *
  *   slope = log10(t(sf0.1) / t(sf0.01))
  *
  * so a superlinear regression is visible per round: slope ≈ 1 means
  * linear in data size, < 1 means fixed overhead still dominates (the
  * common small-SF case), and > ~1.3 flags superlinear work creeping
  * in (a pair enumeration, an unbounded window, a driver loop) that
  * sf0.1 timing alone cannot distinguish from a constant factor.
  *
  * Timing methodology matches [[Bench]]: per (query, sf), one cold run
  * warms codegen, and the reported number is the MINIMUM of two steady
  * runs — min over repeated runs of a deterministic query converges to
  * the true cost from above, so one contended run cannot poison the
  * slope. Output: one JSON line to stdout and BENCH_SCALE.json in the
  * working directory.
  */
object BenchScale {

  /** The five heaviest gate queries by steady-state time in
    * BENCH_r07.json — the ones whose scale behavior matters most —
    * plus q_dedup_ngram_blocked (this round's corpus-scale sibling of
    * the labeled-quadratic q_dedup_ngram, which is excluded BY DESIGN:
    * its all-pairs form is documented reference-scale). */
  val heavyQueries: Seq[String] = Seq(
    "q_dedup_minhash_cluster",
    "q_dedup_cross",
    "q_dedup_minhash",
    "q_dedup_ngram_blocked",
    "q_decontaminate_bloom",
    "q_prep_mix",
    // r8-verdict watch items: the iterative-CC path and the chunking
    // generator — a slope near 1 here is the direct answer to "would
    // this survive a 100× scale-up"
    "q_dedup_cluster",
    "q_chunk")

  def main(args: Array[String]): Unit = {
    val anchorMs = Bench.cpuAnchorMs()
    val sfDirs = Seq(
      sys.env.getOrElse("SPARK_GRAFT_SF_LO", "/root/testdata/sf0.01"),
      sys.env.getOrElse("SPARK_GRAFT_SF_HI", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries
    val missing = heavyQueries.filterNot(queries.contains)
    require(missing.isEmpty, s"BenchScale: unknown queries $missing")

    // (query, sfDir) -> steady seconds
    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    sfDirs.foreach { dir =>
      // warm the parquet footers for this sf so cold-run numbers are
      // codegen-dominated, not IO-dominated, like Bench
      Tables.names.foreach(n => Tables.load(spark, dir, n).count())
      heavyQueries.foreach { name =>
        def once(): Double = {
          val t0 = System.nanoTime()
          queries(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = once()
        val steady = math.min(once(), once())
        System.err.println(
          f"[bench-scale] $name%-26s $dir%-24s cold=$cold%7.2fs steady=$steady%7.2fs")
        times((name, dir)) = steady
      }
    }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Slope computed ONCE per query; the two measurement caveats are
    // carried in the JSON rather than silently absorbed:
    //  - a sub-millisecond sf_lo timing hits the 1e-3 clamp, which
    //    DEFLATES the slope (the direction this gate is trying to
    //    catch) — such slopes are flagged `"reliable":false`.
    //  - the sf_hi pass runs in a JVM already JIT/codegen-warmed by the
    //    sf_lo pass, which also shrinks the slope; the cold run per
    //    (query, sf) absorbs most of it, but treat slopes near a
    //    threshold as indicative, not exact.
    case class Slope(lo: Double, hi: Double, slope: Double, reliable: Boolean)
    val slopes: Map[String, Slope] = heavyQueries.map { name =>
      val lo = times((name, sfDirs(0)))
      val hi = times((name, sfDirs(1)))
      val clamped = lo < 1e-3
      if (clamped) System.err.println(
        f"[bench-scale] WARNING $name sf_lo steady=$lo%.6fs hit the 1e-3 clamp — slope is a lower bound, marked unreliable")
      // the sf dirs are a decade apart, so the slope denominator is 1
      name -> Slope(lo, hi, math.log10(hi / math.max(lo, 1e-3)), !clamped)
    }.toMap
    val entries = heavyQueries.map { name =>
      val s = slopes(name)
      s""""$name":{"sf_lo_sec":${r3(s.lo)},"sf_hi_sec":${r3(s.hi)},"slope":${r3(s.slope)},"reliable":${s.reliable}}"""
    }
    val worst = heavyQueries.maxBy(slopes(_).slope)
    val line = s"""{"metric":"max_scaling_slope","value":${r3(slopes(worst).slope)},"unit":"log10(t_hi/t_lo) per decade of rows","worst_query":"$worst","sf_lo":"${sfDirs(0)}","sf_hi":"${sfDirs(1)}","cpu_anchor_ms":${r3(anchorMs)},"queries":{${entries.mkString(",")}}}"""
    try java.nio.file.Files.writeString(java.nio.file.Path.of("BENCH_SCALE.json"), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench-scale] write failed: $e") }
    println(line)
    spark.stop()
  }
}
