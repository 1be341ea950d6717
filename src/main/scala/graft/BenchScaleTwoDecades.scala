package graft

import org.apache.spark.sql.SparkSession

/** TWO-decade scaling measurement: the [[BenchScale]] methodology
  * (cold warm-up run, steady = min of two repeats, per-query log-log
  * slope) over THREE corpus sizes — sf0.01 → sf0.1 → an sf1-equivalent
  * synthesized by [[ScaleCorpus]] — so each family shows two
  * consecutive decade slopes. One decade cannot separate fixed
  * overhead from the asymptote (BENCH_SCALE's q_chunk slope −0.053 is
  * a measurement-window artifact, not evidence); the SECOND decade is
  * where a superlinear term would surface: slope_mid_hi well above
  * slope_lo_mid AND above ~1 flags quadratic work that small corpora
  * hide.
  *
  * Covers the heavy dedup set plus the ANN / pack / exact-dedup
  * families (documents + embeddings only — the tables ScaleCorpus
  * replicates). Output: one JSON line to stdout and
  * BENCH_SCALE_r10.json in the working directory.
  *
  * Usage: BenchScaleTwoDecades [loDir midDir hiDir]  (defaults:
  * /root/testdata/sf0.01, /root/testdata/sf0.1, /tmp/graft-sf1)
  */
object BenchScaleTwoDecades {

  val queries: Seq[String] = BenchScale.heavyQueries ++ Seq(
    "q_dedup_exact", "q_dedup_semantic", "q_simsearch_ivf",
    "q_simsearch_lsh", "q_pack")

  def main(args: Array[String]): Unit = {
    val dirs = if (args.length == 3) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qmap = SparkEntry.queries
    val missing = queries.filterNot(qmap.contains)
    require(missing.isEmpty, s"BenchScaleTwoDecades: unknown queries $missing")

    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    dirs.foreach { dir =>
      Seq("documents", "embeddings").foreach(n =>
        Tables.load(spark, dir, n).count())
      queries.foreach { name =>
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

    val entries = queries.map { name =>
      val Seq(lo, mid, hi) = dirs.map(d => times((name, d)))
      val reliable = lo >= 1e-3 && mid >= 1e-3
      s""""$name":{"t_sec":[${r3(lo)},${r3(mid)},${r3(hi)}],""" +
        s""""slope_lo_mid":${r3(slope(lo, mid))},"slope_mid_hi":${r3(slope(mid, hi))},""" +
        s""""slope_two_decade":${r3(slope(lo, hi) / 2)},"reliable":$reliable}"""
    }
    val worst = queries.maxBy(n => slope(times((n, dirs(1))), times((n, dirs(2)))))
    val worstSlope = slope(times((worst, dirs(1))), times((worst, dirs(2))))
    val line = s"""{"metric":"max_second_decade_slope","value":${r3(worstSlope)},""" +
      s""""unit":"log10(t_hi/t_mid) per decade of rows","worst_query":"$worst",""" +
      s""""sf_dirs":${dirs.map(d => s""""$d"""").mkString("[", ",", "]")},""" +
      s""""synthetic_hi":true,"queries":{${entries.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Path.of("BENCH_SCALE_r10.json"), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench-scale2] write failed: $e") }
    println(line)
    spark.stop()
  }
}
