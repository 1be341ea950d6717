package graft

import org.apache.spark.sql.SparkSession

// temporary subset bench — interleaved sweeps over named queries,
// reports per-query minimum. NOT part of the driver contract; deleted
// before the round closes.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SCRATCH_SWEEPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val names = args.toSeq
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = scala.collection.mutable.Map[String, List[Double]]()
    (1 to sweeps).foreach { s =>
      names.foreach { n =>
        val t = once(n)
        results(n) = t :: results.getOrElse(n, Nil)
      }
      System.err.println(s"[scratch] sweep $s done")
    }
    names.foreach { n =>
      val ts = results(n).reverse
      println(f"[scratch] $n%-28s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.2f").mkString("/")}")
    }
    spark.stop()
  }
}
