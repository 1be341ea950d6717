package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway profiling harness — NOT committed.
object ScratchMh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val v = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); v
    }
    val docs = Tables.load(spark, dir, "documents")
    (1 to 3).foreach { round =>
      println(s"[mh] ---- round $round ----")
      // stage A: signatures only
      def sigs = docs.select(col("doc_id").as("__id__"), col("text").as("__t__"))
        .groupBy("__id__").agg(first(col("__t__")).as("__t__"))
        .select(col("__id__"), graft.functions.exprs.minhash_char_sig(
          graft.ops.TextOps.normalized(col("__t__")), 5, 64).as("__sig__"))
      time("A signatures")(sigs.count())
      // stage B: full candidate generation (banding + screen + checkpoint)
      val cand = time("B candidatePairs") {
        graft.ops.LshBlocking.candidatePairs(
          sigs, bands = 8, rowsPerBand = 8, maxBucket = 200,
          screen = _.withColumn("est_jaccard",
              graft.functions.similarityExprs.sig_agreement(col("p1"), col("p2")))
            .filter(col("est_jaccard") >= 0.4)
            .select(col("id1"), col("id2"), col("est_jaccard")))
      }
      time("B2 cand.count")(cand.count())
      // stage C: the whole operator
      time("C full minhashNearDups") {
        graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8,
          charShingles = true).count()
      }
    }
    spark.stop()
  }
}
