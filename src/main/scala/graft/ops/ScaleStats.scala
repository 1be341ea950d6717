package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage candidate-pair accounting for the banded/bucketed corpus
  * operators — the instrumentation that turns a scaling-curve anomaly
  * into an attributed cause. A log-log timing slope says THAT a family
  * accelerated between decades; these counters say WHY: candidate-pair
  * populations are the cost driver of every LSH/cell family, and each
  * stage's count pins which stage's growth carries the time.
  *
  * This is also the pre-flight a 100 TB run wants BEFORE the pair
  * stage executes: `bucketPairs`/`cellPairs` cost one aggregate over
  * the banding frame (no pair is ever enumerated — counts come from
  * n·(n−1)/2 arithmetic on bucket sizes), so an operator whose
  * parameters are under-sized for the corpus (cells filling toward
  * the quadratic regime) is visible for the price of a count.
  */
object ScaleStats {

  /** Bucket-occupancy accounting for one banding configuration:
    * how many (band, bucket) groups exist, how many are pairable
    * (2..maxBucket), how many the cap drops, and the candidate-pair
    * populations each contributes — all from one sort-free aggregate
    * over bucket SIZES (pairs are counted arithmetically, never
    * enumerated). */
  private def bucketAccounting(
      banded: DataFrame, maxBucket: Int): Map[String, Long] = {
    val row = banded
      .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("buckets"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n").between(2, maxBucket), lit(1)).otherwise(lit(0)))
          .as("pairable_buckets"),
        sum(when(col("n") > maxBucket, lit(1)).otherwise(lit(0)))
          .as("capped_buckets"),
        sum(when(col("n").between(2, maxBucket), col("n") * (col("n") - 1))
          .otherwise(lit(0L)) / 2).cast("long").as("candidate_pairs"),
        sum(when(col("n") > maxBucket, col("n") * (col("n") - 1))
          .otherwise(lit(0L)) / 2).cast("long").as("capped_pairs"))
      .head()
    // an empty banding frame (empty/all-null corpus) makes every
    // aggregate but count() NULL — report zeroed counters, don't NPE
    def at(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    Map(
      "buckets" -> at(0),
      "max_bucket" -> at(1),
      "pairable_buckets" -> at(2),
      "capped_buckets" -> at(3),
      "candidate_pairs" -> at(4),
      "capped_pairs" -> at(5))
  }

  /** Stage accounting for [[Dedup.minhashNearDups]] at the given
    * parameters: input rows → banding occupancy → screen survivors →
    * exact-verify candidates → verified pairs. Runs the same signature
    * pipeline and banding as the operator (a measurement tool — it
    * re-executes stages the production query fuses). */
  def minhash(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      threshold: Double, maxBucket: Int,
      charShingles: Boolean): Map[String, Long] = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sigs = Dedup.nativeSigs(df, idCol, textCol, shingleN, numHashes, charShingles)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docs = sigs.count()
      val banded = LshBlocking.bandRows(sigs, bands, r, "__sig__")
      val occupancy = bucketAccounting(banded, maxBucket)
      // the screen/verify populations, re-derived with the operator's
      // own thresholds (margin screen at t/2, emit at t)
      val screened = LshBlocking.candidatePairs(sigs, bands, r, maxBucket,
        screen = _.withColumn("est_jaccard",
            graft.functions.similarityExprs.sig_agreement(col("p1"), col("p2")))
          .filter(col("est_jaccard") >= threshold * 0.5)
          .select(col("id1"), col("id2"), col("est_jaccard")))
      val screenSurvivors = screened.count()
      val verifyCandidateIds = screened.select(col("id1").as("i"))
        .union(screened.select(col("id2").as("i"))).distinct().count()
      val verified = Dedup.minhashNearDups(df, idCol, textCol, shingleN,
        numHashes, bands, threshold, maxBucket, exactVerify = true,
        charShingles = charShingles).count()
      Map("rows" -> docs,
        "band_rows" -> docs * bands,
        "screen_survivors" -> screenSurvivors,
        "verify_candidate_ids" -> verifyCandidateIds,
        "verified_pairs" -> verified) ++ occupancy
    } finally sigs.unpersist(false)
  }

  /** Stage accounting for [[Dedup.semanticNearDups]]: vectors → cell
    * assignments → cell occupancy (the within-cell pair population IS
    * this family's cost) → emitted pairs. */
  def semantic(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int, replication: Int,
      maxCell: Int = 10000, seed: Long = 42L): Map[String, Long] = {
    // same sample sizing as the operator, so occupancy here is the
    // occupancy the query actually runs under
    val centroids = Ivf.trainCentroidsOpt(df, vecCol, nCells,
      sampleSize = math.max(2000, 5 * nCells), seed = seed)
      .getOrElse(return Map("rows" -> 0L))
    val indexed = Ivf.index(df, idCol, vecCol, centroids, replication)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val assignments = indexed.count()
      val occ = bucketAccounting(
        indexed.select(lit(0).as("band"), col("__cell__").as("bucket")), maxCell)
      // the measurement tool must still record the all-capped regime
      // the operator itself refuses to run (the refusal IS the
      // datapoint): guard trips are recorded, not propagated
      val (emitted, guardTripped) =
        try (Dedup.semanticNearDups(df, idCol, vecCol, threshold,
          nCells, replication, maxCell, seed).count(), 0L)
        catch { case _: IllegalStateException => (0L, 1L) }
      Map("rows" -> assignments / math.max(replication, 1),
        "guard_tripped" -> guardTripped,
        "assignments" -> assignments,
        "cells" -> occ("buckets"),
        "max_cell" -> occ("max_bucket"),
        "pairable_cells" -> occ("pairable_buckets"),
        "capped_cells" -> occ("capped_buckets"),
        "candidate_pairs" -> occ("candidate_pairs"),
        "capped_pairs" -> occ("capped_pairs"),
        "emitted_pairs" -> emitted)
    } finally indexed.unpersist(false)
  }
}
