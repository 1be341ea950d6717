package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF (inverted-file) approximate nearest-neighbor index: k-means
  * coarse quantizer → per-cell inverted lists → probe the `nProbe`
  * nearest cells per query.
  *
  * Scale shape: centroids are trained on a bounded driver-side sample
  * (classic IVF practice — the quantizer needs thousands of points, not
  * the corpus), then shipped as a broadcast literal; cell assignment is
  * one codegen'd argmax projection over the corpus (no shuffle); the
  * search joins queries to only the probed cells, so the exact-cosine
  * work is corpus/nCells * nProbe instead of the full corpus.
  */
object Ivf {

  /** Deterministic Lloyd's k-means on a driver-side sample (seeded
    * start from sample points; cosine geometry via L2 on normalized
    * vectors).
    *
    * The sample is a seeded uniform `df.sample` over the WHOLE corpus —
    * never `limit(n)`, which takes the first rows of the first file and
    * at scale trains the quantizer on one shard's distribution (skewed
    * cells, collapsed recall). The preceding count() scans only the
    * vector column's null mask (pruned columnar read) — it must count
    * the NON-NULL population the sample draws from, so it cannot be
    * the metadata-only row count. */
  def trainCentroids(
      df: DataFrame, vecCol: String, nCells: Int,
      sampleSize: Int = 2000, iterations: Int = 8, seed: Long = 42L): Seq[Seq[Double]] = {
    val cs = trainCentroidsOpt(df, vecCol, nCells, sampleSize, iterations, seed)
    require(cs.isDefined,
      "empty training sample — the corpus has no non-null vectors; a " +
        "quantizer cannot be trained on nothing (callers that want " +
        "empty-in/empty-out semantics use trainCentroidsOpt)")
    cs.get
  }

  /** [[trainCentroids]] that returns None instead of failing when the
    * corpus has no non-null vectors — for operators whose natural
    * empty-corpus answer is an empty result ([[topK]],
    * [[graft.ops.Dedup.semanticNearDups]]): the first fully-filtering
    * upstream step must not kill the job at quantizer training. */
  def trainCentroidsOpt(
      df: DataFrame, vecCol: String, nCells: Int,
      sampleSize: Int = 2000, iterations: Int = 8,
      seed: Long = 42L): Option[Seq[Seq[Double]]] = {
    // the fraction must be computed over the SAME population the sample
    // draws from — the NON-NULL vectors (null vectors carry no geometry
    // and would NPE the collect-side toArray). Counting the raw frame
    // instead silently shrinks the expected sample by the null rate: a
    // corpus where a failed extraction batch left 0.01% non-null
    // vectors would draw an expected 0.24 rows and "train" on nothing.
    // count WITHOUT the per-element double cast (nullness is decided
    // before the transform, so the counts are identical and the scan
    // reads just the column's null mask)
    val total = df.filter(col(vecCol).isNotNull).count()
    val nonNull = df.select(VectorOps.asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
    val fraction = if (total == 0) 1.0 else math.min(1.0, sampleSize * 1.2 / total.toDouble)
    // no limit() after the sample: limit takes rows in scan order, so
    // it would keep the FIRST ~sampleSize sampled rows and the corpus
    // tail could never train the quantizer; the fraction already bounds
    // the driver collect at ~1.2x sampleSize
    val sample = nonNull
      .sample(withReplacement = false, fraction, seed)
      .collect().map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty) return None
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val points = sample.map(normalize)
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(points.indices.toList).take(nCells).map(points).toArray
    (0 until iterations).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](points.head.length))
      val counts = new Array[Int](centroids.length)
      points.foreach { p =>
        var best = 0
        var bestDot = Double.MinValue
        centroids.indices.foreach { c =>
          var dot = 0.0
          var i = 0
          while (i < p.length) { dot += p(i) * centroids(c)(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }.toArray
    }
    Some(centroids.map(_.toSeq).toSeq)
  }

  /** Persist a trained quantizer as one parquet table — at corpus
    * scale the quantizer is trained ONCE and reused by every indexing
    * and search job, not re-fit per query. Centroids are bounded
    * driver material by design (`trainCentroids` returns them), so a
    * small local frame is the honest shape here. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[Seq[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "vec").write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer persisted by [[saveCentroids]] (cell order
    * restored — cell ids must survive the round-trip because an
    * existing [[index]] references them). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Seq[Double]] =
    spark.read.parquet(path).orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  /** Driver-side centroid norm, in the SAME sequential accumulation
    * order as [[graft.functions.SimilarityUtil.norm]] — the per-pair
    * `dot/(nv*nc)` then reproduces `cosine_sim(v, centroid)` bit for
    * bit. */
  private def centroidNorm(c: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  /** The per-centroid scoring row shared by [[cellOf]] and
    * [[probeCells]] (r21): the vector expression and its norm are
    * once-bound as lambda variables — the collapsed projection would
    * otherwise re-evaluate BOTH the upstream vector cast and a full
    * norm pass once per centroid per row (nCells× the work on the
    * linear index pass); centroid norms fold to literals on the
    * driver. Scores are bit-identical to cosine_sim (see
    * CosineSimPre). */
  private def scoredCells(v: Column, centroids: Seq[Seq[Double]])(
      finish: Column => Column): Column =
    graft.ops.TextOps.once(v) { vv =>
      graft.ops.TextOps.once(
        graft.functions.similarityExprs.vec_norm(vv)) { nv =>
        val scored = centroids.zipWithIndex.map { case (c, i) =>
          struct(graft.functions.similarityExprs
            .cosine_sim_pre(vv, typedLit(c), nv, lit(centroidNorm(c)))
            .as("s"), lit(i).as("cell"))
        }
        finish(array(scored: _*))
      }
    }

  /** Nearest-centroid cell id for a vector column (array<double> or
    * array<float> — floats widen exactly inside the kernel) —
    * codegen'd argmax over the broadcast centroid literals. */
  def cellOf(v: Column, centroids: Seq[Seq[Double]]): Column =
    scoredCells(v, centroids)(arr => array_max(arr).getField("cell"))

  /** The `nProbe` nearest cells of a vector, as an array column. */
  def probeCells(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    scoredCells(v, centroids)(arr =>
      transform(
        slice(reverse(array_sort(arr)), 1, nProbe),
        e => e.getField("cell")))

  /** Build the inverted index: corpus rows tagged with their cell.
    *
    * `replication > 1` multi-assigns each vector to its `replication`
    * nearest cells (classic IVF boundary-effect fix): recall on hard,
    * weakly-clustered corpora rises sharply for a linear index-size
    * cost — the right trade when the index is cheap relative to the
    * exact-distance work it prunes. */
  def index(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], replication: Int = 1): DataFrame = {
    // null vectors carry no geometry: indexing them would tie-break
    // them all into one cell and let them pad search rankings with
    // NULL-cosine "neighbors" — they are not findable, so they don't
    // enter the index (mirrors trainCentroidsOpt)
    // NATIVE element type (r22 float-carry): __v__ stays float32 when
    // the corpus stores float32 — the cell-assignment kernel
    // (cosine_sim_pre via scoredCells) and every downstream consumer
    // (semanticNearDupsFixedCells' pair join, search's scoring) widen
    // per element exactly, so cells, cosines and results are
    // bit-identical while the persisted index and the pair-join
    // shuffles carry HALF the vector bytes
    val base = df.filter(col(vecCol).isNotNull).select(
      col(idCol).as("__id__"),
      VectorOps.carryVec(df, vecCol).as("__v__"))
    if (replication <= 1)
      base.withColumn("__cell__", cellOf(col("__v__"), centroids))
    else
      base.withColumn("__cell__",
        explode(probeCells(col("__v__"), centroids, replication)))
  }

  /** Top-k cosine neighbors per query, probing `nProbe` cells.
    * `queries` is broadcast; the corpus is filtered to probed cells
    * before any exact cosine is computed. */
  def search(
      indexed: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], k: Int, nProbe: Int): DataFrame = {
    // norms hoisted to one VecNorm per row on each side (r22 — the
    // lshNeighbors r21 discipline brought to IVF search): the probed
    // kernel pays the dot product alone per pair (cosine_sim_pre —
    // bit-identical to cosine_sim), and native float vectors carry
    // through the probe join un-widened (exact)
    val q = broadcast(
      queries.filter(col(vecCol).isNotNull).select(
        col(idCol).as("query_id"),
        VectorOps.carryVec(queries, vecCol).as("__qv__"))
        .withColumn("__qn__",
          graft.functions.similarityExprs.vec_norm(col("__qv__")))
        .withColumn("__probe__", explode(probeCells(col("__qv__"), centroids, nProbe))))
    val c = indexed.withColumn("__cn__",
      graft.functions.similarityExprs.vec_norm(col("__v__")))
    val scored = c
      .join(q, c("__cell__") === q("__probe__"))
      .filter(col("__id__") =!= col("query_id"))
      // a replicated index / multi-probe query can meet the same
      // (query, neighbor) pair via several cells — dedup BEFORE the
      // exact distance so each pair is scored once
      .select(col("query_id"), col("__qv__"), col("__qn__"),
        col("__id__"), col("__v__"), col("__cn__"))
      .dropDuplicates("query_id", "__id__")
      .withColumn("cosine",
        graft.functions.similarityExprs.cosine_sim_pre(
          col("__qv__"), col("__v__"), col("__qn__"), col("__cn__")))
      // undefined similarity (zero-norm / NaN-component vectors) is
      // not a search result: filtered BEFORE ranking so degenerate
      // rows never occupy a top-k slot
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("__id__").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__id__").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Convenience: train + index + search in one call. An empty corpus
    * (no non-null vectors) has no neighbors: empty result, not a
    * quantizer-training failure. */
  def topK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, replication: Int = 2): DataFrame =
    trainCentroidsOpt(corpus, vecCol, nCells) match {
      case Some(centroids) =>
        search(index(corpus, idCol, vecCol, centroids, replication), queries,
          idCol, vecCol, centroids, k, nProbe)
      case None =>
        // neighbor_id's type must come from the CORPUS id column (as in
        // the non-empty branch) — queries' id may differ in type, and a
        // schema that flips with emptiness breaks downstream unions
        queries.select(col(idCol).as("query_id"))
          .crossJoin(corpus.select(col(idCol).as("neighbor_id")))
          .select(col("query_id"), col("neighbor_id"),
            lit(0.0).as("cosine"), lit(1).as("rank")).where(lit(false))
    }
}
