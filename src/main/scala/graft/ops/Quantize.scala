package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.quantExprs

/** Int8-quantized embedding storage and search — the memory/bandwidth
  * scale path for brute-force similarity over a 100 TB corpus.
  *
  * Shape of a real deployment: [[fitScaleI8]] once over the corpus (one
  * aggregate), [[quantizeI8]] writes the (id, qvec) table — 4x smaller
  * than float32, 8x smaller than double — and every later query scans
  * the int8 table via [[topKI8]]/[[thresholdI8]] with NO dequantization
  * pass: cosine is scale-invariant, so the int8 codes feed
  * `cosine_sim_i8` directly against the full-precision query
  * (asymmetric distance computation, one codegen'd kernel, zero
  * per-row allocation).
  *
  * Every step is engine-portable arithmetic (max/abs, IEEE divide,
  * floor-half-up, clamp), so the whole fit -> encode -> score -> rank
  * pipeline is verified against a DuckDB re-implementation by the
  * q_simsearch_quant gate — not just "rows look right".
  */
object Quantize {

  /** Corpus-wide symmetric scale: max |component| / 127 over finite
    * components. One aggregate pass; `None` when the corpus has no
    * finite component at all (empty, all-null, or all-NaN/Inf) —
    * callers return an empty result rather than crash, matching the
    * degenerate-corpus contract of the other ANN entry points. */
  def fitScaleI8(df: DataFrame, vecCol: String): Option[Double] = {
    val row = df
      .agg(max(quantExprs.vec_max_abs(VectorOps.asDouble(col(vecCol)))).as("m"))
      .head()
    if (row.isNullAt(0)) None
    else {
      val m = row.getDouble(0)
      if (m > 0) Some(m / 127.0) else None
    }
  }

  /** (id, qvec array<tinyint>) — the persistable int8 table. Null or
    * degenerate vectors produce a null qvec (they carry no direction to
    * search by; downstream scoring drops them like cosine_sim does). */
  def quantizeI8(
      df: DataFrame, idCol: String, vecCol: String, scale: Double,
      qvecCol: String = "qvec"): DataFrame = {
    require(scale > 0 && !scale.isInfinite,
      s"quantizeI8: scale must be a positive finite double, got $scale " +
        "(fitScaleI8 returns None for corpora where no scale exists)")
    df.select(col(idCol),
      quantExprs.quantize_i8(VectorOps.asDouble(col(vecCol)), lit(scale)).as(qvecCol))
  }

  private def requireQvec(df: DataFrame, qvecCol: String): Unit = {
    val dt = df.schema(qvecCol).dataType
    require(dt match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }, s"expected $qvecCol: array<tinyint> (the quantizeI8 output), " +
      s"got ${dt.simpleString} — searching float embeddings goes through " +
      "VectorOps.bruteForceTopK")
  }

  /** Brute-force top-k over the int8 table: full-precision queries
    * broadcast, one scan of the codes, `cosine_sim_i8` per pair, rank
    * within each query. Same plan shape as
    * [[VectorOps.bruteForceTopK]] — scan -> broadcast-nested-loop ->
    * small-key window — at a quarter of the scan bandwidth. */
  def topKI8(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, qvecCol: String, queryVecCol: String, k: Int): DataFrame = {
    requireQvec(corpus, qvecCol)
    val scored = scoredPairs(corpus, queries, idCol, qvecCol, queryVecCol)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** All (query, neighbor) pairs with int8-ADC cosine above `threshold`. */
  def thresholdI8(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, qvecCol: String, queryVecCol: String,
      threshold: Double): DataFrame = {
    requireQvec(corpus, qvecCol)
    scoredPairs(corpus, queries, idCol, qvecCol, queryVecCol)
      .filter(col("cosine") > threshold)
      .select("query_id", "neighbor_id", "cosine")
  }

  private def scoredPairs(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, qvecCol: String, queryVecCol: String): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"),
        VectorOps.asDouble(col(queryVecCol)).as("__qv__")))
    corpus
      .select(col(idCol).as("neighbor_id"), col(qvecCol).as("__cv__"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", quantExprs.cosine_sim_i8(col("__qv__"), col("__cv__")))
      // NULL cosine = degenerate code or query (all-zero after
      // quantization, NaN components): never occupies a result slot
      .filter(col("cosine").isNotNull)
  }

  /** Decode helper for consumers that DO need approximate float values
    * back (debugging, re-ranking with a different metric): x_i ~=
    * qvec_i * scale. Interpreted transform — decode is not a hot path;
    * similarity search never calls this. */
  def dequantizeI8(qvec: Column, scale: Double): Column =
    transform(qvec, q => q.cast("double") * lit(scale))
}
