package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Vector similarity primitives over embedding columns
  * (`array<float>`/`array<double>`), built on codegen'd higher-order
  * functions — no UDFs in the hot path.
  *
  * Determinism note: [[dot]]/[[norm]] fold left-to-right in double
  * precision, so results are bit-identical to any engine doing
  * sequential double arithmetic over the same values (the DuckDB oracle
  * uses `list_sum(list_transform(...))`, which matches exactly).
  */
object VectorOps {

  /** Cast an embedding column to array<double> (float32 parquet input). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential dot product: sum_i a_i*b_i, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm, sequential accumulation. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * Scale shape: `queries` is broadcast (small side by construction);
    * the corpus is scanned exactly once with no shuffle before the
    * per-query rank — the 100 TB plan is
    * scan → broadcast-nested-loop → window on query_id (tiny key space).
    * For large k or many queries use [[lshNeighbors]].
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(
        col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv__")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv__"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv__"), col("__cv__")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** All pairs (query, neighbor) with cosine above `threshold`. */
  def cosineThreshold(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv__")))
    corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv__"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv__"), col("__cv__")))
      .filter(col("cosine") > threshold)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Deterministic random hyperplanes for sign-LSH, from a fixed seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bit signature (array<int> of 0/1) of a vector column. */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column = {
    val h = typedLit(planes)
    transform(sequence(lit(0), lit(planes.size - 1)),
      i => when(dot(v, element_at(h, i + 1)) >= 0, lit(1)).otherwise(lit(0)))
  }

  /** Approximate near-neighbor pairs via sign-LSH banding: vectors
    * sharing any band of `rowsPerBand` signature bits become candidates,
    * then exact cosine filters by `threshold`.
    *
    * Scale shape: one shuffle on (band, bucket-hash) — the classic LSH
    * trade; no O(n^2) cross join. Candidate pairs are generated inside
    * each bucket with a size cap to bound skew (a degenerate bucket of
    * m rows would otherwise emit m^2 pairs).
    */
  def lshNeighbors(
      df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 32, rowsPerBand: Int = 8,
      threshold: Double = 0.7, maxBucket: Int = 1000,
      seed: Long = 42L): DataFrame = {
    require(nPlanes % rowsPerBand == 0, "nPlanes must be divisible by rowsPerBand")
    val nBands = nPlanes / rowsPerBand
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)

    val sigs = df.select(
      col(idCol).as("__id__"),
      asDouble(col(vecCol)).as("__v__"),
      lshSignature(asDouble(col(vecCol)), planes).as("__sig__"))

    val banded = sigs.select(
      col("__id__"), col("__v__"),
      explode(transform(sequence(lit(0), lit(nBands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("__sig__"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select(col("__id__"), col("__v__"), col("bb.band"), col("bb.bucket"))

    // pairs within each (band, bucket); cap bucket size against skew
    val buckets = banded
      .groupBy("band", "bucket")
      .agg(slice(sort_array(collect_list(struct(col("__id__"), col("__v__")))), 1, maxBucket).as("members"))
      .filter(size(col("members")) > 1)

    val pairs = buckets
      .select(explode(flatten(
        transform(col("members"), (x, i) =>
          transform(slice(col("members"), i + 2, size(col("members"))),
            y => struct(x.getField("__id__").as("id1"), y.getField("__id__").as("id2"),
              x.getField("__v__").as("v1"), y.getField("__v__").as("v2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.v1"), col("p.v2"))
      .dropDuplicates("id1", "id2")

    pairs
      .withColumn("cosine", cosine(col("v1"), col("v2")))
      .filter(col("cosine") > threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }
}
