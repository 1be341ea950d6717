package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale shapes (the whole point of each variant):
  *  - exact: one hash-aggregate shuffle on the fingerprint.
  *  - minhash/simhash LSH: shuffle on (band, bucket) — candidates only,
  *    never O(n^2); bucket size capped against skew.
  *  - embedding: sign-LSH via [[VectorOps.lshNeighbors]].
  */
object Dedup {

  /** Exact dedup on normalized-text fingerprint: keeps the row with the
    * smallest `orderCol` per fingerprint (deterministic winner). */
  def exact(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol))).orderBy(col(orderCol))
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .drop("__rn__")
  }

  /** MinHash signature column (array<long> of `numHashes` minima over
    * shingle hashes). Seeded by hash index — deterministic everywhere.
    *
    * NOTE: nested higher-order functions run interpreted (no codegen) —
    * fine for a handful of rows, but for corpus-scale signature
    * computation use [[minhashSignatures]], whose explode+aggregate
    * shape stays inside whole-stage codegen (~100x faster per row and
    * parallel regardless of input file layout). */
  def minhashSignature(textCol: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = TextOps.shingles(textCol, shingleN)
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(sh, s => xxhash64(s, j))))
  }

  /** Corpus-scale MinHash signatures: one row (id, __sig__) per input
    * row, via the native [[graft.functions.MinHashSig]] expression — a
    * single tight-loop pass per row inside whole-stage codegen, no
    * shuffle. Repartitions first so heavy per-row compute doesn't
    * inherit a single-file scan's 1-task layout. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("__id__"), col(textCol).as("__t__"))
      .repartition(par)
      .select(col("__id__"),
        graft.functions.exprs.minhash_sig(
          TextOps.shingles(col("__t__"), shingleN), numHashes).as("__sig__"))
  }

  /** The explode + N-aggregates formulation of [[minhashSignatures]] —
    * kept as the pure-built-in alternative (SURVEY §7.3 preference
    * (a)): `numHashes` codegen'd min(xxhash64(shingle, j)) aggregates
    * with map-side partials. Same scale shape, but hashes every shingle
    * `numHashes` times and pays a shuffle; the native expression is
    * ~an order of magnitude cheaper. */
  def minhashSignaturesAgg(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("__id__"), col(textCol).as("__t__"))
      .repartition(par)
      .select(col("__id__"), explode(TextOps.shingles(col("__t__"), shingleN)).as("__sh__"))
      .groupBy("__id__")
      .agg(array((0 until numHashes).map(j => min(xxhash64(col("__sh__"), lit(j)))): _*).as("__sig__"))
  }

  /** Candidate near-dup pairs via LSH banding of the MinHash signature.
    *
    * Buckets carry only (id, signature); candidates are screened by
    * MinHash signature agreement (an unbiased Jaccard estimator), and —
    * when `exactVerify` — the shingle sets are joined back for the
    * surviving candidates only and exact Jaccard is computed. Returns
    * (id1, id2, jaccard) with jaccard >= threshold, id1 < id2.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 200,
      exactVerify: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)

    val pairs = LshBlocking.candidatePairs(sigs, bands, r, maxBucket)

    // signature agreement = estimated Jaccard; screen with a safety
    // margin before the (more expensive) exact verification
    val screened = pairs
      .withColumn("est_jaccard",
        size(filter(zip_with(col("p1"), col("p2"), (a, b) => a === b), x => x))
          / lit(numHashes))
      .filter(col("est_jaccard") >= threshold * 0.5)

    if (!exactVerify)
      screened.filter(col("est_jaccard") >= threshold)
        .select(col("id1"), col("id2"), col("est_jaccard").as("jaccard"))
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      val shingleSets = df.select(
        col(idCol).as("__sid__"), col(textCol).as("__t__"))
        .repartition(par)
        .select(col("__sid__"),
          array_distinct(TextOps.shingles(col("__t__"), shingleN)).as("__sh__"))
      screened
        .join(shingleSets.withColumnRenamed("__sid__", "id1").withColumnRenamed("__sh__", "sh1"),
          Seq("id1"))
        .join(shingleSets.withColumnRenamed("__sid__", "id2").withColumnRenamed("__sh__", "sh2"),
          Seq("id2"))
        .withColumn("jaccard",
          size(array_intersect(col("sh1"), col("sh2"))) /
            size(array_union(col("sh1"), col("sh2"))))
        .filter(col("jaccard") >= threshold)
        .select(col("id1"), col("id2"), col("jaccard"))
    }
  }

  /** Greedy near-dup removal: drops every row that appears as the larger
    * id of a qualifying pair (keep-smallest; connected components are
    * approximated greedily — documented trade for a single anti-join). */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val losers = minhashNearDups(df, idCol, textCol, shingleN, numHashes, bands, threshold)
      .select(col("id2").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash signature as array<int> of `bits` sign bits. Bit i uses an
    * independent per-bit token hash (xxhash64(token, i)) — equivalent
    * strength to slicing one 64-bit hash, and the bit-array form avoids
    * variable shifts and slices directly into bands. */
  def simhashSignature(textCol: Column, bits: Int = 64): Column = {
    val toks = TextOps.tokens(TextOps.normalized(textCol))
    transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(toks, lit(0L),
        (acc, t) => acc + when(pmod(xxhash64(t, i), lit(2)) === 1, lit(1L)).otherwise(lit(-1L))) >= 0,
        lit(1)).otherwise(lit(0)))
  }

  /** Corpus-scale SimHash signatures (same explode+aggregate shape as
    * [[minhashSignatures]]: codegen'd sums, map-side partials, explicit
    * repartition for parallelism). */
  def simhashSignatures(
      df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("__id__"), col(textCol).as("__t__"))
      .repartition(par)
      .select(col("__id__"),
        explode(TextOps.tokens(TextOps.normalized(col("__t__")))).as("__tok__"))
      .groupBy("__id__")
      .agg(array((0 until bits).map { i =>
        when(sum(when(pmod(xxhash64(col("__tok__"), lit(i)), lit(2)) === 1, lit(1L))
          .otherwise(lit(-1L))) >= 0, lit(1)).otherwise(lit(0))
      }: _*).as("__sig__"))
  }

  /** Near-dup pairs by SimHash: band-exact blocking then Hamming
    * distance <= maxHamming on candidates. */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, bands: Int = 8, maxHamming: Int = 3,
      maxBucket: Int = 200): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val sigs = simhashSignatures(df, idCol, textCol, bits)

    LshBlocking.candidatePairs(sigs, bands, r, maxBucket)
      .withColumn("hamming",
        aggregate(zip_with(col("p1"), col("p2"), (a, b) => abs(a - b)), lit(0),
          (acc, x) => acc + x))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** n-gram Jaccard similarity of two text columns (character n-grams).
    * For all-pairs use, route through [[minhashNearDups]] with char
    * shingles — this is the exact verifier. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(TextOps.charShingles(a, n))
    val sb = array_distinct(TextOps.charShingles(b, n))
    size(array_intersect(sa, sb)) / size(array_union(sa, sb))
  }

  /** Embedding-cosine near-duplicate pairs (delegates to sign-LSH). */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95): DataFrame =
    VectorOps.lshNeighbors(df, idCol, vecCol, threshold = threshold)
}
