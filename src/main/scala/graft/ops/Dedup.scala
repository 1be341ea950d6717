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

  /** MinHash signature (array<long> of `numHashes` minima over shingle
    * hashes). Seeded by hash index — deterministic everywhere. */
  def minhashSignature(textCol: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = TextOps.shingles(textCol, shingleN)
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(sh, s => xxhash64(s, j))))
  }

  /** Candidate near-dup pairs via LSH banding of the MinHash signature,
    * then exact Jaccard over shingle sets on candidates only. Returns
    * (id1, id2, jaccard) with jaccard >= threshold, id1 < id2. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    val sigs = df.select(
      col(idCol).as("__id__"),
      TextOps.shingles(col(textCol), shingleN).as("__sh__"),
      minhashSignature(col(textCol), shingleN, numHashes).as("__sig__"))

    val banded = sigs.select(
      col("__id__"), col("__sh__"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("__sig__"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("__id__"), col("__sh__"), col("bb.band"), col("bb.bucket"))

    val buckets = banded
      .groupBy("band", "bucket")
      .agg(slice(sort_array(collect_list(struct(col("__id__"), col("__sh__")))), 1, maxBucket)
        .as("members"))
      .filter(size(col("members")) > 1)

    val pairs = buckets
      .select(explode(flatten(
        transform(col("members"), (x, i) =>
          transform(slice(col("members"), i + 2, size(col("members"))),
            y => struct(
              x.getField("__id__").as("id1"), y.getField("__id__").as("id2"),
              x.getField("__sh__").as("sh1"), y.getField("__sh__").as("sh2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.sh1"), col("p.sh2"))
      .dropDuplicates("id1", "id2")

    pairs
      .withColumn("jaccard",
        size(array_intersect(array_distinct(col("sh1")), array_distinct(col("sh2")))) /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
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

  /** Near-dup pairs by SimHash: band-exact blocking then Hamming
    * distance <= maxHamming on candidates. */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, bands: Int = 8, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val sigs = df.select(
      col(idCol).as("__id__"),
      simhashSignature(col(textCol), bits).as("__sig__"))

    val banded = sigs.select(
      col("__id__"), col("__sig__"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("__sig__"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("__id__"), col("__sig__"), col("bb.band"), col("bb.bucket"))

    val buckets = banded
      .groupBy("band", "bucket")
      .agg(slice(sort_array(collect_list(struct(col("__id__"), col("__sig__")))), 1, maxBucket)
        .as("members"))
      .filter(size(col("members")) > 1)

    buckets
      .select(explode(flatten(
        transform(col("members"), (x, i) =>
          transform(slice(col("members"), i + 2, size(col("members"))),
            y => struct(
              x.getField("__id__").as("id1"), y.getField("__id__").as("id2"),
              x.getField("__sig__").as("s1"), y.getField("__sig__").as("s2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.s1"), col("p.s2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming",
        aggregate(zip_with(col("s1"), col("s2"), (a, b) => abs(a - b)), lit(0),
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
