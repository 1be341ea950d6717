package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketing.
  *
  * A shuffle join moves BOTH sides across the network every time it
  * runs. When a large table is joined on the same key repeatedly (the
  * fact-table pattern), pre-bucketing amortizes that shuffle to zero:
  * `bucketBy(n, key)` hash-partitions the files ON DISK into n buckets,
  * and Spark's scan reports that layout as `HashPartitioning(key, n)`,
  * so a join between two tables bucketed the same way needs NO exchange
  * on either side — the plan goes scan → (optional in-bucket sort) →
  * sort-merge join, shuffle-free forever after.
  *
  * Bucket metadata lives in the session catalog (bucketed layout is not
  * expressible in bare parquet paths), so bucketed tables are written
  * with `saveAsTable` and read back with `spark.table`. At 100 TB:
  * bucket the fact tables by their dominant join key with enough
  * buckets that one bucket fits an executor's memory; `sortBy` the same
  * key so the merge phase skips its sort too.
  */
object Bucketing {

  /** Write `df` into the session catalog as parquet bucketed (and
    * in-bucket sorted) by `keys` into `numBuckets` files per partition.
    * `path = Some(dir)` makes it an EXTERNAL table at that location
    * (catalog metadata only in the session, files wherever the caller
    * owns storage); None uses the session warehouse. */
  def writeBucketed(
      df: DataFrame, table: String,
      keys: Seq[String], numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Read a bucketed table back with its bucket layout. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Join two same-bucketed catalog tables on their bucket keys —
    * planned with zero shuffle exchanges (see class doc). */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    table(spark, leftTable).join(table(spark, rightTable), keys)
}
