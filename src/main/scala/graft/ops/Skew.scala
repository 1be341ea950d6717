package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hash-partitioned join sends every row of a hot key to one reducer;
  * at corpus scale a single key holding 1% of 100 TB stalls the stage
  * on one task (or OOMs it). Salting splits each hot key's rows across
  * `factor` reducers: the skewed side gets a per-row salt in
  * [0, factor), the other side is replicated once per salt value, and
  * the equi-join runs on (keys :+ salt) — same result set, `factor`-way
  * parallel on every key, at the cost of replicating the small side
  * `factor` times.
  *
  * Complements AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in graft
  * sessions): AQE only splits sort-merge join partitions after
  * materializing map output, and cannot help aggregations or joins that
  * AQE planned away from sort-merge. Salting is declarative and works
  * on any equi-join the planner produces.
  */
object Skew {

  /** Inner equi-join on `keys` with the LEFT side treated as skewed.
    * `factor` = number of ways each hot key is split; size it near the
    * cluster's task slots over the number of genuinely hot keys.
    *
    * The salt must vary WITHIN a join key (that is the whole point), so
    * it cannot be derived from the key columns: `rand(seed)` is used,
    * which Spark evaluates deterministically per partition on task
    * retry. Result equals `left.join(right, keys)` exactly; row order
    * within partitions differs. */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], factor: Int, seed: Long = 42L): DataFrame = {
    require(factor > 0, "factor must be positive")
    require(!left.columns.contains("__salt__") && !right.columns.contains("__salt__"),
      "saltedJoin reserves the column name __salt__; rename it on the input first")
    val salted = left.withColumn("__salt__",
      floor(rand(seed) * factor).cast("int"))
    val replicated = right.withColumn("__salt__",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt__").drop("__salt__")
  }
}
