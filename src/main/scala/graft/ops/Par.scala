package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-count pinning for WORK-heavy exchanges (optimization
  * guide §2.5): AQE's coalescing sizes post-shuffle partitions by
  * shuffle BYTES, which is right for byte-bound stages but serializes
  * stages whose per-row cost dwarfs its bytes — a banded pair join's
  * output is quadratic in rows per bucket, and a signature projection
  * runs ~10⁴-10⁵ hash ops per row. Exchanges introduced with an
  * EXPLICIT partition count (`repartition(n, cols)`) are exempt from
  * AQE coalescing, so the heavy operator keeps cluster-wide
  * parallelism while every byte-bound exchange in the plan stays
  * AQE-managed.
  *
  * The count is the session's `spark.sql.shuffle.partitions` — the
  * knob cluster operators already size to their parallelism (the
  * bench driver sets it to the core count, so low-core contract runs
  * scale down automatically). Not a fixed constant: scale-adaptive by
  * configuration, local-mode correct by default.
  */
object Par {
  /** Explicit partition count for work-pinned exchanges. */
  def pinned(df: DataFrame): Int = {
    val ss = df.sparkSession
    try ss.conf.get("spark.sql.shuffle.partitions").toInt
    catch { case _: Exception => ss.sparkContext.defaultParallelism }
  }
}
