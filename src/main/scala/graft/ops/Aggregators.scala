package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder}

/** Typed `Aggregator` extension point (the engine's answer to the
  * reference's fold-shaped UDAF surface, SURVEY §2.12) plus operators
  * built on it.
  */
object Aggregators {

  case class Ranked(ord: Double, id: Long)

  /** Bounded top-k aggregator: keeps at most k (ord DESC, id ASC)
    * entries in the buffer at all times.
    *
    * Scale story: top-k-per-group via `row_number` windows sorts every
    * row of every group; this aggregator's partial buffers are bounded
    * at k entries, combine map-side, and never sort the full group —
    * the right shape when groups are huge and k is small.
    */
  class TopK(k: Int) extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {
    private def best(xs: Seq[Ranked]): Seq[Ranked] =
      xs.sortBy(e => (-e.ord, e.id)).take(k)
    override def zero: Seq[Ranked] = Seq.empty
    override def reduce(b: Seq[Ranked], a: Ranked): Seq[Ranked] = best(b :+ a)
    override def merge(b1: Seq[Ranked], b2: Seq[Ranked]): Seq[Ranked] = best(b1 ++ b2)
    override def finish(r: Seq[Ranked]): Seq[Ranked] = best(r)
    override def bufferEncoder: Encoder[Seq[Ranked]] = ExpressionEncoder[Seq[Ranked]]()
    override def outputEncoder: Encoder[Seq[Ranked]] = ExpressionEncoder[Seq[Ranked]]()
  }

  /** Column function: top-k of (ord, id) pairs, as an array of structs.
    * (A Product input encoder binds each case-class field to its own
    * argument column.) */
  def top_k(ord: Column, id: Column, k: Int): Column =
    udaf(new TopK(k)).apply(ord.cast("double"), id.cast("long"))

  /** Top-k rows per group without a full window sort: returns
    * (groupCols..., ord, id) with at most k rows per group, ordered
    * (ord DESC, id ASC) within each group. */
  def groupTopK(
      df: DataFrame, groupCols: Seq[String],
      ordCol: String, idCol: String, k: Int): DataFrame = {
    // the buffers carry idCol as LONG (top_k's cast) — guard at the
    // casting site so EVERY caller fails at plan-build time instead of
    // reading silent NULLs / late ANSI cast errors
    ColumnChecks.requireIntegral(df, idCol, "groupTopK",
      "Map the id to a surrogate long first (e.g. xxhash64), or join payloads back " +
        "by the returned key after sampling on an integral column.")
    df.groupBy(groupCols.map(col): _*)
      .agg(top_k(col(ordCol), col(idCol), k).as("__topk__"))
      .select(groupCols.map(col) :+ explode(col("__topk__")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.ord").as(ordCol) :+ col("e.id").as(idCol): _*)
  }
}
