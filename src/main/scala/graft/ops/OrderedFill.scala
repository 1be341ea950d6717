package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** GLOBALLY-ordered fill-down (the reference's sequential
  * `fillDownBy` semantics over one total order) without the
  * single-partition global window that makes the naive formulation a
  * scale killer: a window with no partition key collapses the whole
  * corpus into ONE task.
  *
  * Shape (the textbook scalable prefix scan):
  *  1. bucket rows by `orderCol` range — split points from a
  *     deterministic quantile sketch (`approxQuantile`, no RNG), so
  *     the bucket id is a PURE FUNCTION of the order value and both
  *     passes agree without persisting anything;
  *  2. within-bucket fill is a per-bucket window (parallel across
  *     buckets, quantile-balanced);
  *  3. cross-bucket carry: one P-row aggregate (`max_by` per bucket —
  *     order-insensitive, so shuffles cannot corrupt it) collected to
  *     the driver, prefix-scanned, and re-broadcast as a literal
  *     bucket→value decode per column.
  * Two scans of the input, one tiny driver pull, no global sort
  * bottleneck — the plan a 100 TB ordered fill needs.
  *
  * Contract: `orderCol` must be numeric/date/timestamp (castable to
  * double for the sketch) and SHOULD be unique — ties make the
  * sequential semantics themselves ambiguous (`__tie__` breaks them
  * deterministically but arbitrarily). Rows with a NULL order value
  * pass through unchanged and never donate. Fill columns must be
  * atomic-typed. Cells are "empty" under Groovy truthiness
  * ([[OrderedFill.falsy]] — the same test the Pipeline verbs use).
  */
object OrderedFill {

  /** Groovy-falsy test (null; empty/blank string; numeric zero;
    * boolean false; empty array/map) — shared with the Pipeline
    * verbs (`defaultValues`/`defaultsBy`/`fillDown`). */
  def falsy(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case StringType     => col(c).isNull || trim(col(c)) === ""
      case _: NumericType => col(c).isNull || col(c) === 0
      case BooleanType    => col(c).isNull || !col(c)
      case _: ArrayType   => col(c).isNull || size(col(c)) === 0
      case _: MapType     => col(c).isNull || size(col(c)) === 0
      case _              => col(c).isNull
    }

  def fillDown(
      df: DataFrame, orderCol: String, columns: Seq[String],
      buckets: Int = 0): DataFrame = {
    require(columns.nonEmpty, "fillDownOrdered: no columns to fill")
    columns.foreach { c =>
      val dt = df.schema(c).dataType
      val atomic = dt match {
        case _: NumericType => true
        case StringType | BooleanType | DateType | TimestampType |
          TimestampNTZType | BinaryType => true
        case _ => false
      }
      require(atomic,
        s"fillDownOrdered: column $c is ${dt.simpleString}; the cross-bucket " +
          "carry re-broadcasts values as literals — atomic types only")
    }
    val ordType = df.schema(orderCol).dataType
    require(ordType.isInstanceOf[NumericType] || ordType == DateType ||
      ordType == TimestampType || ordType == TimestampNTZType,
      s"fillDownOrdered: order column $orderCol is ${ordType.simpleString}; " +
        "a numeric/date/timestamp total order is required for range bucketing")

    // bucket-count cap: the per-row bucket assignment scans the split
    // array (O(P) per row) and the carry decode is a P-arm when-chain
    // per column — both are priced per bucket, while pass-2's window
    // parallelism saturates long before P=256 on any real cluster.
    // An uncapped defaultParallelism (tens of thousands on a big
    // cluster) would move the cost from the shuffle to every row.
    val p = math.min(256, if (buckets > 0) buckets
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism))
    val withOrd = df.withColumn("__ofd_ord__", col(orderCol).cast(DoubleType))
    val splits =
      if (p <= 1) Array.empty[Double]
      else withOrd.stat.approxQuantile(
        "__ofd_ord__", (1 until p).map(_.toDouble / p).toArray, 0.001)
        .distinct.sorted
    val splitsLit = typedLit(splits.toSeq)
    // deterministic bucket id: how many split points lie at/below the
    // order value — a pure function, identical in both passes
    val bucketOf = size(filter(splitsLit, s => s <= col("__ofd_ord__")))
    val bucketed = withOrd.withColumn("__ofd_b__",
      when(col("__ofd_ord__").isNotNull, bucketOf))

    def donorCond(c: String): Column =
      !falsy(df, c) && col("__ofd_ord__").isNotNull

    // pass 1: last donor value per bucket per column. max_by ignores
    // null ordering keys, so falsy cells and null-order rows never
    // donate; the aggregate is order-insensitive by construction.
    val aggCols = columns.map(c =>
      max_by(col(c), when(donorCond(c), col("__ofd_ord__"))).as(c))
    val lastRows = bucketed.filter(col("__ofd_b__").isNotNull)
      .groupBy("__ofd_b__")
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .sortBy(_.getInt(0))

    // driver prefix scan: carry(b) = last donor value in any bucket < b
    val carryByCol: Map[String, Seq[(Int, Any)]] = columns.map { c =>
      val idx = 1 + columns.indexOf(c)
      var carry: Any = null
      val pairs = Seq.newBuilder[(Int, Any)]
      lastRows.foreach { r =>
        val b = r.getInt(0)
        if (carry != null) pairs += ((b, carry))
        if (!r.isNullAt(idx)) carry = r.get(idx)
      }
      c -> pairs.result()
    }.toMap

    def carryExpr(c: String): Column = {
      val pairs = carryByCol(c)
      if (pairs.isEmpty) lit(null).cast(df.schema(c).dataType)
      else pairs.foldLeft(when(lit(false), lit(null))) { case (acc, (b, v)) =>
        acc.when(col("__ofd_b__") === b, lit(v))
      }.otherwise(lit(null)).cast(df.schema(c).dataType)
    }

    // pass 2: per-bucket windowed fill + carry fallback. The window
    // partitions on the bucket id — parallel across buckets; ties on
    // the order value are broken deterministically by a stable row
    // digest so reruns agree.
    val tie = xxhash64(columns.map(col): _*)
    val w = Window.partitionBy("__ofd_b__")
      .orderBy(col("__ofd_ord__"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = df.columns.map { c =>
      if (!columns.contains(c)) col(c)
      else {
        val filler = coalesce(
          last(when(donorCond(c), col(c)), ignoreNulls = true).over(w),
          carryExpr(c))
        when(falsy(df, c) && col("__ofd_ord__").isNotNull && filler.isNotNull,
          filler).otherwise(col(c)).as(c)
      }
    }
    bucketed.select(outCols.toIndexedSeq: _*)
  }
}
