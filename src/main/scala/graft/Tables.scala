package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Older generations of the testdata wrote events.ts as
    // TIMESTAMP(NANOS), which Spark's parquet reader refuses by default;
    // this conf makes such columns read as nanos-since-epoch longs (it is
    // a no-op for the current timestamp[us] data). Consumers should go
    // through [[eventTime]] rather than assuming either physical type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Event-time column of `df` as a session-zoned TIMESTAMP, whatever the
    * physical type the data generation wrote: nanos-since-epoch long
    * (TIMESTAMP(NANOS) under nanosAsLong), native TIMESTAMP_NTZ
    * (timestamp[us] without UTC adjustment — the current testdata), or an
    * already-zoned TIMESTAMP. The gate sessions run with
    * spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is the identity
    * mapping and downstream NTZ casts for the DuckDB oracle are exact.
    *
    * `div`, NOT `/`, for the nanos path: the values are ~1.7e18, beyond
    * double's 53-bit mantissa — float division would corrupt microseconds.
    */
  def eventTime(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType         => timestamp_micros(expr(s"`$c` div 1000"))
      case TimestampNTZType => col(c).cast(TimestampType)
      case TimestampType    => col(c)
      case other => throw new IllegalArgumentException(
        s"eventTime: column '$c' has unsupported type $other " +
          "(expected nanos LONG, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
}
