package graft

import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Every gate query over an all-NULL-payload corpus: ids survive, every
  * other column is NULL — the shape of a failed extraction batch (the
  * crawler wrote keys, the parser wrote nothing). Distinct from
  * [[EmptyCorpusSpec]]'s zero rows: NULL payloads actually flow through
  * every expression, join, and aggregate. A query must return a result
  * (usually rows of NULLs, or nothing after its filters) or fail with a
  * DOCUMENTED loud contract error; anything else is a bug.
  */
class NullCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-null-corpus")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def isKey(name: String): Boolean =
    name.endsWith("key") || name.endsWith("_id") || name == "id"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    Tables.names.foreach { n =>
      val schema = Tables.load(spark, "/root/testdata/sf0.001", n).schema
      val rows = (0 until 6).map { i =>
        Row.fromSeq(schema.fields.toSeq.map { f =>
          if (isKey(f.name)) f.dataType match {
            case LongType    => i.toLong
            case IntegerType => i
            case _           => null
          } else null
        })
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    d
  }

  /** Model-training queries REQUIRE trainable content — NULL text has
    * none; they must fail with their documented contract errors. */
  private val documentedLoudFails: Map[String, String] = Map(
    "q_lm_score" -> "no tokens",
    "q_nb_score" -> "NULL label")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name on an all-null-payload corpus") {
      documentedLoudFails.get(name) match {
        case Some(fragment) =>
          val e = intercept[Exception] { fn(spark, dir).count() }
          assert(Option(e.getMessage).getOrElse("").contains(fragment),
            s"$name must fail with its documented contract error " +
              s"('$fragment'), got: ${e.getClass.getName}: ${e.getMessage}")
        case None =>
          val n = fn(spark, dir).count()
          assert(n >= 0)
      }
    }
  }
}
