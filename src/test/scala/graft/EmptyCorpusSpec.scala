package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every gate query over an EMPTY corpus: the first fully-filtering
  * upstream step (an over-aggressive quality gate, a total dedup, an
  * empty partition of a date-partitioned crawl) hands every downstream
  * operator zero rows — a shape the oracle corpus never exercises. A
  * query must either return a (usually empty) result or fail with its
  * DOCUMENTED loud contract error; an undocumented crash on empty
  * input is a bug.
  *
  * The tables are schema-faithful zero-row copies of sf0.001.
  */
class EmptyCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-empty-corpus")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.names.foreach { n =>
      val schema = Tables.load(spark, "/root/testdata/sf0.001", n).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    d
  }

  /** Queries whose contract REQUIRES non-empty input somewhere
    * (model training, quantile cutoffs) — they must fail LOUDLY with
    * this documented message fragment, not crash arbitrarily. */
  private val documentedLoudFails: Map[String, String] = Map(
    "q_lm_score" -> "no tokens",
    "q_nb_score" -> "both classes need documents")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name on an empty corpus") {
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
