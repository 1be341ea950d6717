package graft

import graft.etl.RejectionCategory
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md's derived acceptance rule: reproduce the reference test
  * suite's exact LoadStatistic golden counts on its canonical fixture
  * (titanic.csv, 418 rows — reference `PipelineTest.groovy:38,61-63,
  * 422-433`). The fixture is read from the read-only reference tree;
  * tests cancel (not fail) if it is absent. */
class TitanicParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-titanic-parity")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val path = "/root/reference/src/test/resources/titanic.csv"
  private def available: Boolean = new java.io.File(path).exists()

  test("CSV source parses all 418 rows incl. quoted names with commas") {
    assume(available)
    val df = Sources.csv(spark, path).toDF
    assert(df.count() == 418)
    // quoted, comma-embedded names survive the quote state machine
    assert(df.where(col("Name").contains(",")).count() > 400)
  }

  test("filter Sex=male reproduces the golden loaded/rejected split (266/152)") {
    assume(available)
    val stat = Sources.csv(spark, path).filter(Map("Sex" -> "male")).go()
    assert(stat.loaded == 266)
    assert(stat.rejections(RejectionCategory.IGNORE_ROW) == 152)
  }

  test("groupBy Sex x Pclass reproduces the golden cell counts") {
    assume(available)
    val cells = Sources.csv(spark, path).toDF
      .groupBy("Sex", "Pclass").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells == Map(
      ("male", "3") -> 146L, ("male", "2") -> 63L, ("male", "1") -> 57L,
      ("female", "3") -> 72L, ("female", "2") -> 30L, ("female", "1") -> 50L))
  }

  test("reduce over asDouble(Fare) matches the reference's fold-to-sum shape") {
    assume(available)
    // empties pass as null (reference asInt/asDouble null handling);
    // the sum ignores them — the reference's reduce test folds the same way
    val total = Sources.csv(spark, path)
      .asDouble("Fare")
      .reduceAgg(sum(col("Fare")).as("total"))
      .toDF.head().getDouble(0)
    assert(total > 0.0)
    val stat = Sources.csv(spark, path).asDouble("Fare").go()
    assert(stat.loaded == 418) // empty Fare -> null, never a rejection
  }
}
