package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager

/** End-to-end JdbcSource spec against an embedded Derby database (on
  * the Spark classpath for the Hive metastore, so available in every
  * Spark deployment). The in-memory DB lives in this JVM and local-mode
  * executors share it — the read truly executes, result-set metadata
  * becomes the schema, and the reference's query semantics
  * (`JdbcSource.groovy:22-66`) are exercised rather than just
  * plan-constructed. */
class JdbcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jdbc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  override def beforeAll(): Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT, name VARCHAR(32), age INT)")
    st.execute("INSERT INTO people VALUES (1,'Bob',30),(2,'Sue',25),(3,'Ann',41),(4,'Cid',25)")
    st.close(); conn.close()
  }

  test("jdbc source runs a query and returns typed rows") {
    val df = Sources.jdbc(spark, url,
      "SELECT id, name, age FROM people WHERE age >= 25",
      options = Map("driver" -> driver)).toDF
    assert(df.count() == 4)
    assert(df.schema("ID").dataType.typeName == "integer") // Derby uppercases identifiers
    assert(df.where(col("NAME") === "Sue").head().getInt(2) == 25)
  }

  test("jdbc query results compose with pipeline verbs") {
    val stat = Sources.jdbc(spark, url,
      "SELECT id, name, age FROM people",
      options = Map("driver" -> driver))
      .filter("adults-only", col("AGE") > 25)
      .go()
    assert(stat.loaded == 2) // Bob 30, Ann 41
    assert(stat.rejections == 2)
  }
}
