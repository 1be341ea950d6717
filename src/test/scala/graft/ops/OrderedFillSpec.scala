package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed two-pass global fill must equal the sequential
  * reference semantics (walk rows in order, carry the last non-falsy
  * value per column, fill falsy cells) — including across bucket
  * boundaries, under Groovy falsiness (empty/blank strings and
  * numeric zeros fill too), and with null-order rows inert. */
class OrderedFillSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ordered-fill")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def seqFill(
      rows: Seq[(Long, Option[String], Int)]): Map[Long, (Option[String], Int)] = {
    var carryS: Option[String] = None
    var carryN: Option[Int] = None
    rows.sortBy(_._1).map { case (ord, s, n) =>
      val sFalsy = s.isEmpty || s.exists(_.trim.isEmpty)
      val nFalsy = n == 0
      val sOut = if (sFalsy) carryS.orElse(s) else s
      val nOut = if (nFalsy) carryN.getOrElse(n) else n
      if (!sFalsy) carryS = s
      if (!nFalsy) carryN = Some(n)
      ord -> (sOut, nOut)
    }.toMap
  }

  test("matches the sequential fill across bucket boundaries (strings, blanks, zeros)") {
    val rnd = new scala.util.Random(42L)
    val rows: Seq[(Long, Option[String], Int)] = (0L until 300L).map { i =>
      val s = rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some("")
        case 2 => Some("  ")
        case _ => Some(s"v$i")
      }
      val n = if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(1000) + 1
      (i, s, n)
    }
    val df = rows.toDF("ord", "s", "n")
    val expected = seqFill(rows)
    // buckets=7 forces several carry hand-offs on 300 rows
    val got = OrderedFill.fillDown(df, "ord", Seq("s", "n"), buckets = 7)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getInt(2))).toMap
    assert(got.size == 300)
    rows.foreach { case (ord, s0, _) =>
      val (es, en) = expected(ord)
      val (gs, gn) = got(ord)
      // a falsy cell with NO donor yet keeps its original (possibly
      // blank) value — both models agree by construction
      assert(gs == es, s"ord=$ord s: got $gs expected $es (orig $s0)")
      assert(gn == en, s"ord=$ord n: got $gn expected $en")
    }
  }

  test("null-order rows pass through unchanged and never donate") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("GHOST")),
      (Some(3L), None)).toDF("ord", "s")
    val got = OrderedFill.fillDown(df, "ord", Seq("s"), buckets = 2)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1)))
    assert(got.contains((None, "GHOST"))) // unchanged
    assert(got.filter(_._1.isDefined).sortBy(_._1.get).map(_._2).toSeq ==
      Seq("a", "a", "a")) // GHOST never donated
  }

  test("loud contracts: non-atomic fill column, non-orderable order column") {
    val df = Seq((1L, Seq("x"), "s")).toDF("ord", "arr", "name")
    intercept[IllegalArgumentException] {
      OrderedFill.fillDown(df, "ord", Seq("arr"))
    }
    intercept[IllegalArgumentException] {
      OrderedFill.fillDown(df, "name", Seq("name"))
    }
  }

  test("empty frame: empty out, schema intact") {
    val df = Seq.empty[(Long, Option[String])].toDF("ord", "s")
    val out = OrderedFill.fillDown(df, "ord", Seq("s"))
    assert(out.schema.fieldNames.toSeq == Seq("ord", "s"))
    assert(out.count() == 0)
  }

  test("plan: the fill windows partition on the bucket id — no global single-partition window") {
    val df = (0L until 100L).map(i => (i, if (i % 3 == 0) None else Some(s"v$i")))
      .toDF("ord", "s")
    val plan = OrderedFill.fillDown(df, "ord", Seq("s"), buckets = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__ofd_b__"),
      s"window must partition on the bucket id:\n$plan")
  }
}
