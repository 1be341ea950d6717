package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.removeDuplicatedSpans]] — ExactSubstr-style duplicated-span
  * removal. Hand-computed fixtures pin keeper election, span merging,
  * intra-doc repeats, and the touched/untouched text contract; a
  * brute-force reference implementation pins the whole semantics on a
  * randomized corpus. */
class SpanDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-span-dedup-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int) =
    Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("duplicated k-gram is removed everywhere except the smallest (id, pos)") {
    val out = run(Seq(
      0L -> "a b c d e",
      1L -> "x y a b c z"), k = 3)
    // keeper of gram "a b c" is (0, 0): doc 0 untouched, doc 1 loses tokens 2..4
    assert(out(0L) == ("a b c d e", 0L))
    assert(out(1L) == ("x y z", 3L))
  }

  test("overlapping duplicated grams merge into one span") {
    val out = run(Seq(
      0L -> "a b c d e",
      2L -> "p q a b c d e r"), k = 3)
    // doc 2 shares grams at starts 2,3,4 -> spans [2,4],[3,5],[4,6] -> [2,6]
    assert(out(0L) == ("a b c d e", 0L))
    assert(out(2L) == ("p q r", 5L))
  }

  test("an intra-document repeat is a duplicate: second occurrence removed") {
    val out = run(Seq(7L -> "m n o w m n o"), k = 3)
    assert(out(7L) == ("m n o w", 3L))
  }

  test("gram identity is case-insensitive; output keeps original case") {
    val out = run(Seq(
      0L -> "a b c d",
      1L -> "HEAD A B C TAIL"), k = 3)
    // "A B C" == "a b c" for election; doc 1 rebuilt from original-case tokens
    assert(out(0L) == ("a b c d", 0L))
    assert(out(1L) == ("HEAD TAIL", 3L))
  }

  test("untouched documents keep their text verbatim, including whitespace") {
    val weird = "  lone\tdocument \n nothing  shared  "
    val out = run(Seq(
      0L -> "a b c d", 1L -> weird, 2L -> "under k"), k = 3)
    assert(out(1L) == (weird, 0L))
    assert(out(2L) == ("under k", 0L)) // < k tokens: no gram, never touched
  }

  test("a null-text document survives untouched (no spurious bound error)") {
    val out = Dedup.removeDuplicatedSpans(
      Seq((0L, "a b c d"), (1L, "x a b c y"), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(out(2L) == (None, 0L))
    assert(out(1L) == (Some("x y"), 3L)) // the real dedup still happened
  }

  test("a fully duplicated document empties to zero tokens") {
    val out = run(Seq(0L -> "a b c d", 1L -> "a b c d"), k = 3)
    assert(out(0L) == ("a b c d", 0L))
    assert(out(1L) == ("", 4L))
  }

  test("matches a brute-force reference on a randomized corpus") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "gold", "gray")
    val k = 3
    val docs = (0L until 40L).map { id =>
      val n = 3 + rnd.nextInt(12)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

    // reference: global gram occurrence census, keeper = min (id, pos),
    // covered positions removed, tokens rejoined
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq; p <- 0 to tk.length - k
    } yield (tk.slice(p, p + k).map(_.toLowerCase).mkString(" "), id, p)
    val byGram = occ.groupBy(_._1).filter(_._2.size > 1)
    val removed = byGram.values.flatten
      .filterNot { case (g, id, p) =>
        val (_, kid, kp) = byGram(g).minBy { case (_, i, q) => (i, q) }
        id == kid && p == kp
      }.toSeq
    val expected = docs.map { case (id, t) =>
      val tk = toks(id)
      val cover = removed.collect {
        case (_, i, p) if i == id => p until (p + k)
      }.flatten.toSet
      if (removed.exists(_._2 == id)) {
        val keptTk = tk.zipWithIndex.collect { case (w, i) if !cover(i) => w }
        id -> (keptTk.mkString(" "), (tk.length - keptTk.length).toLong)
      } else id -> (t, 0L)
    }.toMap

    assert(run(docs, k) == expected)
  }

  test("non-integral id and over-budget documents fail loudly") {
    val strId = Seq(("a", "x y z")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.removeDuplicatedSpans(strId, "doc_id", "text", 3)
    }
    assert(e1.getMessage.contains("removeDuplicatedSpans"))

    val big = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      Dedup.removeDuplicatedSpans(big, "doc_id", "text", k = 3, posEncode = 4L)
        .collect()
    }
    assert(e2.getMessage.contains("raise posEncode")
      || e2.getCause != null && e2.getCause.getMessage.contains("raise posEncode"))

    // an id outside ±Long.MaxValue/posEncode would overflow the
    // (id,pos) encoding and silently elect wrong keepers — enforced
    // loudly like the gram bound (r7 advice)
    val hugeId = Seq((Long.MaxValue, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val e3 = intercept[Exception] {
      Dedup.removeDuplicatedSpans(hugeId, "doc_id", "text", k = 3).collect()
    }
    assert(e3.getMessage.contains("overflows the (id,pos)")
      || e3.getCause != null && e3.getCause.getMessage.contains("overflows the (id,pos)"))

    // in-bound ids (including negative) still work
    val ok = Seq((-5L, "p q r s"), (6L, "p q r s")).toDF("doc_id", "text")
    assert(Dedup.removeDuplicatedSpans(ok, "doc_id", "text", k = 3).count() == 2)
  }
}
