package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 verdict's one perf-weak item, pinned: the greedy chunk scan
  * must be LINEAR in document length. The r13 gate shipped an
  * `aggregate` fold whose per-word array-append accumulator did
  * O(words²) element copies per document — invisible at gate scale
  * (10²-10³-word docs), a task-killing straggler on one multi-MB crawl
  * document (~10⁶ words → ~10¹² copies). The scan is now one native
  * O(words) pass ([[graft.functions.GreedyChunkStarts]]); this spec
  * holds the hostile long-doc case: correctness at 100k words, and
  * wall-time scaling ~linearly (not quadratically) from 10k → 100k.
  */
class ChunkFoldScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chunk-fold-scale")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def longDoc(words: Int): String =
    (0 until words).map(i => s"w$i").mkString(" ")

  test("100k-word document: greedy chunking is correct at hostile length") {
    val words = 100000
    val max = 24
    val df = Seq((1L, longDoc(words))).toDF("id", "text")
    val chunks = TextOps.chunkDocumentsByCost(df, "id", "text", max, _ => lit(1))
      .orderBy("chunk_id").collect()
    // cost 1 per word -> every chunk holds exactly `max` words except a
    // final remainder
    assert(chunks.length == (words + max - 1) / max)
    chunks.dropRight(1).foreach(r => assert(r.getAs[Int]("n_chunk_tokens") == max))
    assert(chunks.last.getAs[Int]("n_chunk_tokens") == words % max)
    assert(chunks.map(_.getAs[Int]("n_chunk_tokens")).sum == words)
    // boundaries are exact: chunk k starts at word k*max (0-based)
    assert(chunks(7).getAs[String]("chunk_text").startsWith(s"w${7 * max} "))
    // the rebuilt text round-trips
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString(" ") == longDoc(words))
  }

  test("wall-time stays ~linear from 10k to 100k words (the quadratic fold's regression pin)") {
    val max = 24
    def timeOf(words: Int): Double = {
      val df = Seq((1L, longDoc(words))).toDF("id", "text")
        .localCheckpoint(true) // isolate chunking cost from doc synthesis
      def once(): Double = {
        val t0 = System.nanoTime()
        TextOps.chunkDocumentsByCost(df, "id", "text", max, _ => lit(1)).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (codegen)
      math.min(once(), once())
    }
    val t10k = timeOf(10000)
    val t100k = timeOf(100000)
    // linear -> ~10x; the r13 quadratic accumulator -> ~100x. The bound
    // is generous (35x) so CI noise can't flake it while a quadratic
    // regression still trips it decisively.
    assert(t100k < 35 * math.max(t10k, 0.05),
      f"chunking 100k words took $t100k%.2fs vs $t10k%.2fs for 10k — superlinear")
  }

  test("greedy_chunk_starts: edge semantics (empty, oversized word, zero costs, null cost)") {
    def starts(costs: Seq[Integer], max: Int): Seq[Int] = {
      val df = Seq(Tuple1(costs)).toDF("c")
      df.select(graft.functions.chunkExprs.greedy_chunk_starts(
        col("c").cast("array<int>"), max).as("s"))
        .head().getSeq[Int](0)
    }
    def ints(xs: Int*): Seq[Integer] = xs.map(Int.box)
    assert(starts(ints(), 5) == Seq.empty)                 // empty -> empty
    assert(starts(ints(2, 2, 2), 6) == Seq(1))             // all fit
    assert(starts(ints(2, 2, 2, 2), 6) == Seq(1, 4))       // overflow at word 4
    assert(starts(ints(9, 1), 5) == Seq(1, 2))             // oversized word alone
    assert(starts(ints(1, 9, 1), 5) == Seq(1, 2, 3))       // oversized mid-doc alone
    assert(starts(ints(0, 0, 9, 9), 5) == Seq(1, 4))       // zero-cost prefix joins
    val e = intercept[Exception] {
      starts(Seq(Int.box(1), null, Int.box(1)), 5)
    }
    assert(e.getMessage != null)
  }
}
