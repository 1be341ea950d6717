package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeByteLevel

/** BYTE-level BPE (the GPT-2-family published-tokenizer convention):
  * the bytes→printable-chars table, the regex pre-tokenizer
  * (contractions, space-gluing, the lookahead whitespace arm), greedy
  * merges over byte chars, external-id encoding, and the LOSSLESS
  * decode — plus the loader's all-256-byte-chars validation. */
class BpeByteLevelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-bytelevel-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(7041L + i)).foreach(body)
    }

  private def writeTmp(name: String, text: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bl")
    val p = d.resolve(name)
    java.nio.file.Files.write(p, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }

  private val fixtureMerges = Seq(
    "t" -> "h", "th" -> "e", "a" -> "t", "Ġ" -> "c", "Ġc" -> "at",
    "Ġ" -> "t", "Ġt" -> "he", "h" -> "at")

  /** vocab = 256 byte chars (id = byte) + compounds in merge order +
    * the special token; TSV is escape-free for byte-level tokens. */
  private def fixtureModel(merges: Seq[(String, String)]) = {
    val mp = writeTmp("merges.txt",
      "#version: 0.2\n" + merges.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n")
    val vocab = (0 until 256).map(b => String.valueOf(BpeByteLevel.byteToChar(b))) ++
      merges.map { case (l, r) => l + r } ++ Seq("<|endoftext|>")
    val vp = writeTmp("vocab.tsv",
      vocab.zipWithIndex.map { case (t, i) => s"$t\t$i" }.mkString("\n"))
    Bpe.loadExternalByteLevel(spark, mp, vp)
  }

  test("bytes_to_unicode: golden values, bijection") {
    assert(BpeByteLevel.byteToChar(0x20) == 'Ġ') // space -> Ġ
    assert(BpeByteLevel.byteToChar(0x0A) == 'Ċ') // \n -> Ċ
    assert(BpeByteLevel.byteToChar('a'.toInt) == 'a')
    assert(BpeByteLevel.byteToChar(0) == 'Ā')
    assert(BpeByteLevel.byteToChar(0xC3) == 'Ã')
    assert(BpeByteLevel.byteToChar(0xA9) == '©')
    // 173 (soft hyphen) is the last excluded byte: 33 + 34 below it
    assert(BpeByteLevel.byteToChar(173) == (256 + 67).toChar)
    // bijection: 256 distinct chars, inverse table complete
    assert(BpeByteLevel.byteToChar.toSet.size == 256)
    (0 until 256).foreach(b =>
      assert(BpeByteLevel.charToByte.get(BpeByteLevel.byteToChar(b)) == b))
  }

  test("preTokenize: contractions, space gluing, lookahead whitespace arm") {
    assert(BpeByteLevel.preTokenize("the cat's hat") ==
      Seq("the", " cat", "'s", " hat"))
    // double space: the lookahead arm leaves the LAST space glued to
    // the next word (the published behavior)
    assert(BpeByteLevel.preTokenize("that  thin cat") ==
      Seq("that", " ", " thin", " cat"))
    assert(BpeByteLevel.preTokenize("a,b 12") == Seq("a", ",", "b", " 12"))
    assert(BpeByteLevel.preTokenize("café déjà") == Seq("café", " déjà"))
    // trailing whitespace has no following \S: the plain \s+ arm takes it whole
    assert(BpeByteLevel.preTokenize("ab  ") == Seq("ab", "  "))
    assert(BpeByteLevel.preTokenize("don't we're") ==
      Seq("don", "'t", " we", "'re"))
    assert(BpeByteLevel.preTokenize("") == Seq.empty)
  }

  test("encode matches the independently-derived fixture streams; ids follow the table") {
    val m = fixtureModel(fixtureMerges)
    assert(m.byteLevel && m.padId == -1 && m.unkId == -1)
    val bc = Bpe.broadcastModel(spark, m)
    val got = Seq("the cat's hat", "that  thin cat", "café cat the")
      .toDF("text")
      .select(Bpe.ids(col("text"), bc).as("ids"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("ids").toSeq)
    assert(got(0) == Seq(257, 260, 39, 115, 32, 263))
    assert(got(1) == Seq(256, 258, 32, 32, 256, 105, 110, 260))
    assert(got(2) == Seq(99, 97, 102, 195, 169, 260, 32, 257))
    // token strings are index-aligned with ids through the table
    val toks = Seq("the cat's hat").toDF("text")
      .select(Bpe.tokens(col("text"), bc)).head().getAs[scala.collection.Seq[String]](0)
    assert(toks == Seq("the", "Ġcat", "'", "s", "Ġ", "hat"))
  }

  test("decode is LOSSLESS: decode(ids(s)) == s, exotic unicode included") {
    val m = fixtureModel(fixtureMerges)
    val bc = Bpe.broadcastModel(spark, m)
    val hand = Seq("the cat's hat", "that  thin cat", "café cat the",
      "  leading and trailing  ", "tabs\tand\nnewlines", "汉字 and 🎉 emoji",
      "", "ø", "a")
    val rt = hand.toDF("text")
      .select(col("text"), Bpe.decodeIds(Bpe.ids(col("text"), bc), bc).as("back"))
      .collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(1), r.getString(0)))
    // property: random strings over a hostile alphabet round-trip
    // exactly (surrogate PAIRS ride whole via string pieces; UTF-8
    // cannot carry an unpaired half, so the generator never splits one)
    val pieceGen = Gen.oneOf(
      Gen.oneOf(('a' to 'z') ++ Seq(' ', '\t', '\n', '\'', ',', 'é', 'Ġ', '汉'))
        .map(_.toString),
      Gen.oneOf("🎉", "𝄞", "é", "  ", "'s don't", "12,3"))
    val strGen = Gen.listOf(pieceGen).map(_.mkString)
    forSamples(Gen.listOfN(8, strGen), 40) { strs =>
      val rows = strs.toDF("text")
        .select(col("text"), Bpe.decodeIds(Bpe.ids(col("text"), bc), bc).as("back"))
        .collect()
      rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    }
    // pads (absent here) drop nothing; a special token decodes literally
    val eot = m.vocab.length - 1
    val withSpecial = Seq(1).toDF("x")
      .select(Bpe.decodeIds(typedLit(Seq(257, eot)), bc)).head().getString(0)
    assert(withSpecial == "the<|endoftext|>")
    // out-of-range ids with no unk become U+FFFD, never a throw
    val bad = Seq(1).toDF("x")
      .select(Bpe.decodeIds(typedLit(Seq(99, 99999)), bc)).head().getString(0)
    assert(bad == "c�")
  }

  test("loader validations: byte coverage, compound cross-check, optional unk/pad") {
    val mp = writeTmp("m.txt", "t h\n")
    // a vocab missing byte chars is loud
    val vp = writeTmp("v.tsv", "t\t0\nh\t1\nth\t2")
    val e = intercept[IllegalArgumentException](
      Bpe.loadExternalByteLevel(spark, mp, vp))
    assert(e.getMessage.contains("256"), e.getMessage)
    // mismatched merges/vocab loud
    val vocabNoCompound = (0 until 256)
      .map(b => String.valueOf(BpeByteLevel.byteToChar(b)))
      .zipWithIndex.map { case (t, i) => s"$t\t$i" }.mkString("\n")
    val vp2 = writeTmp("v2.tsv", vocabNoCompound)
    val e2 = intercept[IllegalArgumentException](
      Bpe.loadExternalByteLevel(spark, mp, vp2))
    assert(e2.getMessage.contains("not the same tokenizer"))
    // named unk/pad resolve when present
    val withSpecials = (0 until 256)
      .map(b => String.valueOf(BpeByteLevel.byteToChar(b))) ++
      Seq("th", "<pad>", "<unk>")
    val vp3 = writeTmp("v3.tsv",
      withSpecials.zipWithIndex.map { case (t, i) => s"$t\t$i" }.mkString("\n"))
    val m3 = Bpe.loadExternalByteLevel(spark, mp, vp3,
      unkToken = "<unk>", padToken = "<pad>")
    assert(m3.unkId == 258 && m3.padId == 257)
    // byte-level models refuse word-level continuation/training paths
    val m = fixtureModel(fixtureMerges)
    intercept[IllegalArgumentException](
      Bpe.continueFromWordCounts(m, Seq("ab" -> 5L), 2))
    intercept[IllegalArgumentException](
      Bpe.saveModel(spark, m, "/tmp/graft-bl-nope"))
    // saveExternal exports the pair; loadExternalByteLevel round-trips
    val d = java.nio.file.Files.createTempDirectory("graft-bl-rt")
    Bpe.saveExternal(spark, m, d.resolve("m.txt").toString, d.resolve("v.json").toString)
    val back = Bpe.loadExternalByteLevel(spark,
      d.resolve("m.txt").toString, d.resolve("v.json").toString)
    assert(back.merges.toSeq == m.merges.toSeq)
    assert(back.vocab.toSeq == m.vocab.toSeq)
  }
}
