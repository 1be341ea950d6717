package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-pipeline text operators: boilerplate-line
  * removal and token-budget chunking, on fixtures with known ground
  * truth. */
class TextPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-textpipeline-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("removeBoilerplateLines drops shared lines, keeps unique ones in order") {
    val docs = Seq(
      (0L, "unique alpha\nCopyright Footer\nunique beta"),
      (1L, "another text\nCopyright Footer\ntail line one"),
      (2L, "third document\nCopyright Footer"),
      (3L, "Copyright Footer")) // all-boilerplate doc
      .toDF("doc_id", "text")
    val out = TextOps.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "unique alpha\nunique beta")
    assert(out(1L) == "another text\ntail line one")
    assert(out(2L) == "third document")
    assert(out(3L) == "") // every line was boilerplate
  }

  test("removeBoilerplateLines: minDocs boundary, normalization, blank lines") {
    val docs = Seq(
      (0L, "  Shared   LINE \n\nkeep me"),   // normalizes like doc 1/2's
      (1L, "shared line\n\nonly here"),
      (2L, "SHARED\tLINE"),
      (3L, "twice only\nsolo content"),
      (4L, "twice only\nother content"))
      .toDF("doc_id", "text")
    val out = TextOps.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "shared line" appears (normalized) in docs 0,1,2 = 3 docs -> dropped;
    // blank lines are kept; "twice only" is in 2 docs < minDocs -> kept
    assert(out(0L) == "\nkeep me")
    assert(out(1L) == "\nonly here")
    assert(out(2L) == "")
    assert(out(3L) == "twice only\nsolo content")
    assert(out(4L) == "twice only\nother content")
  }

  test("removeBoilerplateLines preserves other columns and rejects minDocs < 2") {
    val docs = Seq((0L, "a\nz", "en"), (1L, "a\ny", "de"), (2L, "a\nx", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    val m = out.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m(0L) == ("z", "en") && m(1L) == ("y", "de") && m(2L) == ("x", "fr"))
    intercept[IllegalArgumentException] {
      TextOps.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 1)
    }
  }

  test("chunkDocuments: single chunk for short docs, exact overlap reconstruction") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, "short doc only"), (1L, text)).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, "doc_id", "text", maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id").collect()

    val short = out.filter(_.getLong(0) == 0L)
    assert(short.length == 1 && short(0).getString(2) == "short doc only"
      && short(0).getInt(3) == 3)

    val chunks = out.filter(_.getLong(0) == 1L)
    // n=100, maxTokens=64, stride=48 -> 2 chunks: [0,64), [48,100)
    assert(chunks.map(_.getInt(1)).toSeq == Seq(0, 1))
    assert(chunks.map(_.getInt(3)).toSeq == Seq(64, 52))
    // every chunk's text has exactly n_chunk_tokens tokens
    chunks.foreach(c => assert(c.getString(2).split(" ").length == c.getInt(3)))
    // dropping the first `overlap` tokens of each later chunk and
    // concatenating reconstructs the full normalized token stream
    val rebuilt = chunks.head.getString(2).split(" ").toSeq ++
      chunks.tail.toSeq.flatMap(_.getString(2).split(" ").drop(16).toSeq)
    assert(rebuilt == (0 until 100).map(i => s"t$i"))
  }

  test("chunkDocuments: zero overlap partitions the tokens exactly") {
    val text = (0 until 130).map(i => s"w$i").mkString(" ")
    val out = TextOps.chunkDocuments(Seq((7L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 50, overlap = 0)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getInt(3)).toSeq == Seq(50, 50, 30))
    assert(out.flatMap(_.getString(2).split(" ")).toSeq == (0 until 130).map(i => s"w$i"))
  }

  test("NULL text: boilerplate removal preserves NULL, chunking emits no chunks") {
    val docs = Seq((0L, "a\nkeep"), (1L, "a\nother"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val cleaned = TextOps.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(cleaned(0L).contains("keep") && cleaned(1L).contains("other"))
    assert(cleaned(2L).isEmpty) // NULL in, NULL out — not ""
    val chunks = TextOps.chunkDocuments(docs, "doc_id", "text", maxTokens = 4)
    assert(chunks.filter(col("doc_id") === 2L).count() == 0)
    assert(chunks.filter(col("doc_id") === 0L).count() == 1)
  }

  test("gopherSignals/gopherPass: each rule trips on its designed offender") {
    // one doc per rule violation + one clean passer (50+ words, sane
    // shape). Signals are checked exactly where they are simple ints.
    val passerText = (("the quick brown fox jumps over lazy dogs near rivers and " * 6) +
      "it must be that we have to deal with them all of today").trim
    val docs = Seq(
      (0L, passerText),                                // passes all rules
      (1L, "too short to pass with the and of that"),  // < 50 words
      (2L, passerText + " ###### ##### #### ### ## # ##### ##### ######"), // symbol ratio
      (3L, (1 to 12).map(i => s"- bullet item $i").mkString("\n")), // bullet lines
      (4L, passerText.split(" ").map(_ => "97531 86420").mkString(" ")), // no alpha words
      (5L, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll " * 3) // no stopwords
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), TextOps.gopherSignals(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words").as("nw"),
        col("g.bullet_frac").as("bf"), col("g.stopword_hits").as("sh"),
        TextOps.gopherPass(col("g")).as("pass"))
      .collect().map(r =>
        r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(out(0L)._4, s"clean doc should pass: ${out(0L)}")
    assert(!out(1L)._4 && out(1L)._1 < 50)
    assert(!out(2L)._4) // symbol-to-word ratio > 0.1
    assert(!out(3L)._4 && out(3L)._2 == 1.0) // every line is a bullet
    assert(!out(4L)._4) // alpha-word fraction ~ 0
    assert(!out(5L)._4 && out(5L)._3 < 2) // not enough required stopwords
    assert(out(0L)._3 >= 2)
  }

  test("gopherSignals: single-division ratios and line fractions are exact") {
    // 4 lines: one bullet, one ellipsis-ended, two plain -> fractions
    // 0.25 exactly; 8 words, all alphabetic
    val text = "- item one\nplain words here\nmore plain\nwaiting on this…"
    val g = Seq((0L, text)).toDF("doc_id", "text")
      .select(TextOps.gopherSignals(col("text")).as("g"))
      .select("g.n_words", "g.bullet_frac", "g.ellipsis_frac", "g.alpha_word_frac")
      .head()
    assert(g.getInt(0) == 11)
    assert(g.getDouble(1) == 0.25)
    assert(g.getDouble(2) == 0.25)
    assert(g.getDouble(3) == 10.0 / 11) // the bare "-" token has no letter
    // CRLF text: split('\n') leaves \r on every line — the line rules
    // must still fire (the ellipsis anchor consumes the \r; RE2-parity)
    val crlf = Seq((0L, "waiting on this...\r\nplain\r\n- item\r\nx"))
      .toDF("doc_id", "text")
      .select(TextOps.gopherSignals(col("text")).as("g"))
      .select("g.bullet_frac", "g.ellipsis_frac").head()
    assert(crlf.getDouble(0) == 0.25)
    assert(crlf.getDouble(1) == 0.25)
  }

  test("chunkDocuments rejects bad parameters") {
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextOps.chunkDocuments(docs, "doc_id", "text", maxTokens = 0))
    intercept[IllegalArgumentException](
      TextOps.chunkDocuments(docs, "doc_id", "text", maxTokens = 10, overlap = 10))
  }

  test("c4Clean: each published line rule trips on its designed offender") {
    // one page per rule, each with three guaranteed-good lines so the
    // page itself survives and ONLY the offender line vanishes
    val good = "one two three four five six."
    def page(offender: String) = s"$good\n$offender\n$good\n$good"
    val docs = Seq(
      (0L, page("too short.")),                          // < 5 words
      (1L, page("one two three four five no mark")),     // no terminal
      (2L, page("one two three four five six...")),      // ellipsis
      (3L, page("enable JavaScript one two three four.")), // javascript (ci)
      (4L, page("read our Cookie Policy one two three.")), // policy (ci)
      (5L, page("one two three four five seven?")),      // survivor: ?
      (6L, page("one two three said \"quoted words.\"")) // survivor: quote
    ).toDF("doc_id", "text")
    val out = TextOps.c4Clean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    (0L to 4L).foreach(d =>
      assert(out(d) == s"$good\n$good\n$good", s"doc $d kept its offender"))
    assert(out(5L).split("\n").length == 4 &&
      out(5L).contains("seven?"))
    assert(out(6L).split("\n").length == 4)
  }

  test("c4KeepLine: \\x0b separates words identically to the oracle's explicit class") {
    // the word separator is the explicit [ \t\n\x0b\f\r]+ class on
    // BOTH engines — RE2's \s excludes \x0b (so the old oracle saw
    // "alpha\x0bbeta" as ONE word and dropped doc 0) while Java's \s
    // includes it; the explicit class makes both engines count 5.
    // Verdict pinned here so a regression to \s on either side that
    // changes the Spark verdict fails loudly.
    val df = Seq(
      (0L, "alphabeta gamma delta five."), // 5 words via \x0b split
      (1L, "alphabeta gamma four.")        // 4 words — dropped
    ).toDF("id", "line")
    val kept = df.filter(TextOps.c4KeepLine(col("line")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
  }

  test("c4Clean: page-level drops — lorem ipsum, braces, too few sentences, NULL") {
    val good = "one two three four five six."
    val docs = Seq(
      (0L, s"$good\n$good\n$good"),                      // survives (3 sentences)
      (1L, s"$good\n$good"),                             // dies: 2 sentences
      (2L, s"$good\n$good\n$good\nsee Lorem Ipsum here."), // dies: lorem ipsum
      (3L, s"$good\n$good\n$good\nvar x = { a: 1 }"),    // dies: brace
      (4L, null.asInstanceOf[String])                    // dies: NULL text
    ).toDF("doc_id", "text")
    val kept = TextOps.c4Clean(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
    // minSentences is a knob: at 2 the two-line page survives
    val kept2 = TextOps.c4Clean(docs, "doc_id", "text", minSentences = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(0L, 1L))
    // other columns pass through untouched
    val wide = Seq((0L, s"$good\n$good\n$good", "keep-me"))
      .toDF("doc_id", "text", "tag")
    val w = TextOps.c4Clean(wide, "doc_id", "text").collect()(0)
    assert(w.getAs[String]("tag") == "keep-me")
  }

  test("gopherRepetitionSignals: hand-computed fractions on designed documents") {
    // doc 0: lines "aaaa","bb","aaaa","cc" (4 lines, 3 distinct):
    //   dup_line_frac = 1/4; dup chars = 4 of (4+2+4+2)=12 -> 1/3
    //   paragraphs "aaaa\nbb" and "aaaa\ncc": distinct -> 0
    //   words: aaaa bb aaaa cc; top 2-gram each unique (count 1):
    //   tie-break -> lexicographically smallest "aaaa bb" (7 chars);
    //   normalized length = 4+1+2+1+4+1+2 = 15 -> 7/15
    // doc 1: "x y x y x y" — top 2-gram "x y" count 3, ties beat
    //   "y x" (count 2) on count; len 11 -> 3*3/11
    // doc 2: NULL text -> all NULL
    val docs = Seq(
      (0L, "aaaa\nbb\n\naaaa\ncc"),
      (1L, "x y x y x y"),
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRepetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Double]("dup_line_frac") == 0.25)
    assert(d0.getAs[Double]("dup_line_char_frac") == 4.0 / 12.0)
    assert(d0.getAs[Double]("dup_para_frac") == 0.0)
    assert(d0.getAs[Double]("dup_para_char_frac") == 0.0)
    assert(d0.getAs[Double]("top_2gram_char_frac") == 7.0 / 15.0)
    val d1 = out(1L)
    assert(d1.getAs[Double]("dup_line_frac") == 0.0)
    assert(d1.getAs[Double]("top_2gram_char_frac") == 9.0 / 11.0)
    assert(d1.getAs[Double]("top_3gram_char_frac") == 2 * 5.0 / 11.0)
    val d2 = out(2L)
    Seq("dup_line_frac", "dup_para_frac", "top_2gram_char_frac")
      .foreach(c => assert(d2.isNullAt(d2.fieldIndex(c)), s"$c not NULL"))
    // one-word / empty docs: no n-grams -> 0, not NULL or crash
    val tiny = TextOps.gopherRepetitionSignals(
      Seq((0L, "word")).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(tiny.getAs[Double]("top_2gram_char_frac") == 0.0)
  }

  test("dupNgramCharFracs: hand-computed interval unions — overlap, islands, edges") {
    // doc 0: tokens a,b,a,b,a,b,x,y,z,w (all len 1; joined len 19).
    //   n=2: dup grams "a b"(i=0,2,4) and "b a"(i=1,3) — intervals
    //   [2i, 2i+2] for i=0..4 chain into ONE island [0,10] = 11 chars;
    //   n=3: "a b a"(0,2) + "b a b"(1,3) union again [0,10];
    //   n=5: no 5-gram repeats -> 0.
    // doc 1: tokens c,d,c,d,e,f,g,c,d (joined len 17). n=2: "c d" at
    //   i=0,2,7 -> [0,2],[4,6],[14,16] — [0,2]+[4,6] ADJACENT (gap of
    //   exactly the separating char) merge-or-not counts the same 6,
    //   [14,16] a separate island -> 9 covered chars.
    // doc 2: fewer than 2 words -> 0. doc 3: NULL -> NULL.
    // doc 4: empty -> 0.
    val docs = Seq(
      (0L, "a b a b a b x y z w"),
      (1L, "c d c d e f g c d"),
      (2L, "lonely"),
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.gopherDupNgramSignals(docs, "doc_id", "text", Seq(2, 3, 5))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getDouble(1) == 11.0 / 19.0)
    assert(out(0L).getDouble(2) == 11.0 / 19.0)
    assert(out(0L).getDouble(3) == 0.0)
    assert(out(1L).getDouble(1) == 9.0 / 17.0)
    assert(out(2L).getDouble(1) == 0.0)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2) && out(3L).isNullAt(3))
    assert(out(4L).getDouble(1) == 0.0)
  }

  test("dupNgramCharFracs: brute-force parity on random small-vocab corpora") {
    // small vocab forces heavy organic duplication; the brute force
    // marks covered char positions in a boolean array — a third
    // algorithm vs the native merged walk and the oracle's islands
    val rnd = new scala.util.Random(19)
    val vocab = Vector("ab", "c", "def", "gh", "i")
    val ns = Seq(2, 3, 5, 7)
    val docs = (0L until 30L).map { id =>
      val nTok = 1 + rnd.nextInt(60)
      (id, Seq.fill(nTok)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def brute(text: String, n: Int): Double = {
      val toks = text.split(" ")
      if (toks.length < n) return 0.0
      val grams = toks.sliding(n).map(_.mkString(" ")).toArray
      val counts = grams.groupBy(identity).map { case (g, o) => g -> o.length }
      val starts = toks.scanLeft(0)((acc, w) => acc + w.length + 1)
      val covered = new Array[Boolean](text.length)
      grams.zipWithIndex.foreach { case (g, i) =>
        if (counts(g) > 1)
          (starts(i) until starts(i) + g.length).foreach(covered(_) = true)
      }
      covered.count(identity).toDouble / text.length.toDouble
    }
    val got = TextOps.gopherDupNgramSignals(
      docs.toDF("doc_id", "text"), "doc_id", "text", ns)
      .collect().map(r => r.getLong(0) ->
        ns.indices.map(i => r.getDouble(i + 1))).toMap
    docs.foreach { case (id, text) =>
      ns.zipWithIndex.foreach { case (n, i) =>
        assert(got(id)(i) == brute(text, n),
          s"doc $id n=$n: native ${got(id)(i)} != brute ${brute(text, n)}")
      }
    }
  }

  test("gopherRepetitionFilter: each published threshold trips on its designed offender") {
    // every word distinct per line AND across lines, so every n-gram
    // is unique — no accidental top-gram mass
    val clean = (1 to 30).map(i =>
      s"alpha$i beta$i gamma$i delta$i epsilon$i.").mkString("\n")
    val dupLines = (1 to 10).map(_ => "the same line again").mkString("\n") +
      "\n" + (1 to 10).map(i => s"fresh line $i").mkString("\n")
    val topHeavy = (1 to 50).map(_ => "spark engine").mkString(" ")
    // dup-GRAM offender: every line distinct (no line/para dups), no
    // 2/3/4-gram claims a big character share, but one 12-word
    // sentence appears twice — its 5..10-gram coverage (~24 of ~99
    // words' chars) trips every published dup_{n}gram threshold
    val repeated = "zulu yankee xray whiskey victor uniform tango " +
      "sierra romeo quebec papa oscar"
    val dupGrams = ((1 to 15).map(i =>
      s"filler$i extra$i words$i here$i now$i") :+ repeated :+ repeated)
      .mkString("\n")
    val docs = Seq(
      (0L, clean), (1L, dupLines), (2L, topHeavy),
      (3L, null.asInstanceOf[String]), (4L, dupGrams)
    ).toDF("doc_id", "text")
    val kept = TextOps.gopherRepetitionFilter(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L),
      s"expected only the clean doc to survive, got $kept")
    // the dup-gram offender fails ONLY the coverage family: relax it
    // and the doc passes every other published rule
    val relaxed = TextOps.gopherRepetitionFilter(docs, "doc_id", "text",
      maxDupGramCharFrac = Seq.fill(6)(1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(relaxed == Set(0L, 4L),
      s"expected the dup-gram offender to pass with coverage relaxed, got $relaxed")
  }
}
