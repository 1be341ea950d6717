package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the ops layer (generator-driven via
  * scalacheck Gens with fixed seeds — the scalatest-scalacheck bridge
  * is not in the offline artifact cache). */
class PropertiesSpec extends AnyFunSuite {

  /** Run `body` over `n` deterministic samples of `gen`. */
  def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  val text: Gen[String] = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("jaccard_sim is symmetric, bounded, and 1 on self") {
    forSamples(Gen.listOfN(4, text), 10) { texts =>
      {
        val df = Seq((texts(0), texts(1)), (texts(2), texts(3)))
          .toDF("a", "b")
          .select(
            graft.functions.similarityExprs.jaccard_sim(
              TextOps.shingles($"a", 2), TextOps.shingles($"b", 2)).as("ab"),
            graft.functions.similarityExprs.jaccard_sim(
              TextOps.shingles($"b", 2), TextOps.shingles($"a", 2)).as("ba"),
            graft.functions.similarityExprs.jaccard_sim(
              TextOps.shingles($"a", 2), TextOps.shingles($"a", 2)).as("aa"))
        df.collect().foreach { r =>
          assert(r.getDouble(0) == r.getDouble(1)) // symmetric
          assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
          assert(r.getDouble(2) == 1.0) // self-similarity
        }
      }
    }
  }

  test("minhash signature agreement tracks true jaccard within tolerance") {
    forSamples(Gen.chooseNum(0, 80), 8) { overlap =>
      val base = (0 until 100).map(i => s"sh$i")
      val other = base.take(overlap) ++ (0 until (100 - overlap)).map(i => s"zz$i")
      val df = Seq((base, other)).toDF("a", "b")
        .select(
          graft.functions.similarityExprs.sig_agreement(
            graft.functions.exprs.minhash_sig($"a", 128),
            graft.functions.exprs.minhash_sig($"b", 128)).as("est"))
      val est = df.head().getDouble(0)
      val trueJ = overlap.toDouble / (200 - overlap)
      assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ overlap=$overlap")
    }
  }

  test("TopK aggregator equals window-sort top-k on random data") {
    forSamples(Gen.listOfN(60, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(0.0, 100.0))), 5) { rows =>
      {
        val df = rows.zipWithIndex
          .map { case ((g, v), i) => (g.toLong, v, i.toLong) }
          .toDF("g", "v", "id")
        val viaAgg = Aggregators.groupTopK(df, Seq("g"), "v", "id", 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("v").desc, col("id"))
        val viaWindow = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
        assert(viaAgg == viaWindow)
      }
    }
  }

  test("saltedJoin equals the plain join for arbitrary key distributions and factors") {
    val data: Gen[(List[Int], List[Int], Int)] = for {
      leftKeys <- Gen.listOfN(60, Gen.chooseNum(0, 9))
      rightKeys <- Gen.listOfN(15, Gen.chooseNum(0, 12))
      factor <- Gen.chooseNum(1, 7)
    } yield (leftKeys, rightKeys, factor)
    forSamples(data, 6) { case (leftKeys, rightKeys, factor) =>
      val left = leftKeys.zipWithIndex.map { case (k, i) => (k.toLong, i) }.toDF("k", "v")
      val right = rightKeys.distinct.map(k => (k.toLong, s"d$k")).toDF("k", "name")
      val plain = left.join(right, Seq("k")).select("k", "v", "name")
        .collect().map(_.toSeq.toString).sorted.toSeq
      val salted = Skew.saltedJoin(left, right, Seq("k"), factor)
        .select("k", "v", "name").collect().map(_.toSeq.toString).sorted.toSeq
      assert(salted == plain)
    }
  }

  test("pointInInterval equals the naive range join for arbitrary intervals and bin widths") {
    val data: Gen[(List[(Double, Double)], Double)] = for {
      bounds <- Gen.listOfN(6, Gen.chooseNum(0, 90))
      lens <- Gen.listOfN(6, Gen.chooseNum(1, 40))
      w <- Gen.chooseNum(3, 50)
    } yield (bounds.zip(lens).map { case (b, l) => (b.toDouble, (b + l).toDouble) }, w.toDouble)
    forSamples(data, 6) { case (intervals, w) =>
      val points = (0 until 120).map(i => (i.toLong, i * 0.9)).toDF("pid", "x")
      val ivs = intervals.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "x", ivs, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naive = points.crossJoin(ivs).where($"x" >= $"lo" && $"x" <= $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive)
    }
  }

  test("word_ngram_hashes matches the composable shingles on random texts") {
    // messy texts: mixed case, repeated words, runs of varied whitespace,
    // punctuation-bearing tokens, accents — the native tokenizer must
    // agree with split(trim(normalized), "\\s+") everywhere
    val messyWord: Gen[String] = Gen.oneOf(
      "Alpha", "BETA", "gamma", "d.e,l;ta", "Épsilon", "zeta!", "η-eta", "x")
    val ws: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \r\n ")
    val messyText: Gen[String] = for {
      n <- Gen.chooseNum(0, 24)
      words <- Gen.listOfN(n, messyWord)
      seps <- Gen.listOfN(math.max(n - 1, 0), ws)
      lead <- Gen.oneOf("", "  ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + (words, seps :+ "").zipped.map(_ + _).mkString + trail
    forSamples(Gen.listOfN(12, messyText), 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      for (n <- Seq(2, 5); fallback <- Seq(true, false)) {
        val shingle =
          if (fallback) TextOps.shingles($"text", n) else TextOps.strictShingles($"text", n)
        val rows = df.select($"id",
          graft.functions.exprs.word_ngram_hashes($"text", n, fallback).as("nat"),
          array_distinct(shingle).as("comp")).collect()
        // per-text distinct-gram counts agree
        rows.foreach { r =>
          assert(r.getSeq[Long](1).size == r.getSeq[String](2).size,
            s"count mismatch n=$n fallback=$fallback text=${texts(r.getLong(0).toInt)}")
        }
        // pairwise overlap agrees: shared native hash iff shared raw gram
        val nat = rows.map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
        val raw = rows.map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
        for (a <- nat.keys; b <- nat.keys if a < b)
          assert((nat(a) & nat(b)).nonEmpty == (raw(a) & raw(b)).nonEmpty,
            s"overlap mismatch n=$n fallback=$fallback pair=($a,$b)")
      }
    }
  }

  test("chunkDocuments covers every token with the declared overlap for random params") {
    val params = for {
      nTok <- Gen.chooseNum(0, 200)
      maxT <- Gen.chooseNum(1, 60)
      ov <- Gen.chooseNum(0, maxT - 1)
    } yield (nTok, maxT, ov)
    forSamples(params, 20) { case (nTok, maxT, ov) =>
      val toks = (0 until nTok).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      val chunks = TextOps.chunkDocuments(df, "id", "text", maxT, ov)
        .orderBy("chunk_id").collect()
      val stride = maxT - ov
      // expected chunk count from the closed form
      val n = math.max(1, nTok) // empty text tokenizes to one "" token
      val expected = if (n <= maxT) 1 else ((n - maxT + stride - 1) / stride) + 1
      assert(chunks.length == expected, s"nTok=$nTok maxT=$maxT ov=$ov")
      // every chunk within budget, counts exact, ids dense
      assert(chunks.map(_.getInt(1)).toSeq == (0 until expected))
      chunks.foreach { c =>
        assert(c.getInt(3) <= maxT && c.getInt(3) >= 1)
        assert(c.getString(2).split(" ").length == c.getInt(3))
      }
      // overlap reconstruction returns the exact token stream
      if (nTok > 0) {
        val rebuilt = chunks.head.getString(2).split(" ").toSeq ++
          chunks.tail.toSeq.flatMap(_.getString(2).split(" ").drop(ov).toSeq)
        assert(rebuilt == toks, s"nTok=$nTok maxT=$maxT ov=$ov")
      }
    }
  }

  test("removeBoilerplateLines is idempotent and only ever deletes whole lines") {
    val corpus = for {
      nDocs <- Gen.chooseNum(3, 8)
      shared <- Gen.listOfN(2, text)
      docs <- Gen.listOfN(nDocs, Gen.listOfN(4, Gen.frequency(
        3 -> text, 2 -> Gen.oneOf(shared), 1 -> Gen.const(""))))
    } yield docs.map(_.mkString("\n"))
    forSamples(corpus, 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = TextOps.removeBoilerplateLines(df, "id", "text", minDocs = 3)
      val out1 = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // every output doc is a subsequence of its input's lines
      val in = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
      out1.foreach { case (id, t) =>
        val inLines = in(id).split("\n", -1).toList
        val outLines = if (t.isEmpty) Nil else t.split("\n", -1).toList
        def isSubseq(a: List[String], b: List[String]): Boolean = (a, b) match {
          case (Nil, _) => true
          case (_, Nil) => false
          case (x :: xs, y :: ys) => if (x == y) isSubseq(xs, ys) else isSubseq(a, ys)
        }
        assert(isSubseq(outLines, inLines), s"doc $id not a line-subsequence")
      }
      // a second pass removes nothing further
      val out2 = TextOps.removeBoilerplateLines(once, "id", "text", minDocs = 3)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out2 == out1)
    }
  }

  test("bloom decontamination equals the join form on random corpora with messy whitespace") {
    // texts with tabs/newlines/VT and planted eval overlaps: the bloom
    // path's verdicts must equal the join form's on every draw
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", "", " \r\n")
    val messyText: Gen[String] = for {
      n <- Gen.chooseNum(6, 16)
      ws <- Gen.listOfN(n + 1, sep)
      toks <- Gen.listOfN(n, word)
    } yield toks.zip(ws).map { case (t, s) => t + s }.mkString
    val corpusGen = for {
      evalTexts <- Gen.listOfN(3, messyText)
      corpusTexts <- Gen.listOfN(8, messyText)
      planted <- Gen.someOf(evalTexts)
    } yield (evalTexts, corpusTexts ++ planted.map(t => s"prefix words $t suffix"))
    forSamples(corpusGen, 8) { case (evalTexts, corpusTexts) =>
      val evalDf = evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val joinIds = Contamination.decontaminate(corpus, evalDf, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloomIds = Contamination.decontaminateBloom(corpus, evalDf, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomIds == joinIds)
    }
  }

  test("exactCrossDedup equals the brute-force fingerprint anti-join on random corpora") {
    val caseVariant: Gen[String => String] = Gen.oneOf(
      identity[String] _, (s: String) => s.toUpperCase, (s: String) => s"  $s\t")
    val gen = for {
      refTexts <- Gen.listOfN(4, text)
      cleanTexts <- Gen.listOfN(5, text)
      dups <- Gen.someOf(refTexts)
      variants <- Gen.listOfN(dups.size, caseVariant)
    } yield (refTexts, cleanTexts ++ dups.zip(variants).map { case (t, v) => v(t) })
    forSamples(gen, 8) { case (refTexts, corpusTexts) =>
      val reference = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.exactCrossDedup(corpus, reference, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val refFps = reference.select(TextOps.fingerprint($"text").as("fp"))
      val expect = corpus.withColumn("fp", TextOps.fingerprint($"text"))
        .join(refFps, Seq("fp"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect)
    }
  }

  test("exact dedup is idempotent and never increases rows") {
    forSamples(Gen.listOfN(12, text), 5) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val once = Dedup.exact(df, "text", "id")
        val twice = Dedup.exact(once, "text", "id")
        assert(once.count() <= df.count())
        assert(twice.count() == once.count())
        assert(once.select("text").distinct().count() ==
          df.select(TextOps.normalized($"text")).distinct().count())
      }
    }
  }

  test("normalizeUrl is idempotent and preserves the host for arbitrary messy URLs") {
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS")
    val host = Gen.oneOf("Ex.COM", "www.example.co.uk", "A.b.C.org", "ex.com")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val user = Gen.oneOf("", "UserA@", "a:B@")
    val path = Gen.oneOf("", "/", "/P/Q", "/x/", "/x//", "/gclid=5/seg")
    val query = Gen.oneOf("", "?id=1", "?utm_source=a", "?utm_a=1&id=2&fbclid=x",
      "?my_gclid=keep", "?a=1&utm_b=2")
    val frag = Gen.oneOf("", "#f", "#a?b=1")
    val url = for {
      s <- scheme; u <- user; h <- host; po <- port; pa <- path; q <- query; f <- frag
    } yield s"$s://$u$h$po$pa$q$f"
    forSamples(Gen.listOfN(12, url), 8) { urls =>
      val df = urls.toDF("u")
      val once = df.select(UrlOps.normalizeUrl($"u").as("n"))
      val rows = once.select($"n", UrlOps.normalizeUrl($"n").as("n2"),
        UrlOps.extractDomain($"n").as("d")).collect()
      rows.zip(urls).foreach { case (r, orig) =>
        assert(r.getString(0) == r.getString(1),
          s"not idempotent: '$orig' -> '${r.getString(0)}' -> '${r.getString(1)}'")
      }
      // the canonical form's host equals the original's lowercased host
      val origDomains = df.select(UrlOps.extractDomain($"u")).collect().map(_.getString(0))
      rows.map(_.getString(2)).zip(origDomains).zip(urls).foreach { case ((nd, od), orig) =>
        assert(nd == od, s"host changed by normalization of '$orig': '$od' -> '$nd'")
      }
    }
  }

  test("sampleByStratum output is always a subset with per-row decisions stable across salts' reuse") {
    val fracs = for {
      fEn <- Gen.chooseNum(0.0, 0.99); fDe <- Gen.chooseNum(0.0, 1.5)
      dflt <- Gen.chooseNum(0.0, 0.99)
    } yield (fEn, fDe, dflt)
    forSamples(fracs, 8) { case (fEn, fDe, dflt) =>
      val df = (0L until 300L).map(i => (i, Seq("en", "de", "fr")((i % 3).toInt)))
        .toDF("k", "g")
      val kept = Sampling.sampleByStratum(df, $"k", $"g",
        Seq("en" -> fEn, "de" -> fDe), dflt, ":p")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val all = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept.subsetOf(all))
      // fraction >= 1.0 keeps the whole stratum
      if (fDe >= 1.0) assert(kept.count(_._2 == "de") == 100)
      // decisions are per-key deterministic: rerun is identical
      val again = Sampling.sampleByStratum(df, $"k", $"g",
        Seq("en" -> fEn, "de" -> fDe), dflt, ":p")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(again == kept)
    }
  }

  test("charShingles (linear regex) == the per-position substring enumeration") {
    // the regex formulation exists purely for complexity (substr seeks
    // its start codepoint from byte 0 → O(chars²)/row); identity must
    // be bit-equal, including astral chars, line separators (which \s
    // does NOT collapse and plain `.` does NOT match), and controls
    val piece: Gen[String] = Gen.oneOf(
      "a", "b", "c", " ", "  ", "\t", "\n", "😀", "𝕊", " ", " ",
      "", "…", "ß", "#", ".", "xyz")
    val uniText: Gen[String] =
      Gen.chooseNum(0, 24).flatMap(k => Gen.listOfN(k, piece)).map(_.mkString)
    forSamples(Gen.listOfN(24, uniText), 6) { texts =>
      (2 to 4).foreach { n =>
        // old formulation, inline: transform over positions + substr
        import graft.ops.TextOps.{normalized, once}
        def substrShingles(c: org.apache.spark.sql.Column) =
          once(normalized(c)) { s =>
            when(length(s) >= n,
              transform(sequence(lit(0), length(s) - n),
                i => s.substr(i + 1, lit(n))))
              .otherwise(array(s))
          }
        val rows = texts.toDF("t").select(
          TextOps.charShingles($"t", n).as("fast"),
          substrShingles($"t").as("ref")).collect()
        rows.foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"shingle identity diverged (n=$n): ${r.getSeq[String](0).take(5)} vs ${r.getSeq[String](1).take(5)}")
        }
      }
    }
  }
}
