package graft.functions

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.functions.{col, lit, typedLit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized interpreted-vs-codegen equivalence sweep over EVERY
  * native graft expression — the generic closure of the per-expression
  * fuzz MediaDimsSpec pioneered. For each expression, the same random
  * inputs are evaluated twice: through a real plan with whole-stage
  * codegen (fallback DISABLED, so a doGenCode failure is an error, not
  * a silent interpreted rerun) and through the interpreted
  * `Expression.eval` path over literal children. Any divergence —
  * null propagation, UTF8String/ArrayData conversion, drift between
  * eval and the generated Java (e.g. CosineSim's NaN→NULL logic is
  * IMPLEMENTED TWICE) — fails with the offending input printed.
  *
  * Inputs deliberately include the hostile shapes: nulls, empties,
  * whitespace variety, combining characters (NFC-relevant), astral
  * code points (UTF-8 offset stress), zero/NaN vectors, and mutated
  * media headers. */
class ExprFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-expr-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.codegen.fallback", "false") // codegen failure = test failure
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  // ---------- generators ----------

  private val charPool: IndexedSeq[String] =
    ('a' to 'z').map(_.toString) ++ Seq("é", "ß", "中", "é", "é",
      "😀" /* astral: 😀 */, "0", "9", "_")
  private val wsPool = IndexedSeq(" ", "\t", "\n", "  ", " \r\n ")

  private def randWord(): String =
    (0 until 1 + rnd.nextInt(7)).map(_ => charPool(rnd.nextInt(charPool.length))).mkString

  private def randText(): String = {
    if (rnd.nextInt(20) == 0) return ""
    val words = (0 until rnd.nextInt(12)).map(_ => randWord())
    val sep = wsPool(rnd.nextInt(wsPool.length))
    val core = words.mkString(sep)
    (if (rnd.nextBoolean()) " " else "") + core + (if (rnd.nextInt(4) == 0) "\t" else "")
  }

  private def randTexts(n: Int): Seq[String] =
    Seq(null, "", " ", "a") ++ (0 until n).map(_ => randText())

  private def randTokens(): Seq[String] =
    (0 until rnd.nextInt(10)).map(_ => randWord())

  private def randVec(dim: Int): Seq[Double] = {
    val kind = rnd.nextInt(10)
    if (kind == 0) Seq.fill(dim)(0.0) // zero-norm → undefined cosine
    else if (kind == 1) (0 until dim).map(i => if (i == 0) Double.NaN else rnd.nextGaussian())
    else (0 until dim).map(_ => rnd.nextGaussian())
  }

  // ---------- the harness ----------

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
    case (x: Float, y: Float) => (x.isNaN && y.isNaN) || x == y
    // collection.Seq, NOT the default (immutable.Seq) alias: the
    // codegen path hands back mutable.ArraySeq, which would fall
    // through to `==` — elementwise, so a NaN-bearing double array
    // would spuriously fail (NaN != NaN)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(deepEq)
    case (x: Row, y: Row) => deepEq(x.toSeq, y.toSeq)
    case _ => a == b
  }

  /** Resolve a literal-rooted Column into a catalyst Expression via the
    * ANALYZED (not optimized — constant folding would itself eval) plan
    * of a one-row projection, then strip the alias. Spark 4 Columns
    * wrap ColumnNodes that are unevaluable until analysis. */
  private def analyzedExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    Bridge.analyzed(spark.range(1).select(c.as("r"))) match {
      case p: Project => p.projectList.head.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Alias].child
      case other => fail(s"expected Project, got $other")
    }
  }

  /** codegen = plan over a data column; interpreted = eval over literal
    * children. One comparison per input. */
  private def sweep1(name: String, df: DataFrame, lits: Seq[Column],
      exprOf: Column => Column): Unit = {
    val fromCodegen = df.select(exprOf(col("x")).as("r")).collect().map(_.get(0))
    assert(fromCodegen.length == lits.length)
    lits.lazyZip(fromCodegen).zipWithIndex.foreach { case ((l, cg), i) =>
      val e = analyzedExpr(exprOf(l))
      val interp = CatalystTypeConverters.convertToScala(e.eval(InternalRow.empty), e.dataType)
      assert(deepEq(interp, cg),
        s"$name #$i: interpreted=$interp codegen=$cg")
    }
  }

  private def sweep2(name: String, df: DataFrame,
      lits: Seq[(Column, Column)], exprOf: (Column, Column) => Column): Unit = {
    val fromCodegen = df.select(exprOf(col("x"), col("y")).as("r")).collect().map(_.get(0))
    assert(fromCodegen.length == lits.length)
    lits.lazyZip(fromCodegen).zipWithIndex.foreach { case (((lx, ly), cg), i) =>
      val e = analyzedExpr(exprOf(lx, ly))
      val interp = CatalystTypeConverters.convertToScala(e.eval(InternalRow.empty), e.dataType)
      assert(deepEq(interp, cg),
        s"$name #$i: interpreted=$interp codegen=$cg")
    }
  }

  /** A typed NULL as a catalyst Literal — the Column-API cast form
    * (`lit(null).cast(...)`) reaches eval as an unevaluable
    * ColumnNodeExpression wrapper. */
  private def nullLit(dt: org.apache.spark.sql.types.DataType): Column =
    Bridge.toColumn(Literal.create(null, dt))
  private def strLit(v: String): Column =
    if (v == null) nullLit(StringType) else lit(v)
  private def strsLit(v: Seq[String]): Column =
    if (v == null) nullLit(ArrayType(StringType)) else typedLit(v)

  // ---------- string-input expressions ----------

  test("string expressions: minhash_char_sig / word ngrams / nfc / lm / nb") {
    val texts = randTexts(300)
    val df = texts.toDF("x")
    val lits = texts.map(strLit)
    sweep1("minhash_char_sig(5,64)", df, lits, exprs.minhash_char_sig(_, 5, 64))
    sweep1("minhash_char_sig(2,8)", df, lits, exprs.minhash_char_sig(_, 2, 8))
    sweep1("word_ngram_hashes(3,fb)", df, lits, exprs.word_ngram_hashes(_, 3, shortFallback = true))
    sweep1("word_ngram_hashes(2,nofb)", df, lits, exprs.word_ngram_hashes(_, 2, shortFallback = false))
    sweep1("word_ngram_hash_seq(3)", df, lits, exprs.word_ngram_hash_seq(_, 3))
    sweep1("nfc_normalize", df, lits, exprs.nfc_normalize)

    val docs = Seq.fill(30)(randText()).toDF("text")
    val lm = graft.ops.LmScore.train(docs, "text")
    sweep1("lm_token_scores", df, lits, exprs.lm_token_scores(_, lm))
    val nb = graft.ops.NbClassifier.train(
      docs.withColumn("y", (org.apache.spark.sql.functions.length(col("text")) % 2) === 0),
      "text", col("y"))
    sweep1("nb_token_log_odds", df, lits, exprs.nb_token_log_odds(_, nb))
  }

  // ---------- array<string> expressions ----------

  test("array<string> expressions: minhash_sig / simhash_sig / jaccard_sim") {
    val arrays: Seq[Seq[String]] =
      Seq(null, Seq.empty[String], Seq("")) ++ (0 until 200).map(_ => randTokens())
    val df = arrays.toDF("x")
    val lits = arrays.map(strsLit)
    sweep1("minhash_sig(64)", df, lits, exprs.minhash_sig(_, 64))
    sweep1("minhash_sig(1)", df, lits, exprs.minhash_sig(_, 1))
    sweep1("simhash_sig(64)", df, lits, simhashExprs.simhash_sig(_, 64))
    sweep1("simhash_sig(8)", df, lits, simhashExprs.simhash_sig(_, 8))

    val pairs = (0 until 150).map { i =>
      val a = if (i == 0) null else randTokens()
      val b = if (i == 1) null
        else if (i % 5 == 0 && a != null) rnd.shuffle(a) // permutation: set-equal
        else randTokens()
      (a, b)
    }
    val pdf = pairs.toDF("x", "y")
    sweep2("jaccard_sim", pdf, pairs.map(p => (strsLit(p._1), strsLit(p._2))),
      similarityExprs.jaccard_sim)
  }

  test("dup_ngram_char_fracs: interpreted == codegen over random token arrays") {
    // randWord mixes multibyte and astral chars, so the char-offset
    // arithmetic (numChars, not UTF-16 units) is under the fuzz; a
    // tiny vocab arm forces heavy duplication so the union walk sees
    // real overlapping/adjacent islands
    val tiny = Vector("a", "bb", "c")
    val arrays: Seq[Seq[String]] =
      Seq(null, Seq.empty[String], Seq(""), Seq("solo")) ++
        (0 until 150).map(_ => randTokens()) ++
        (0 until 150).map(_ =>
          Seq.fill(1 + rnd.nextInt(30))(tiny(rnd.nextInt(tiny.size))))
    val df = arrays.toDF("x")
    val lits = arrays.map(strsLit)
    sweep1("dup_ngram_char_fracs(2,3,5)", df, lits,
      spanExprs.dup_ngram_char_fracs(_, Seq(2, 3, 5)))
    sweep1("dup_ngram_char_fracs(7)", df, lits,
      spanExprs.dup_ngram_char_fracs(_, Seq(7)))
    // NULL token element throws (both paths) — the non-null contract
    val bad = Seq(Seq("a", null, "b")).toDF("x")
    val e = intercept[Exception](
      bad.select(spanExprs.dup_ngram_char_fracs(col("x"), Seq(2))).collect())
    assert(e.getMessage.contains("NULL token") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL token")))
  }

  test("lenient_simple_date: interpreted == codegen over date-ish strings") {
    def randDateish(): String = {
      val kind = rnd.nextInt(6)
      val y = 1900 + rnd.nextInt(300)
      val m = rnd.nextInt(40) // deliberately often out of range
      val d = rnd.nextInt(80)
      kind match {
        case 0 => f"$y%04d-$m%02d-$d%02d"
        case 1 => f"$y%04d-$m%02d-$d%02d${randWord()}" // trailing garbage
        case 2 => f"$m%02d/$d%02d/$y%04d" // wrong format → fallback/null
        case 3 => randWord()
        case 4 => ""
        case _ => f"$y%04d-$m%d-$d%d" // unpadded fields
      }
    }
    val texts: Seq[String] = Seq(null, "", "2020-01-01") ++
      (0 until 300).map(_ => randDateish())
    val df = texts.toDF("x")
    sweep1("lenient_simple_date", df, texts.map(strLit),
      dateExprs.lenient_simple_date(_, Seq("yyyy-MM-dd", "MM/dd/yyyy")))
  }

  // ---------- numeric-array expressions ----------

  test("vector expressions: cosine_sim / sign_lsh_sig / sig_agreement / hamming_dist") {
    val dim = 8
    val vecPairs = Seq((null: Seq[Double], randVec(dim))) ++
      (0 until 200).map(_ => (randVec(dim), randVec(dim)))
    val vdf = vecPairs.toDF("x", "y")
    def vecLit(v: Seq[Double]): Column =
      if (v == null) nullLit(ArrayType(DoubleType)) else typedLit(v)
    sweep2("cosine_sim", vdf, vecPairs.map(p => (vecLit(p._1), vecLit(p._2))),
      similarityExprs.cosine_sim)

    val planes: Seq[Seq[Double]] = (0 until 6).map(_ => (0 until dim).map(_ => rnd.nextGaussian()))
    val vecs = vecPairs.map(_._2)
    sweep1("sign_lsh_sig", vecs.toDF("x"), vecs.map(vecLit),
      similarityExprs.sign_lsh_sig(_, typedLit(planes)))

    val sigPairs: Seq[(Seq[Long], Seq[Long])] = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(16)
      val a = Seq.fill(n)(rnd.nextLong() % 4) // small range → real agreement
      val b = Seq.fill(n)(rnd.nextLong() % 4)
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long]))
    sweep2("sig_agreement", sigPairs.toDF("x", "y"),
      sigPairs.map(p => (typedLit(p._1), typedLit(p._2))),
      similarityExprs.sig_agreement)

    val bitPairs: Seq[(Seq[Int], Seq[Int])] = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextInt(2)), Seq.fill(n)(rnd.nextInt(2)))
    }
    sweep2("hamming_dist", bitPairs.toDF("x", "y"),
      bitPairs.map(p => (typedLit(p._1), typedLit(p._2))),
      similarityExprs.hamming_dist)
  }

  // ---------- quantization / projection expressions ----------

  test("quantization expressions: vec_max_abs / quantize_i8 / cosine_sim_i8 / plane_project") {
    val dim = 8
    def hostileVec(): Seq[Double] = rnd.nextInt(12) match {
      case 0 => Seq.empty[Double]
      case 1 => Seq.fill(dim)(0.0)
      case 2 => (0 until dim).map(i => if (i == 3) Double.NaN else rnd.nextGaussian())
      case 3 => (0 until dim).map(i => if (i == 0) Double.PositiveInfinity else rnd.nextGaussian())
      case 4 => Seq.fill(dim)(Double.NaN)
      case _ => (0 until dim).map(_ => rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))
    }
    val vecs: Seq[Seq[Double]] = Seq(null) ++ (0 until 200).map(_ => hostileVec())
    def vecLit(v: Seq[Double]): Column =
      if (v == null) nullLit(ArrayType(DoubleType)) else typedLit(v)
    sweep1("vec_max_abs", vecs.toDF("x"), vecs.map(vecLit), quantExprs.vec_max_abs)

    val scales = Seq(0.0, -1.0, Double.NaN, Double.PositiveInfinity, 1e-9, 0.02, 3.7)
    val vsPairs: Seq[(Seq[Double], Double)] =
      vecs.filter(_ != null).map(v => (v, scales(rnd.nextInt(scales.length))))
    sweep2("quantize_i8", vsPairs.toDF("x", "y"),
      vsPairs.map(p => (vecLit(p._1), lit(p._2))), quantExprs.quantize_i8)

    val qcPairs: Seq[(Seq[Double], Seq[Byte])] = (0 until 200).map { i =>
      val q = if (i == 0) Seq.fill(dim)(0.0) else (0 until dim).map(_ => rnd.nextGaussian())
      val c = if (i == 1) Seq.fill(dim)(0.toByte)
        else (0 until dim).map(_ => (rnd.nextInt(255) - 127).toByte)
      (q, c)
    }
    sweep2("cosine_sim_i8", qcPairs.toDF("x", "y"),
      qcPairs.map(p => (typedLit(p._1), typedLit(p._2))), quantExprs.cosine_sim_i8)

    val planes: Seq[Seq[Double]] =
      (0 until 5).map(_ => (0 until dim).map(_ => if (rnd.nextBoolean()) 1.0 else -1.0))
    sweep1("plane_project", vecs.toDF("x"), vecs.map(vecLit),
      quantExprs.plane_project(_, typedLit(planes), lit(1.0 / math.sqrt(5.0))))
  }

  // ---------- mojibake repair ----------

  test("fix_mojibake: interpreted == codegen over artifact-heavy strings") {
    val mojiPool: IndexedSeq[String] = ('a' to 'f').map(_.toString) ++
      Seq("Ã", "©", "â", "€", "™", "œ", "”", "“", "¯", "é", "ß", "中", "😀", " ", "Â")
    def mojiText(): String =
      (0 until rnd.nextInt(16)).map(_ => mojiPool(rnd.nextInt(mojiPool.length))).mkString
    val texts: Seq[String] = Seq(null, "", "Ã©", "cafÃ©", "café",
      "ÃÂ©" /* double-mangle shape */) ++ (0 until 300).map(_ => mojiText())
    sweep1("fix_mojibake", texts.toDF("x"), texts.map(strLit),
      mojibakeExprs.fix_mojibake)
  }

  test("bpe_tokens: interpreted == codegen over hostile text under a random model") {
    val corpus = (0 until 40).map(_ => randText()).toDF("text")
    val model = graft.ops.Bpe.train(corpus, "text", numMerges = 25, minPairCount = 2)
    val bc = spark.sparkContext.broadcast(model)
    // hostile pool: marker-spelling chars, NUL, surrogates-as-emoji,
    // isolated combining marks, long repeats, every whitespace class
    val pool: IndexedSeq[String] = ('a' to 'e').map(_.toString) ++
      Seq("<", "/", "w", ">", "\u0000", "😀", "́", "中", "é",
        " ", "\t", "\n", "\u000B", "\f", "\r", "aaaaaaaaaaaaaaaa")
    def hostile(): String =
      (0 until rnd.nextInt(24)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val texts: Seq[String] = Seq(null, "", " \t\n ", "</w>", "a</w>b",
      "\u0000", "a" * 500) ++ (0 until 300).map(_ => hostile())
    sweep1("bpe_tokens", texts.toDF("x"), texts.map(strLit),
      c => bpeExprs.bpe_tokens(c, bc))
    sweep1("bpe_ids", texts.toDF("x"), texts.map(strLit),
      c => bpeExprs.bpe_ids(c, bc))
    // decode over hostile ID arrays: pads, unk, out-of-range both
    // signs, extremes, NULL elements, long pad runs
    val vlen = model.vocab.length
    val idArrays: Seq[Seq[Integer]] = Seq(null, Seq.empty[Integer],
      Seq[Integer](0, 0, 0), Seq[Integer](null, 1, -1, Int.MaxValue, Int.MinValue),
      Seq.fill(200)(Integer.valueOf(0))) ++
      (0 until 300).map { _ =>
        (0 until rnd.nextInt(24)).map(_ => rnd.nextInt(6) match {
          case 0 => Integer.valueOf(0)                      // pad
          case 1 => Integer.valueOf(1)                      // unk
          case 2 => Integer.valueOf(vlen + rnd.nextInt(10)) // out of range
          case 3 => Integer.valueOf(-1 - rnd.nextInt(10))   // negative
          case 4 => null: Integer                           // null element
          case _ => Integer.valueOf(rnd.nextInt(vlen))      // real symbol
        })
      }
    def ilit(v: Seq[Integer]): Column =
      if (v == null) nullLit(ArrayType(IntegerType)) else typedLit(v)
    sweep1("bpe_decode_ids", idArrays.toDF("x"), idArrays.map(ilit),
      c => bpeExprs.bpe_decode_ids(c, bc))
  }

  test("greedy_chunk_starts: interpreted == codegen over random cost arrays") {
    val arrays: Seq[Seq[Int]] = Seq(null, Seq.empty[Int], Seq(0), Seq(100)) ++
      (0 until 300).map { i =>
        val n = rnd.nextInt(40)
        (0 until n).map(_ => i % 5 match {
          case 0 => 0                      // zero-cost runs
          case 1 => 1 + rnd.nextInt(3)     // dense small
          case 2 => 50 + rnd.nextInt(100)  // every word oversized
          case _ => rnd.nextInt(12)
        })
      }
    def alit(v: Seq[Int]): Column =
      if (v == null) nullLit(ArrayType(IntegerType)) else typedLit(v)
    Seq(1, 7, 24).foreach { max =>
      sweep1(s"greedy_chunk_starts(max=$max)", arrays.toDF("x"), arrays.map(alit),
        c => chunkExprs.greedy_chunk_starts(c, max))
    }
  }

  private def sweep3(name: String, df: DataFrame,
      lits: Seq[(Column, Column, Column)],
      exprOf: (Column, Column, Column) => Column): Unit = {
    val fromCodegen = df.select(exprOf(col("x"), col("y"), col("z")).as("r"))
      .collect().map(_.get(0))
    assert(fromCodegen.length == lits.length)
    lits.lazyZip(fromCodegen).zipWithIndex.foreach { case (((lx, ly, lz), cg), i) =>
      val e = analyzedExpr(exprOf(lx, ly, lz))
      val interp = CatalystTypeConverters.convertToScala(e.eval(InternalRow.empty), e.dataType)
      assert(deepEq(interp, cg),
        s"$name #$i: interpreted=$interp codegen=$cg")
    }
  }

  test("causal_labels: interpreted == codegen over random packed rows") {
    // coherent (input_ids, sorted offsets incl 0, n_pad) triples
    val rows: Seq[(Seq[Int], Seq[Int], Int)] = (0 until 250).map { _ =>
      val L = 1 + rnd.nextInt(24)
      val nPad = rnd.nextInt(L + 1)
      val n = L - nPad
      val ids = (0 until L).map(_ => rnd.nextInt(500))
      val offs =
        if (n == 0) Seq.empty[Int]
        else 0 +: (1 until n).filter(_ => rnd.nextBoolean()).toList
      (ids, offs.sorted, nPad)
    }
    val df = rows.toDF("x", "y", "z")
    val lits = rows.map { case (a, b, c) => (typedLit(a), typedLit(b), lit(c)) }
    sweep3("causal_labels", df, lits,
      (a, b, c) => chunkExprs.causal_labels(a, b, c, -100))
  }

  test("merge_span_starts / tokens_outside_spans: interpreted == codegen over random span sets") {
    val startArrays: Seq[Seq[Int]] = Seq(null, Seq.empty[Int], Seq(0), Seq(5)) ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(20)).map(_ => rnd.nextInt(60)).sorted.distinct
      }
    def slit(v: Seq[Int]): Column =
      if (v == null) nullLit(ArrayType(IntegerType)) else typedLit(v)
    Seq(1, 3, 8).foreach { k =>
      sweep1(s"merge_span_starts(k=$k)", startArrays.toDF("x"), startArrays.map(slit),
        c => spanExprs.merge_span_starts(c, k))
    }
    // tokens + sorted disjoint spans (built by the scala twin of merge)
    val pairs: Seq[(Seq[String], Seq[(Long, Long)])] = (0 until 200).map { _ =>
      val n = rnd.nextInt(30)
      val toks = (0 until n).map(i => s"t$i")
      val starts = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(math.max(n, 1))).sorted
      val ivs = starts.foldLeft(List.empty[(Long, Long)]) { (acc, s) =>
        val e = s.toLong + 2
        acc match {
          case (cs, ce) :: tail if s <= ce + 1 => (cs, math.max(ce, e)) :: tail
          case _ => (s.toLong, e) :: acc
        }
      }.reverse
      (toks, ivs)
    }
    val df = pairs.toDF("x", "y")
    sweep2("tokens_outside_spans", df,
      pairs.map { case (t, s) => (typedLit(t), typedLit(s)) },
      (t, s) => spanExprs.tokens_outside_spans(t, s))
  }

  test("tokens_outside_spans: a NULL token element throws — never copied into containsNull=false output") {
    // split() never yields null elements, but the expression accepts
    // any array<string>; a null slipping through would violate the
    // declared ArrayType(StringType, containsNull=false) for callers
    val df = Seq(Tuple1(Seq("a", null, "c"))).toDF("x")
    val e = intercept[Exception] {
      df.select(spanExprs.tokens_outside_spans(
        col("x"), typedLit(Seq.empty[(Long, Long)]))).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("NULL token element"))
    // null INSIDE a span is rejected too — the contract is uniform,
    // not dependent on whether the bad element happens to be kept
    val e2 = intercept[Exception] {
      df.select(spanExprs.tokens_outside_spans(
        col("x"), typedLit(Seq((1L, 1L))))).collect()
    }
    assert(rootMsg(e2).contains("NULL token element"))
  }

  test("exclusive_prefix_sums: interpreted == codegen over random weight arrays") {
    val arrays: Seq[Seq[Long]] = Seq(null, Seq.empty[Long], Seq(0L), Seq(7L)) ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(1000).toLong)
      }
    def alit(v: Seq[Long]): Column =
      if (v == null) nullLit(ArrayType(LongType)) else typedLit(v)
    sweep1("exclusive_prefix_sums", arrays.toDF("x"), arrays.map(alit),
      chunkExprs.exclusive_prefix_sums)
  }

  // ---------- broadcast-backed expressions ----------

  test("broadcast expressions: gram_set_overlap / gram_bloom_overlap / bloom_might_contain") {
    val sc = spark.sparkContext
    val member = (0 until 500).map(_ => rnd.nextLong()).toArray
    val setBc = sc.broadcast(member.sorted)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(member.length, 0.01)
    member.foreach(bloom.putLong)
    val bloomBc = sc.broadcast(bloom)

    // half the gram arrays contain a true member, half are random misses
    val grams: Seq[Seq[Long]] = Seq(null, Seq.empty[Long]) ++ (0 until 200).map { i =>
      val base = Seq.fill(1 + rnd.nextInt(8))(rnd.nextLong())
      if (i % 2 == 0) base :+ member(rnd.nextInt(member.length)) else base
    }
    val gdf = grams.toDF("x")
    def glit(v: Seq[Long]): Column =
      if (v == null) nullLit(ArrayType(LongType)) else typedLit(v)
    sweep1("gram_set_overlap", gdf, grams.map(glit), exprs.gram_set_overlap(_, setBc))
    sweep1("gram_bloom_overlap", gdf, grams.map(glit), exprs.gram_bloom_overlap(_, bloomBc))

    val keys: Seq[java.lang.Long] = (0 until 200).map { i =>
      java.lang.Long.valueOf(
        if (i % 2 == 0) member(rnd.nextInt(member.length)) else rnd.nextLong())
    }
    sweep1("bloom_might_contain", keys.map(Option(_).map(_.longValue)).toDF("x"),
      keys.map(k => lit(k.longValue)), exprs.bloom_might_contain(_, bloomBc))
  }

  // ---------- long expressions ----------

  test("zorder_key: random dimensions interpreted == codegen") {
    val pairs: Seq[(java.lang.Long, java.lang.Long)] =
      Seq((null: java.lang.Long, 5L: java.lang.Long)) ++
        (0 until 300).map { i =>
          def v() = i % 7 match {
            case 0 => Long.box(rnd.nextLong())          // out of range: mask path
            case 1 => Long.box(-1L - rnd.nextInt(1000)) // negative
            case _ => Long.box(rnd.nextInt(1 << 12).toLong)
          }
          (v(), v())
        }
    val df = pairs.toDF("x", "y")
    def llit(v: java.lang.Long): Column =
      if (v == null) nullLit(LongType) else lit(v.longValue)
    for (bits <- Seq(1, 9, 31))
      sweep2(s"zorder_key($bits)", df, pairs.map(p => (llit(p._1), llit(p._2))),
        (a, b) => zorderExprs.zorder_key(bits, a, b))
  }

  // ---------- binary expressions ----------

  test("media_dims: mutated headers interpreted == codegen") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val seeds = Seq(
      b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 13) ++
        "IHDR".getBytes ++ b(0, 0, 1, 0, 0, 0, 0, 200, 8, 2, 0, 0, 0),
      "GIF89a".getBytes ++ b(64, 0, 32, 0, 0, 0, 0),
      "RIFF".getBytes ++ b(36, 0, 0, 0) ++ "WAVE".getBytes ++ "fmt ".getBytes ++
        b(16, 0, 0, 0, 1, 0, 2, 0, 0x44, 0xac, 0, 0, 0, 0, 0, 0, 4, 0, 16, 0),
      b(0xff, 0xd8, 0xff, 0xc0, 0, 17, 8, 0, 100, 0, 50, 3, 0, 0x11, 0, 1, 0x11, 1, 2, 0x11, 1))
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray) ++
      (0 until 400).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(a); a }
        else {
          val base = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until rnd.nextInt(4)).foreach(_ => base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("media_dims", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.media_dims)
  }

  test("png_dhash / wav_energy_hash: mutated media bytes interpreted == codegen") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // a VALID 9x8 gray PNG (stored deflate) and a VALID 130-sample WAV
    // as mutation seeds, so some mutants decode and some fail mid-walk
    def crcChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes); crc.update(data)
      val v = crc.getValue
      be32(data.length.toLong) ++ typ.getBytes ++ data ++ be32(v)
    }
    val scan = (0 until 8).flatMap(y =>
      0.toByte +: (0 until 9).map(x => ((x * 40 + y * 5) % 256).toByte)).toArray
    val defl = { val d = new java.util.zip.Deflater(); d.setInput(scan); d.finish()
      val buf = new Array[Byte](256); val n = d.deflate(buf); d.end(); buf.take(n) }
    val pngSeed = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      crcChunk("IHDR", be32(9L) ++ be32(8L) ++ b(8, 0, 0, 0, 0)) ++
      crcChunk("IDAT", defl) ++ crcChunk("IEND", Array.emptyByteArray)
    val pcm = (0 until 130).flatMap { k =>
      val s = (k * k * 7) % 65536 - 32768
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }.toArray
    val wavSeed = "RIFF".getBytes ++ b(0x24 + 260, 1, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ b(16, 0, 0, 0, 1, 0, 1, 0, 0x40, 0x1f, 0, 0,
        0x80, 0x3e, 0, 0, 2, 0, 16, 0) ++
      "data".getBytes ++ b(4, 1, 0, 0) ++ pcm
    val seeds = Seq(pngSeed, wavSeed)
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray,
      pngSeed, wavSeed) ++
      (0 until 300).map { i =>
        if (i % 4 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until rnd.nextInt(5)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          if (i % 3 == 0) base.take(1 + rnd.nextInt(base.length)) else base
        }
      }
    val df = payloads.toDF("x")
    val plits = payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p))
    sweep1("png_dhash", df, plits, c => imageExprs.png_dhash(c))
    sweep1("wav_energy_hash", df, plits, c => imageExprs.wav_energy_hash(c))
  }

  // shared byte-assembly helpers for the container-format fuzz seeds
  private def be32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def box(t: String, p: Array[Byte]): Array[Byte] =
    be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
  private def fbox(t: String, p: Array[Byte]): Array[Byte] =
    box(t, Array[Byte](0, 0, 0, 0) ++ p)

  test("mp4_meta: interpreted == codegen over valid/mutated/random box trees") {
    val seed = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isom".getBytes) ++
      box("moov",
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(1000) ++ be32(7500) ++ new Array[Byte](80)) ++
        box("trak", box("tkhd", new Array[Byte](76) ++
          be32(1920L << 16) ++ be32(1080L << 16))))
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray, seed) ++
      (0 until 400).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seed.clone()
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("mp4_meta", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.mp4_meta)
  }

  test("mp4_samples: interpreted == codegen over valid/mutated sample tables") {
    val stbl =
      fbox("stsz", be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30)) ++
      fbox("stsc", be32(1) ++ be32(1) ++ be32(3) ++ be32(1)) ++
      fbox("stco", be32(1) ++ be32(1000)) ++
      fbox("stss", be32(1) ++ be32(2))
    val seed = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isom".getBytes) ++
      box("moov", box("trak", box("mdia", box("minf", box("stbl", stbl)))))
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray, seed) ++
      (0 until 300).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seed.clone()
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("mp4_samples", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.mp4_samples)
  }

  test("mp3_meta: interpreted == codegen over valid/mutated frame streams") {
    // MPEG1 Layer III, 128 kbps @ 44100, two frames
    val hdr = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0xc0.toByte)
    val oneFrame = hdr ++ new Array[Byte](413) // 417-byte frame INCLUDING header
    val seed = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ oneFrame ++ oneFrame
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray, seed) ++
      (0 until 300).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seed.clone()
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("mp3_meta", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.mp3_meta)
  }

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  test("ogg_meta: interpreted == codegen over valid/mutated page streams") {
    def page(hdrType: Int, granule: Long, seq: Long, payload: Array[Byte]) =
      "OggS".getBytes ++ Array[Byte](0, hdrType.toByte) ++ le(granule, 8) ++
        le(42, 4) ++ le(seq, 4) ++ le(0, 4) ++
        Array[Byte](1, payload.length.toByte) ++ payload
    val vorbisId = Array[Byte](1) ++ "vorbis".getBytes ++ le(0, 4) ++
      Array[Byte](2) ++ le(44100, 4) ++ new Array[Byte](12) ++
      Array(0xb8.toByte, 1.toByte)
    val seed = page(2, 0, 0, vorbisId) ++ page(4, 88200, 1, new Array[Byte](20))
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray, seed) ++
      (0 until 300).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seed.clone()
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("ogg_meta", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.ogg_meta)
  }

  test("mkv_meta: interpreted == codegen over valid/mutated EBML trees") {
    def hxb(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def el(idHex: String, content: Array[Byte]): Array[Byte] =
      hxb(idHex) ++ Array((0x80 | content.length).toByte) ++ content
    def beb(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    val seed = el("1a45dfa3", el("4282", "matroska".getBytes)) ++
      el("18538067",
        el("1549a966", el("2ad7b1", beb(1000000L, 3)) ++
          el("4489", beb(java.lang.Float.floatToIntBits(90000f).toLong & 0xffffffffL, 4))) ++
        el("1654ae6b",
          el("ae", el("83", Array[Byte](1)) ++ el("86", "V_VP9".getBytes) ++
            el("e0", el("b0", beb(1920, 2)) ++ el("ba", beb(1080, 2)))) ++
          el("ae", el("83", Array[Byte](2)) ++ el("86", "A_OPUS".getBytes) ++
            el("e1", el("b5",
              beb(java.lang.Float.floatToIntBits(48000f).toLong & 0xffffffffL, 4)) ++
              el("9f", Array[Byte](2))))) ++
        el("1f43b675", hxb("deadbeef")))
    val payloads: Seq[Array[Byte]] = Seq(null, Array.emptyByteArray, seed) ++
      (0 until 300).map { i =>
        if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(a); a }
        else {
          val base = seed.clone()
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte)
          base.take(1 + rnd.nextInt(base.length))
        }
      }
    val df = payloads.toDF("x")
    sweep1("mkv_meta", df,
      payloads.map(p => if (p == null) nullLit(BinaryType) else lit(p)),
      exprs.mkv_meta)
  }
}
