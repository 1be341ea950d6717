package graft.functions

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mojibake-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val cp1252 = Charset.forName("windows-1252")
  private def mangle(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), cp1252)

  /** Deterministic scalacheck sampling (offline cache has no
    * scalatest-scalacheck bridge — same recipe as PropertiesSpec). */
  def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(1252L + i)).foreach(body)
    }

  test("canonical artifact families repair (latin-1 class, cp1252 class, double-mangle)") {
    assert(MojibakeUtil.fix("cafÃ©") == "café")
    assert(MojibakeUtil.fix("naÃ¯ve rÃ©sumÃ©") == "naïve résumé")
    // cp1252 class: curly punctuation through the 0x80-0x9F specials
    assert(MojibakeUtil.fix(mangle("it’s “quoted” — dash")) == "it’s “quoted” — dash")
    assert(MojibakeUtil.fix("â€™") == "’")
    // double mojibake repairs in two passes
    assert(MojibakeUtil.fix(mangle(mangle("déjà vu"))) == "déjà vu")
    // CJK and astral survive the round trip
    assert(MojibakeUtil.fix(mangle("中文 text")) == "中文 text")
    assert(MojibakeUtil.fix(mangle("emoji 😀!")) == "emoji 😀!")
  }

  test("clean text is untouched: ASCII, legitimate accents, real unicode") {
    for (s <- Seq("plain ascii", "café déjà vu", "naïve ß", "中文已经干净",
      "mixed café 中文", "Ã alone" /* unterminated lead byte */, "", "a§b"))
      assert(MojibakeUtil.fix(s) == s, s"'$s' must not change")
  }

  test("null/empty/ASCII fast paths through the expression, codegen plan") {
    val rows = Seq("cafÃ©", null, "", "plain", mangle("l’été")).toDF("x")
      .select(mojibakeExprs.fix_mojibake(col("x")).as("r")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("café", null, "", "plain", "l’été"))
  }

  test("property: fix(mangle(s)) == s for clean text that is not itself artifact-shaped") {
    // pool mixes ASCII, accents, cp1252 specials, CJK, astral
    val pool: Gen[String] = Gen.oneOf(
      "a", "Z", " ", "9", "é", "ü", "ñ", "ß", "’", "“", "”", "—", "…",
      "€", "中", "文", "語", "😀")
    val textGen: Gen[String] =
      Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, pool)).map(_.mkString)
    // a generated string could, by coincidence of juxtaposition, itself
    // pass the reinterpretation test (e.g. "Ã©" typed literally) — the
    // documented ambiguity. The predicate below reproduces the test
    // independently of MojibakeUtil's internals: cp1252-encodable AND
    // strictly-valid UTF-8 that decodes differently.
    def artifactShaped(s: String): Boolean = {
      val enc = try {
        val e = cp1252.newEncoder()
        if (!s.forall(c => e.canEncode(c) || c <= 0xFF)) null
        else {
          // encode char-by-char with latin-1 fallback, mirroring repair
          val out = new java.io.ByteArrayOutputStream()
          s.foreach { c =>
            if (e.canEncode(c)) out.write(new String(Array(c)).getBytes(cp1252))
            else out.write(c & 0xFF)
          }
          out.toByteArray
        }
      } catch { case _: Exception => null }
      if (enc == null) false
      else {
        val d = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try d.decode(java.nio.ByteBuffer.wrap(enc)).toString != s
        catch { case _: java.nio.charset.CharacterCodingException => false }
      }
    }
    var checked = 0
    forSamples(textGen, 400) { s =>
      if (!artifactShaped(s)) {
        checked += 1
        assert(MojibakeUtil.fix(mangle(s)) == s, s"mangle round trip of '$s'")
        if (s.exists(_ > 0x7F))
          assert(MojibakeUtil.fix(mangle(mangle(s))) == s, s"double mangle of '$s'")
      }
    }
    assert(checked > 300, s"generator degenerated: only $checked clean samples")
  }

  test("property: fix is idempotent on arbitrary generated text") {
    val pool: Gen[String] = Gen.oneOf(
      "x", "Ã", "©", "â", "€", "™", "é", "中", "😀", " ", "”")
    val textGen: Gen[String] =
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, pool)).map(_.mkString)
    forSamples(textGen, 400) { s =>
      val once = MojibakeUtil.fix(s)
      assert(MojibakeUtil.fix(once) == once, s"not idempotent on '$s' -> '$once'")
    }
  }
}
