package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy-style encoding fix every web-crawl corpus
  * needs: text that was UTF-8 on the wire but got decoded as
  * windows-1252/latin-1 somewhere upstream ("cafÃ©" for
  * "café", â€™ for a right single quote) is
  * detected and restored; everything else passes through untouched.
  *
  * Detection is the standard reinterpretation test: map every char back
  * to the byte windows-1252 (falling back to latin-1) decoded it from —
  * possible only when ALL chars are single-byte decodings — and check
  * whether those bytes form strictly valid UTF-8 that decodes to
  * something different. Real language text essentially never passes
  * that test by accident (a bare accented letter is an unterminated
  * UTF-8 lead byte), so legitimate "café" survives unchanged while
  * true artifacts repair. Runs up to two passes for the
  * double-encoded case. Deliberate limitation (documented, ftfy shares
  * it): a string that legitimately consists ONLY of
  * mojibake-lookalike sequences is indistinguishable from mojibake and
  * will be "repaired".
  *
  * ASCII fast path reads the raw UTF8String bytes — the overwhelming
  * bulk of a corpus never allocates. Codegen'd static call; null in,
  * null out.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fix_mojibake expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeUtil.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MojibakeUtil$$.MODULE$$.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeUtil {

  /** char -> source byte under Java's windows-1252 decoder (single-byte
    * charset: byte j decoded exactly to chars1252(j), injective
    * including the five undefined slots Java maps to control chars). */
  private val inv: java.util.HashMap[Character, java.lang.Byte] = {
    val all = new Array[Byte](256)
    var i = 0
    while (i < 256) { all(i) = i.toByte; i += 1 }
    val s = new String(all, Charset.forName("windows-1252"))
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var j = 0
    while (j < 256) { m.put(s.charAt(j), all(j)); j += 1 }
    m
  }

  /** The byte sequence this string would have been decoded from, under
    * windows-1252 first and latin-1 (identity) for the few chars
    * outside the 1252 image; null when any char is not a single-byte
    * decoding (real multibyte text — not mojibake). */
  private[functions] def sourceBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = inv.get(c)
      if (b != null) out(i) = b.byteValue()
      else if (c <= 0xFF) out(i) = c.toByte
      else return null
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode (malformed, unmappable, and overlong all
    * REPORT — Java's decoder rejects overlongs); null when invalid. */
  private[functions] def strictUtf8(b: Array[Byte]): String =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(b)).toString
    } catch { case _: CharacterCodingException => null }

  def fix(u: UTF8String): UTF8String = {
    // ASCII fast path over the raw bytes — no String materialized
    val nb = u.numBytes()
    var i = 0
    while (i < nb) {
      if ((u.getByte(i) & 0x80) != 0) i = nb + 1 else i += 1
    }
    if (i == nb) return u
    var cur = u.toString
    var passes = 0
    var continue = true
    while (continue && passes < 2) {
      val b = sourceBytes(cur)
      val dec = if (b == null) null else strictUtf8(b)
      if (dec == null || dec == cur) continue = false
      else { cur = dec; passes += 1 }
    }
    if (passes == 0) u else UTF8String.fromString(cur)
  }

  /** JVM-side String overload (specs, JVM callers) — same single
    * definition. */
  def fix(s: String): String = fix(UTF8String.fromString(s)).toString
}

object mojibakeExprs {
  def fix_mojibake(c: Column): Column =
    Bridge.toColumn(FixMojibake(Bridge.toExpression(c)))
}
