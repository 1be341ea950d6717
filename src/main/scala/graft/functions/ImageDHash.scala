package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Perceptual difference-hash (dHash) of a PNG payload — the image
  * near-dup signature (reference scope: the engine's near-dup family
  * extended to the image modality; the hash itself is the classic
  * dHash: grayscale → `(hashW+1) x hashH` area-average cell grid →
  * one bit per horizontally-adjacent cell pair, 1 iff the left cell
  * is brighter). A re-encoded, slightly-rescaled or noise-perturbed
  * copy of an image moves few bits, so Hamming distance over these
  * bits is the image analog of SimHash over text — and the SAME
  * banded blocking ([[graft.ops.Dedup.simhashPairsFromSigs]]) pairs
  * them at corpus scale.
  *
  * Returns the bit array (`hashW * hashH` ints, row-major) or NULL
  * for bytes that do not decode as a depth-8 non-interlaced PNG or an
  * image smaller than the cell grid — hostile payloads never throw.
  * Decode cost is the full pixel pipeline (Inflater + unfilter); gate
  * payload size upstream with [[MediaDims]] first.
  */
case class ImageDHash(child: Expression, hashW: Int, hashH: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"png_dhash expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "png_dhash"

  override protected def nullSafeEval(input: Any): Any =
    ImageDHashUtil.hash(input.asInstanceOf[Array[Byte]], hashW, hashH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageDHashUtil$$.MODULE$$.hash($c, $hashW, $hashH);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDHashUtil {
  /** NULL (not a throw) for undecodable bytes — called from generated
    * code; keep the signature stable. */
  def hash(b: Array[Byte], hashW: Int, hashH: Int): ArrayData =
    graft.ops.MediaDecode.pngDHash(b, hashW, hashH)
      .map(bits => new GenericArrayData(bits.map(Int.box: Int => Any)))
      .orNull

  def audioHash(b: Array[Byte], nBits: Int): ArrayData =
    graft.ops.MediaDecode.wavEnergyHash(b, nBits)
      .map(bits => new GenericArrayData(bits.map(Int.box: Int => Any)))
      .orNull

  def videoHash(b: Array[Byte], nBits: Int): ArrayData =
    graft.ops.MediaDecode.mp4StructureHash(b, nBits)
      .map(bits => new GenericArrayData(bits.map(Int.box: Int => Any)))
      .orNull
}

/** Energy-envelope hash of a WAV payload — [[ImageDHash]]'s audio
  * sibling ([[graft.ops.MediaDecode.wavEnergyHash]]: nBits+1
  * equal-share PCM windows, one bit per adjacent-window loudness
  * comparison; gain-invariant). NULL for undecodable bytes or fewer
  * frames than windows — hostile payloads never throw. */
case class AudioEnergyHash(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wav_energy_hash expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_energy_hash"

  override protected def nullSafeEval(input: Any): Any =
    ImageDHashUtil.audioHash(input.asInstanceOf[Array[Byte]], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageDHashUtil$$.MODULE$$.audioHash($c, $nBits);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Structural fingerprint of an MP4 payload — [[AudioEnergyHash]]'s
  * video sibling ([[graft.ops.MediaDecode.mp4StructureHash]]: the
  * per-sample coded-size envelope from the real stbl walk; a re-muxed
  * copy sits at Hamming 0). NULL for non-MP4 bytes or fewer samples
  * than windows. */
case class VideoStructureHash(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_structure_hash expects binary, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_structure_hash"

  override protected def nullSafeEval(input: Any): Any =
    ImageDHashUtil.videoHash(input.asInstanceOf[Array[Byte]], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageDHashUtil$$.MODULE$$.videoHash($c, $nBits);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object imageExprs {
  def png_dhash(c: Column, hashW: Int = 8, hashH: Int = 8): Column =
    Bridge.toColumn(ImageDHash(Bridge.toExpression(c), hashW, hashH))
  def wav_energy_hash(c: Column, nBits: Int = 64): Column =
    Bridge.toColumn(AudioEnergyHash(Bridge.toExpression(c), nBits))
  def mp4_structure_hash(c: Column, nBits: Int = 64): Column =
    Bridge.toColumn(VideoStructureHash(Bridge.toExpression(c), nBits))
}
