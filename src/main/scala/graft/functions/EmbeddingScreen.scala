package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** A driver-built, BROADCAST semantic screen over a bounded embedding
  * catalog — the stateless form of cross-corpus embedding dedup: with
  * the catalog on every executor, "does this vector near-duplicate
  * anything already shipped" becomes a per-row expression (no join, no
  * state), so the SAME filter runs on a batch corpus and on a
  * STRUCTURED STREAM unchanged (the [[graft.functions.LmModel]]
  * discipline: bounded reference side collected behind a loud guard,
  * unbounded side scored row-at-a-time).
  *
  * Banded form: members are pre-bucketed by sign-LSH band keys (the
  * band's `rowsPerBand` bits packed into a Long), and a probe cosines
  * only the members of its colliding buckets — per-row cost
  * ~nPlanes·dim + candidates·dim instead of nMembers·dim. Exact form
  * (`bands == 0`): every member is a candidate (recall 1.0 — the
  * oracle/verifier arm).
  *
  * Cosines use [[SimilarityUtil.cosine]]'s exact fold order, so the
  * screen's verdicts are bit-identical to the join-based paths and to
  * the DuckDB oracle's sequential list fold. */
final class ScreenCatalog(
    val dim: Int,
    val nMembers: Int,
    val vecs: Array[Double], // nMembers x dim, row-major
    // banded index (all empty when bands == 0 — the exact form)
    val bands: Int,
    val rowsPerBand: Int,
    val planes: Array[Double], // (bands*rowsPerBand) x dim, row-major
    val bandKeys: Array[Array[Long]], // per band, sorted
    val bandStarts: Array[Array[Int]], // per band, len = keys+1
    val bandMembers: Array[Array[Int]]) // per band, member indices
  extends Serializable {
  require(dim > 0, s"ScreenCatalog: dim must be positive, got $dim")
  require(vecs.length == nMembers * dim,
    s"ScreenCatalog: ${vecs.length} values != $nMembers x $dim")
  def banded: Boolean = bands > 0

  /** Member norms, computed ONCE per JVM on first probe (r21) — the
    * probe kernel otherwise re-walked the member vector for its norm
    * on EVERY probe row (a second dim-length pass per candidate).
    * Same accumulation order as [[SimilarityUtil.norm]], so
    * `dot/(normA*memberNorms(m))` is bit-identical to the inline
    * recomputation. @transient: derived on each executor after
    * broadcast deserialization, never shipped. */
  @transient lazy val memberNorms: Array[Double] = {
    val out = new Array[Double](nMembers)
    var m = 0
    while (m < nMembers) {
      val off = m * dim
      var nb = 0.0
      var j = 0
      while (j < dim) { val x = vecs(off + j); nb += x * x; j += 1 }
      out(m) = math.sqrt(nb)
      m += 1
    }
    out
  }
}

object ScreenCatalogUtil {

  /** Max catalog cosine for one probe vector; `null` (boxed) when the
    * catalog is empty, no bucket collides (banded form), or every
    * candidate cosine is undefined (zero norms / NaN components — the
    * [[CosineSim]] NULL discipline). A probe of the wrong dimension
    * fails loudly: that is a mis-wired pipeline, not hostile data. */
  def maxCosine(v: ArrayData, cat: ScreenCatalog): Any = {
    // an EMPTY catalog has no meaningful dimension (the builder never
    // saw a vector) — nothing can hit, so every probe is a clean miss
    if (cat.nMembers == 0) return null
    val d = cat.dim
    if (v.numElements() != d)
      throw new IllegalArgumentException(
        s"embedding_screen: probe has ${v.numElements()} dims, catalog " +
          s"has $d — the screened corpus must use the catalog's embedding model")
    val a = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      a(i) = v.getDouble(i)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < d) { val x = a(i); na += x * x; i += 1 }
    val normA = math.sqrt(na)

    var best = Double.NaN
    val memberNorms = cat.memberNorms
    def probeMember(m: Int): Unit = {
      val off = m * d
      var dot = 0.0
      var j = 0
      while (j < d) { dot += a(j) * cat.vecs(off + j); j += 1 }
      // precomputed member norm (cat.memberNorms — bit-identical to
      // the inline recomputation this replaces, r21)
      val c = dot / (normA * memberNorms(m))
      if (!java.lang.Double.isNaN(c) &&
        (java.lang.Double.isNaN(best) || c > best)) best = c
    }

    if (!cat.banded) {
      var m = 0
      while (m < cat.nMembers) { probeMember(m); m += 1 }
    } else {
      var b = 0
      while (b < cat.bands) {
        // the band's key: rowsPerBand sign bits packed MSB-first
        var key = 0L
        var r = 0
        while (r < cat.rowsPerBand) {
          val p = (b * cat.rowsPerBand + r) * d
          var dot = 0.0
          var j = 0
          while (j < d) { dot += a(j) * cat.planes(p + j); j += 1 }
          key = (key << 1) | (if (dot >= 0) 1L else 0L)
          r += 1
        }
        val pos = java.util.Arrays.binarySearch(cat.bandKeys(b), key)
        if (pos >= 0) {
          val start = cat.bandStarts(b)(pos)
          val end = cat.bandStarts(b)(pos + 1)
          var k = start
          while (k < end) { probeMember(cat.bandMembers(b)(k)); k += 1 }
        }
        b += 1
      }
    }
    if (java.lang.Double.isNaN(best)) null else Double.box(best)
  }
}

/** `max_catalog_cosine(vec)` — the per-row screen verdict under a
  * broadcast [[ScreenCatalog]]; see the catalog scaladoc. NULL when no
  * candidate collides or every candidate cosine is undefined (callers
  * screening survivors must treat NULL as "no hit"). */
case class MaxCatalogCosine(
    child: Expression,
    catalogBc: org.apache.spark.broadcast.Broadcast[ScreenCatalog])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"max_catalog_cosine expects array<double>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "max_catalog_cosine"

  override protected def nullSafeEval(input: Any): Any =
    ScreenCatalogUtil.maxCosine(input.asInstanceOf[ArrayData], catalogBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("screenCatalogBc", catalogBc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("maxCos")
      s"""
         |Object $tmp = graft.functions.ScreenCatalogUtil$$.MODULE$$.maxCosine(
         |  $c, (graft.functions.ScreenCatalog) $bcRef.value());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The media/simhash sibling of [[ScreenCatalog]]: a bounded catalog
  * of BIT signatures (dHash / energy / structure / simhash — any
  * `array<int>` of 0/1 bits), packed into 64-bit words for xor-popcount
  * Hamming. Banded form buckets members by packed `rowsPerBand`-bit
  * band keys; by PIGEONHOLE a probe within Hamming `h` of a member
  * shares at least one exact band whenever `h < bands`, so the banded
  * screen's recall is EXACTLY 1.0 at the usual (h=5, bands=8) media
  * parameters — banding here is pure speedup, not approximation. */
final class SigScreenCatalog(
    val nBits: Int,
    val nMembers: Int,
    val packed: Array[Long], // nMembers x wordsPerSig, row-major
    val bands: Int,
    val rowsPerBand: Int,
    val bandKeys: Array[Array[Long]],
    val bandStarts: Array[Array[Int]],
    val bandMembers: Array[Array[Int]])
  extends Serializable {
  require(nBits > 0, s"SigScreenCatalog: nBits must be positive, got $nBits")
  val wordsPerSig: Int = (nBits + 63) / 64
  require(packed.length == nMembers * wordsPerSig,
    s"SigScreenCatalog: ${packed.length} words != $nMembers x $wordsPerSig")
  def banded: Boolean = bands > 0
}

object SigScreenUtil {

  /** Pack an ArrayData of 0/1 ints into 64-bit words, bit i of the
    * signature at word i/64, MSB-first within the word — returns null
    * (meaning: no verdict) if any bit entry is NULL. */
  private def pack(sig: ArrayData, nBits: Int): Array[Long] = {
    val words = new Array[Long]((nBits + 63) / 64)
    var i = 0
    while (i < nBits) {
      if (sig.isNullAt(i)) return null
      val b = sig.getInt(i)
      if (b != 0) words(i / 64) |= 1L << (63 - (i % 64))
      i += 1
    }
    words
  }

  /** Min catalog Hamming distance for one probe signature; `null`
    * (boxed) when the catalog is empty, the probe has a NULL bit, or
    * (banded form) no band bucket collides. Wrong probe width fails
    * loudly — a catalog built at another signature width would
    * otherwise silently stop colliding. */
  def minHamming(sig: ArrayData, cat: SigScreenCatalog): Any = {
    if (cat.nMembers == 0) return null
    if (sig.numElements() != cat.nBits)
      throw new IllegalArgumentException(
        s"signature_screen: probe has ${sig.numElements()} bits, catalog " +
          s"has ${cat.nBits} — build catalog and probe with the same signature")
    val w = cat.wordsPerSig
    val p = pack(sig, cat.nBits)
    if (p == null) return null
    var best = Int.MaxValue
    def probeMember(m: Int): Unit = {
      val off = m * w
      var d = 0
      var j = 0
      while (j < w) {
        d += java.lang.Long.bitCount(p(j) ^ cat.packed(off + j))
        j += 1
      }
      if (d < best) best = d
    }
    if (!cat.banded) {
      var m = 0
      while (m < cat.nMembers) { probeMember(m); m += 1 }
    } else {
      var b = 0
      while (b < cat.bands) {
        var key = 0L
        var r = 0
        while (r < cat.rowsPerBand) {
          val i = b * cat.rowsPerBand + r
          key = (key << 1) |
            ((p(i / 64) >>> (63 - (i % 64))) & 1L)
          r += 1
        }
        val pos = java.util.Arrays.binarySearch(cat.bandKeys(b), key)
        if (pos >= 0) {
          val start = cat.bandStarts(b)(pos)
          val end = cat.bandStarts(b)(pos + 1)
          var k = start
          while (k < end) { probeMember(cat.bandMembers(b)(k)); k += 1 }
        }
        b += 1
      }
    }
    if (best == Int.MaxValue) null else Int.box(best)
  }
}

/** `min_catalog_hamming(sig)` — the per-row media-signature screen
  * verdict under a broadcast [[SigScreenCatalog]]. NULL = no verdict
  * (no collision / empty catalog / NULL bit): callers screening
  * survivors must treat NULL as "no hit". */
case class MinCatalogHamming(
    child: Expression,
    catalogBc: org.apache.spark.broadcast.Broadcast[SigScreenCatalog])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_catalog_hamming expects array<int>, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "min_catalog_hamming"

  override protected def nullSafeEval(input: Any): Any =
    SigScreenUtil.minHamming(input.asInstanceOf[ArrayData], catalogBc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sigScreenBc", catalogBc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("minHam")
      s"""
         |Object $tmp = graft.functions.SigScreenUtil$$.MODULE$$.minHamming(
         |  $c, (graft.functions.SigScreenCatalog) $bcRef.value());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Integer) $tmp).intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object screenExprs {
  def max_catalog_cosine(
      v: Column,
      catalogBc: org.apache.spark.broadcast.Broadcast[ScreenCatalog]): Column =
    Bridge.toColumn(MaxCatalogCosine(Bridge.toExpression(v), catalogBc))
  def min_catalog_hamming(
      sig: Column,
      catalogBc: org.apache.spark.broadcast.Broadcast[SigScreenCatalog]): Column =
    Bridge.toColumn(MinCatalogHamming(Bridge.toExpression(sig), catalogBc))
}
