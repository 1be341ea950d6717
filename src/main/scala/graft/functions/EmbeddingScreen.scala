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
    def probeMember(m: Int): Unit = {
      val off = m * d
      var dot = 0.0
      var j = 0
      while (j < d) { dot += a(j) * cat.vecs(off + j); j += 1 }
      var nb = 0.0
      j = 0
      while (j < d) { val x = cat.vecs(off + j); nb += x * x; j += 1 }
      val c = dot / (normA * math.sqrt(nb))
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

object screenExprs {
  def max_catalog_cosine(
      v: Column,
      catalogBc: org.apache.spark.broadcast.Broadcast[ScreenCatalog]): Column =
    Bridge.toColumn(MaxCatalogCosine(Bridge.toExpression(v), catalogBc))
}
