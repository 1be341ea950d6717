package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registration of graft's native expressions for SQL use. */
object GraftFunctions {

  private def buildMinHash(args: Seq[Expression]): Expression = args match {
    case Seq(child) => MinHashSig(child, 64)
    case Seq(child, Literal(n: Int, _)) => MinHashSig(child, n)
    case _ => throw new IllegalArgumentException(
      "minhash_sig(array<string>[, numHashes literal]) expects 1 or 2 arguments")
  }

  private def buildMediaDims(args: Seq[Expression]): Expression = args match {
    case Seq(child) => MediaDims(child)
    case _ => throw new IllegalArgumentException(
      "media_dims(binary) expects exactly 1 argument")
  }

  private def buildMp4Meta(args: Seq[Expression]): Expression = args match {
    case Seq(child) => Mp4Meta(child)
    case _ => throw new IllegalArgumentException(
      "mp4_meta(binary) expects exactly 1 argument")
  }

  private def buildMp4Samples(args: Seq[Expression]): Expression = args match {
    case Seq(child) => Mp4Samples(child)
    case _ => throw new IllegalArgumentException(
      "mp4_samples(binary) expects exactly 1 argument")
  }

  private def buildMp3Meta(args: Seq[Expression]): Expression = args match {
    case Seq(child) => Mp3Meta(child)
    case _ => throw new IllegalArgumentException(
      "mp3_meta(binary) expects exactly 1 argument")
  }

  private def buildOggMeta(args: Seq[Expression]): Expression = args match {
    case Seq(child) => OggMeta(child)
    case _ => throw new IllegalArgumentException(
      "ogg_meta(binary) expects exactly 1 argument")
  }

  private def buildMkvMeta(args: Seq[Expression]): Expression = args match {
    case Seq(child) => MkvMeta(child)
    case _ => throw new IllegalArgumentException(
      "mkv_meta(binary) expects exactly 1 argument")
  }

  private def buildFixMojibake(args: Seq[Expression]): Expression = args match {
    case Seq(child) => FixMojibake(child)
    case _ => throw new IllegalArgumentException(
      "fix_mojibake(string) expects exactly 1 argument")
  }

  private def buildVecMaxAbs(args: Seq[Expression]): Expression = args match {
    case Seq(child) => VecMaxAbs(child)
    case _ => throw new IllegalArgumentException(
      "vec_max_abs(array<double>) expects exactly 1 argument")
  }

  private def buildQuantizeI8(args: Seq[Expression]): Expression = args match {
    case Seq(v, s) => QuantizeI8(v, s)
    case _ => throw new IllegalArgumentException(
      "quantize_i8(array<double>, scale double) expects exactly 2 arguments")
  }

  private def buildCosineSimI8(args: Seq[Expression]): Expression = args match {
    case Seq(q, c) => CosineSimI8(q, c)
    case _ => throw new IllegalArgumentException(
      "cosine_sim_i8(array<double>, array<tinyint>) expects exactly 2 arguments")
  }

  private def buildPlaneProject(args: Seq[Expression]): Expression = args match {
    case Seq(v, p, f) => PlaneProject(v, p, f)
    case _ => throw new IllegalArgumentException(
      "plane_project(array<double>, array<array<double>>, factor double) expects exactly 3 arguments")
  }

  private def buildZOrder(args: Seq[Expression]): Expression = args match {
    case Literal(bits: Int, _) +: dims if dims.size >= 2 => ZOrderKey(dims, bits)
    case _ => throw new IllegalArgumentException(
      "zorder_key(bits literal, dim1 bigint, dim2 bigint, ...) expects a literal bit width and 2..6 dimensions")
  }

  /** (name, info, builder) for every SQL-registered expression — one
    * list feeding both the live-session registrar and the
    * SparkSessionExtensions injection so they cannot drift apart. */
  private[functions] val registry: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig", new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      buildMinHash _),
    ("media_dims", new ExpressionInfo(classOf[MediaDims].getName, "media_dims"),
      buildMediaDims _),
    ("mp4_meta", new ExpressionInfo(classOf[Mp4Meta].getName, "mp4_meta"),
      buildMp4Meta _),
    ("mp4_samples", new ExpressionInfo(classOf[Mp4Samples].getName, "mp4_samples"),
      buildMp4Samples _),
    ("mp3_meta", new ExpressionInfo(classOf[Mp3Meta].getName, "mp3_meta"),
      buildMp3Meta _),
    ("ogg_meta", new ExpressionInfo(classOf[OggMeta].getName, "ogg_meta"),
      buildOggMeta _),
    ("mkv_meta", new ExpressionInfo(classOf[MkvMeta].getName, "mkv_meta"),
      buildMkvMeta _),
    ("zorder_key", new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      buildZOrder _),
    ("fix_mojibake", new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      buildFixMojibake _),
    ("vec_max_abs", new ExpressionInfo(classOf[VecMaxAbs].getName, "vec_max_abs"),
      buildVecMaxAbs _),
    ("quantize_i8", new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      buildQuantizeI8 _),
    ("cosine_sim_i8", new ExpressionInfo(classOf[CosineSimI8].getName, "cosine_sim_i8"),
      buildCosineSimI8 _),
    ("plane_project", new ExpressionInfo(classOf[PlaneProject].getName, "plane_project"),
      buildPlaneProject _))

  /** Register on a live session (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    registry.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * SparkSessionExtensions injection point (SURVEY §7 / spark_guide
  * pattern) for deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
