package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.NbModel

/** Supervised corpus quality classification: closed-form multinomial
  * Naive Bayes over whitespace tokens (see [[graft.functions.NbModel]]
  * for the role, the formula, and why closed form beats SGD here).
  *
  * Scale shape mirrors [[LmScore]]: training is ONE (token, label)
  * aggregation over a model-sized labeled slice, collected behind a
  * loud bound and broadcast as primitive sorted arrays; scoring is a
  * stateless native pass that fuses into the scan, shuffles nothing,
  * and runs unchanged on streaming corpora. */
object NbClassifier {

  /** Train on `labelCol` (boolean: true = positive class). Fails
    * loudly when any label is NULL, when the vocabulary exceeds
    * `maxEntries`, or when either class has no documents (priors and
    * odds would be degenerate). */
  def train(
      df: DataFrame, textCol: String, labelCol: Column,
      maxEntries: Int = 50 * 1000 * 1000): Broadcast[NbModel] = {
    // label audit FIRST (one tiny groupBy, reused for the priors): a
    // NULL label would silently count into the negative class in the
    // token aggregate and then NPE late on the null docCounts group —
    // fail loudly naming the column instead
    val docCountRows =
      df.groupBy(labelCol.cast("boolean").as("__y")).count().collect()
    docCountRows.find(_.isNullAt(0)).foreach { r =>
      throw new IllegalArgumentException(
        s"NbClassifier.train: ${r.getLong(1)} rows have a NULL label " +
          s"($labelCol) after boolean cast — labels must be true/false; " +
          "filter or impute them before training")
    }
    val byTok = df
      .select(labelCol.cast("boolean").as("__y"),
        graft.functions.exprs.word_ngram_hash_seq(
          col(textCol).cast("string"), 1).as("__grams"))
      // explode_outer + null filter: keep the native pass out of the
      // scan filters (see removeDuplicatedSpans' plan audit)
      .select(col("__y"), explode_outer(col("__grams")).as("__h"))
      .filter(col("__h").isNotNull)
      .groupBy("__h")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__cp"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__cn"))

    val rows = byTok.limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"NbClassifier.train: vocabulary exceeds $maxEntries tokens — " +
        "train on a model-sized labeled slice (or raise maxEntries)")
    val sorted = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val docCounts = docCountRows.map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val (docsPos, docsNeg) = (docCounts.getOrElse(true, 0L), docCounts.getOrElse(false, 0L))
    require(docsPos > 0L && docsNeg > 0L,
      s"NbClassifier.train: both classes need documents (positive=$docsPos, " +
        s"negative=$docsNeg) — priors and odds are degenerate otherwise")
    df.sparkSession.sparkContext.broadcast(NbModel(
      sorted.map(_._1), sorted.map(_._2), sorted.map(_._3),
      nPos = sorted.map(_._2).sum, nNeg = sorted.map(_._3).sum,
      vocab = sorted.length.toLong, docsPos = docsPos, docsNeg = docsNeg))
  }

  /** Persist a trained model as ONE parquet table (train once on the
    * labeled slice, score any later corpus without re-reading the
    * label source — the [[LmScore.saveModel]] pattern). Layout:
    * `ord = 1` vocabulary rows (key, cp, cn); one `ord = 0` metadata
    * row carrying (docsPos, docsNeg) in (key, cp) — nPos/nNeg/vocab
    * are re-derived from the vocabulary rows on load. Rows
    * materialize EXECUTOR-side out of the existing broadcast via
    * range+map, not a driver-local LocalRelation. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      model: Broadcast[NbModel], path: String): Unit = {
    import spark.implicits._
    val vocabRows = spark.range(0, model.value.keys.length.toLong).map { i =>
      val m = model.value
      (1, m.keys(i.toInt), m.pos(i.toInt), m.neg(i.toInt))
    }
    val m = model.value
    val meta = Seq((0, m.docsPos, m.docsNeg, 0L)).toDS()
    vocabRows.unionAll(meta).toDF("ord", "key", "cp", "cn")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[saveModel]] and broadcast it. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Broadcast[NbModel] = {
    val rows = spark.read.parquet(path).select("ord", "key", "cp", "cn").collect()
    val vocab = rows.filter(_.getInt(0) == 1)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val meta = rows.find(_.getInt(0) == 0).getOrElse(
      sys.error(s"NbClassifier.loadModel: no metadata row in $path"))
    spark.sparkContext.broadcast(NbModel(
      vocab.map(_._1), vocab.map(_._2), vocab.map(_._3),
      nPos = vocab.map(_._2).sum, nNeg = vocab.map(_._3).sum,
      vocab = vocab.length.toLong,
      docsPos = meta.getLong(1), docsNeg = meta.getLong(2)))
  }

  /** Per-token log10 odds as an array column. */
  def tokenLogOdds(textCol: Column, model: Broadcast[NbModel]): Column =
    graft.functions.exprs.nb_token_log_odds(textCol, model)

  /** One row per (document, token position) with the token's log10
    * odds — the exploded, oracle-comparable form. */
  def scoreTokens(
      df: DataFrame, idCol: String, textCol: String,
      model: Broadcast[NbModel]): DataFrame = df
    .select(col(idCol), tokenLogOdds(col(textCol).cast("string"), model).as("__lo"))
    .select(col(idCol), posexplode_outer(col("__lo")).as(Seq("pos", "log_odds")))
    .filter(col("log_odds").isNotNull)

  /** Document score = prior log-odds + Σ per-token log-odds, and the
    * `>` 0 verdict. Token-less documents carry the bare prior. */
  def withNbScore(
      df: DataFrame, textCol: String, model: Broadcast[NbModel],
      as: String = "nb_score"): DataFrame = {
    val m = model.value
    val prior = math.log10(m.docsPos.toDouble / m.docsNeg.toDouble)
    val lo = tokenLogOdds(col(textCol).cast("string"), model)
    df.withColumn(as, lit(prior) + aggregate(lo, lit(0.0d), _ + _))
      .withColumn(s"${as}_positive", col(as) > 0d)
  }
}
