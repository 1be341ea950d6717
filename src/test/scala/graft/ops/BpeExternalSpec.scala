package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeModel

/** External-tokenizer loading: the merges/vocab file pair a real
  * training run publishes (subword-nmt word-level `merges.txt` +
  * `vocab.json`/TSV) loaded as a model whose IDS FOLLOW THE EXTERNAL
  * TABLE — plus the export round-trip (train → saveExternal →
  * loadExternal == same tokens AND ids) and the loader's
  * mismatched-file validations. */
class BpeExternalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-external-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-bpe-ext")

  private def write(dir: java.nio.file.Path, name: String, text: String): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }

  private val corpus = Seq(
    "the thin cat sat on the mat",
    "the thin hat fit that cat",
    "this fat cat sat on that hat")

  test("loadMergesTxt: header skip, rank order, CRLF, malformed lines loud") {
    val d = tmp()
    val p = write(d, "merges.txt",
      "#version: 0.2\nt h\na t</w>\r\n\nth e</w>\n")
    val m = Bpe.loadMergesTxt(spark, p)
    assert(m.toSeq == Seq("t" -> "h", "a" -> "t</w>", "th" -> "e</w>"))
    // no header is fine too
    val p2 = write(d, "m2.txt", "x y\n")
    assert(Bpe.loadMergesTxt(spark, p2).toSeq == Seq("x" -> "y"))
    // malformed: zero or two spaces
    val bad1 = write(d, "b1.txt", "xy\n")
    val e1 = intercept[IllegalArgumentException](Bpe.loadMergesTxt(spark, bad1))
    assert(e1.getMessage.contains("line 1"))
    val bad2 = write(d, "b2.txt", "a b\na b c\n")
    val e2 = intercept[IllegalArgumentException](Bpe.loadMergesTxt(spark, bad2))
    assert(e2.getMessage.contains("line 2"))
  }

  test("loadVocab: json and tsv forms; dense-id and duplicate validations loud") {
    val d = tmp()
    val j = write(d, "vocab.json", """{"<unk>":0,"a":1,"b</w>":2}""")
    assert(Bpe.loadVocab(spark, j).toSeq == Seq("<unk>", "a", "b</w>"))
    val t = write(d, "vocab.tsv", "<unk>\t0\nb</w>\t2\na\t1\n")
    assert(Bpe.loadVocab(spark, t).toSeq == Seq("<unk>", "a", "b</w>"))
    // gap in ids
    val g = write(d, "gap.json", """{"<unk>":0,"a":2}""")
    assert(intercept[IllegalArgumentException](Bpe.loadVocab(spark, g))
      .getMessage.contains("dense"))
    // duplicate id
    val di = write(d, "dupid.json", """{"<unk>":0,"a":0}""")
    assert(intercept[IllegalArgumentException](Bpe.loadVocab(spark, di))
      .getMessage.contains("duplicate id"))
    // non-integer id
    val ni = write(d, "ni.json", """{"<unk>":"zero"}""")
    intercept[IllegalArgumentException](Bpe.loadVocab(spark, ni))
  }

  test("loadExternal: ids follow the external table; unk/pad at stated slots") {
    val d = tmp()
    // hand-stated 3-merge model (creation-monotone under this
    // engine's separate-</w> symbolization) with a SCRAMBLED id order
    // and pad/unk at the END — nothing like the derived pad-0/unk-1
    // scheme
    val merges = write(d, "merges.txt", "#version: 0.2\nt </w>\na t</w>\nc at</w>\n")
    val vocab = write(d, "vocab.json",
      """{"at</w>":0,"c":1,"t</w>":2,"a":3,"cat</w>":4,"s":5,"<unk>":6,"<pad>":7}""")
    val m = Bpe.loadExternal(spark, merges, vocab)
    assert(m.unkId == 6 && m.padId == 7)
    assert(m.vocab.toSeq == Seq("at</w>", "c", "t</w>", "a", "cat</w>", "s", "<unk>", "<pad>"))
    val bc = Bpe.broadcastModel(spark, m)
    val df = Seq("cat sat qt").toDF("text")
    // cat -> cat</w> (4); sat -> s(5) at</w>(0); qt: q unseen -> unk(6), t</w>(2)
    val ids = Bpe.withTokenIds(df, "text", "ids", bc)
      .head().getAs[scala.collection.Seq[Int]]("ids")
    assert(ids == Seq(4, 5, 0, 6, 2))
    // decode inverts through the external table: unk keeps its marker,
    // pad(7) drops, out-of-range -> unk token
    val back = df.select(Bpe.decodeIds(typedLit(Seq(4, 5, 0, 6, 2, 7, 99)), bc))
      .head().getString(0)
    assert(back == "cat sat <unk>t <unk>")
    // token count runs under the loaded merges
    val n = Bpe.withTokenCount(df, "text", "n", bc).head().getAs[Int]("n")
    assert(n == 5)
  }

  test("loadExternal: pad absent -> padId -1, decode drops nothing; validations loud") {
    val d = tmp()
    val merges = write(d, "merges.txt", "a t</w>\n")
    val noPad = write(d, "v.json", """{"a":0,"t</w>":1,"at</w>":2,"<unk>":3}""")
    val m = Bpe.loadExternal(spark, merges, noPad)
    assert(m.padId == -1)
    val bc = Bpe.broadcastModel(spark, m)
    val s = Seq(1).toDF("x")
      .select(Bpe.decodeIds(typedLit(Seq(0, 1)), bc)).head().getString(0)
    assert(s == "at") // 'a' + 't</w>' -> one word, no pad dropped
    // unk missing from the vocab is loud
    val noUnk = write(d, "nu.json", """{"a":0,"t</w>":1,"at</w>":2}""")
    assert(intercept[IllegalArgumentException](
      Bpe.loadExternal(spark, merges, noUnk)).getMessage.contains("unk"))
    // a merge whose compound is missing = mismatched files, loud
    val wrong = write(d, "w.json", """{"a":0,"t</w>":1,"<unk>":2}""")
    assert(intercept[IllegalArgumentException](
      Bpe.loadExternal(spark, merges, wrong)).getMessage.contains("not the same tokenizer"))
  }

  test("round-trip: train -> saveExternal -> loadExternal == identical tokens AND ids") {
    val d = tmp()
    val df = corpus.toDF("text")
    val trained = Bpe.train(df, "text", numMerges = 10)
    val mp = d.resolve("merges.txt").toString
    val vp = d.resolve("vocab.json").toString
    Bpe.saveExternal(spark, trained, mp, vp)
    val loaded = Bpe.loadExternal(spark, mp, vp)
    // the exported vocab states the derived ids verbatim
    assert(loaded.vocab.toSeq == trained.vocab.toSeq)
    assert(loaded.padId == 0 && loaded.unkId == 1)
    assert(loaded.merges.toSeq == trained.merges.toSeq)
    val bcT = Bpe.broadcastModel(spark, trained)
    val bcL = Bpe.broadcastModel(spark, loaded)
    val probe = (corpus :+ "unseen zebra words").toDF("text")
    val both = probe.select(
      Bpe.tokens(col("text"), bcT).as("t1"), Bpe.tokens(col("text"), bcL).as("t2"),
      Bpe.ids(col("text"), bcT).as("i1"), Bpe.ids(col("text"), bcL).as("i2")).collect()
    both.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("t1") == r.getAs[scala.collection.Seq[String]]("t2"))
      assert(r.getAs[scala.collection.Seq[Int]]("i1") == r.getAs[scala.collection.Seq[Int]]("i2"))
    }
    // and the full load -> encode -> decode loop reconstructs the
    // whitespace-normalized input for in-vocabulary text
    val rt = corpus.toDF("text")
      .select(col("text"),
        Bpe.decodeIds(Bpe.ids(col("text"), bcL), bcL).as("back")).collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(1)))
    // an external model refuses the parquet persistence (its ids live
    // in the vocab table) and points at saveExternal
    assert(intercept[IllegalArgumentException](
      Bpe.saveModel(spark, loaded, d.resolve("no").toString))
      .getMessage.contains("saveExternal"))
  }

  test("continuing an external model appends new compounds, freezes existing ids") {
    val d = tmp()
    val df = corpus.toDF("text")
    val base = Bpe.train(df, "text", numMerges = 6)
    val mp = d.resolve("m.txt").toString
    val vp = d.resolve("v.json").toString
    Bpe.saveExternal(spark, base, mp, vp)
    val ext = Bpe.loadExternal(spark, mp, vp)
    val grown = Bpe.extendModel(ext, df, "text", extraMerges = 4)
    // existing ids frozen (a checkpoint's embedding rows keep meaning)
    assert(grown.vocab.take(ext.vocab.length).toSeq == ext.vocab.toSeq)
    assert(grown.padId == ext.padId && grown.unkId == ext.unkId)
    assert(grown.merges.length == 10)
    // the appended ids are the new compounds in merge order
    val newCompounds = grown.merges.drop(6).map { case (l, r) => l + r }
      .filterNot(ext.vocab.toSet)
    assert(grown.vocab.drop(ext.vocab.length).toSeq == newCompounds.distinct.toSeq)
    // and the continuation merges match the derived-model continuation
    val grownDerived = Bpe.extendModel(base, df, "text", extraMerges = 4)
    assert(grown.merges.toSeq == grownDerived.merges.toSeq)
  }
}
