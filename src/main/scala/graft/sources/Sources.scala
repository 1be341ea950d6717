package graft.sources

import graft.etl.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.ByteArrayInputStream

/** Source surface of the engine, mapping the reference's source family
  * (gratum `src/main/groovy/gratum/source/`) onto Spark's readers.
  *
  * XlsxSource lives in [[graft.sources.Xlsx]] (pure-JDK ZIP+StAX
  * parser), legacy xls in [[graft.sources.Xls]] (pure-JDK CFB+BIFF8
  * parser) — POI is absent in this environment but unnecessary for
  * unencrypted workbooks; the HTTP source lives in
  * [[graft.sources.Http]] (JDK HttpClient; specs run an in-process
  * server — no egress needed); the SSH/SFTP source lives in
  * [[graft.sources.Ssh]] (system OpenSSH client; the SFTP leg is
  * interop-tested against the real `sftp` binary via its `-D`
  * direct-server flag — no sshd exists here, so the network/auth leg
  * is pinned at the argv level); PGP lives in [[graft.ops.Pgp]]
  * (system GnuPG). Every SURVEY §2.10 source is now implemented.
  */
object Sources {

  /** gratum `CsvSource.csv` (CsvSource.groovy:50-165): delimiter-
    * separated file, all-STRING ingestion (typing is applied later via
    * asInt/asDouble/... steps, reference parity), optional user-supplied
    * headers for headerless files, escaping toggle.
    *
    * Spark's csv reader covers the reference parser's semantics: BOM
    * handling, quote/escape state machine (`""` unescape), ragged rows
    * padded with null (PERMISSIVE mode), multi-line quoted fields.
    */
  def csv(
      spark: SparkSession, path: String,
      separator: String = ",",
      headers: Seq[String] = null,
      escaping: Boolean = true): Pipeline = {
    val reader = spark.read
      .option("sep", separator)
      .option("header", headers == null)
      .option("inferSchema", false)
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      // the reference writer (and RFC 4180) escape quotes by DOUBLING;
      // Spark's default escape is backslash, under which `"...""..."`
      // and quote-adjacent separators misparse — pin doubling semantics
      .option("escape", "\"")
    val withQuote = if (escaping) reader else reader.option("quote", "\u0000")
    val df = withQuote.csv(path)
    val named = if (headers == null) df else df.toDF(headers: _*)
    Pipeline.of(s"csv($path)", named)
  }

  /** gratum `JsonSource.json` (JsonSource.groovy:8-107): whole-document
    * JSON (array or object). `descent` walks nested fields, exploding
    * array levels (reference `path([...])`); `includeRoot` carries the
    * whole document as a `_root_json` column. */
  def json(
      spark: SparkSession, path: String,
      descent: Seq[String] = Nil,
      includeRoot: Boolean = false): Pipeline = {
    val root = spark.read.option("multiLine", true).json(path)
    Pipeline.of(s"json($path)", descend(root, descent, includeRoot))
  }

  /** gratum `JsonSource.jsonl` (one JSON object per line). */
  def jsonl(
      spark: SparkSession, path: String,
      descent: Seq[String] = Nil,
      includeRoot: Boolean = false): Pipeline = {
    val root = spark.read.json(path)
    Pipeline.of(s"jsonl($path)", descend(root, descent, includeRoot))
  }

  private[sources] def descend(root: DataFrame, descent: Seq[String], includeRoot: Boolean): DataFrame = {
    var df =
      if (!includeRoot) root
      else root.withColumn("_root_json", to_json(struct(root.columns.toIndexedSeq.map(col): _*)))
    descent.foreach { name =>
      val rootCols = if (includeRoot) Seq(col("_root_json")) else Nil
      df.schema(name).dataType match {
        case _: ArrayType =>
          df = df.select(rootCols :+ explode(col(name)).as("__e__"): _*)
          df = df.schema("__e__").dataType match {
            case _: StructType => df.select(col("__e__.*") +: rootCols: _*)
            case _             => df // array of scalars: keep as __e__ (last level)
          }
        case _: StructType =>
          df = df.select(col(s"$name.*") +: rootCols: _*)
        case _ =>
          throw new IllegalArgumentException(s"Cannot descend into non-nested field $name")
      }
    }
    df
  }

  /** gratum `CollectionSource.from` (CollectionSource.groovy:22-55):
    * in-memory rows as maps; schema = insertion-ordered union of keys,
    * types from the first non-null value per key. */
  def collection(spark: SparkSession, rows: Seq[Map[String, Any]]): Pipeline = {
    val keys = rows.flatMap(_.keys).distinct
    def typeOf(v: Any): DataType = v match {
      case _: Int | _: java.lang.Integer => IntegerType
      case _: Long | _: java.lang.Long => LongType
      case _: Double | _: java.lang.Double => DoubleType
      case _: Boolean | _: java.lang.Boolean => BooleanType
      case _ => StringType
    }
    val schema = StructType(keys.map { k =>
      val sample = rows.flatMap(_.get(k)).find(_ != null)
      StructField(k, sample.map(typeOf).getOrElse(StringType), nullable = true)
    })
    val data = rows.map(m => Row.fromSeq(keys.map(k => m.get(k).orNull)))
    Pipeline.of("collection",
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema))
  }

  /** Columnar-format sources (beyond the reference's file families —
    * a Spark-native pipeline's tables live in parquet/ORC). Typed
    * schema travels with the file; no asInt/asDate re-typing needed. */
  def parquet(spark: SparkSession, path: String): Pipeline =
    graft.etl.Pipeline.of(path, spark.read.parquet(path))

  def orc(spark: SparkSession, path: String): Pipeline =
    graft.etl.Pipeline.of(path, spark.read.orc(path))

  /** gratum `FileSystemSource.files` (FileSystemSource.groovy:20-99):
    * recursive binary file rows {path, modificationTime, length,
    * content}. Regex filter via `pathGlobFilter`. */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*"): Pipeline =
    Pipeline.of(s"files($dir)",
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", true)
        .load(dir))

  private val entrySchema = StructType(Seq(
    StructField("path", StringType),
    StructField("entry", StringType),
    StructField("size", LongType),
    StructField("content", BinaryType)))

  /** Lazy (name, content) iterator over one archive's entries with the
    * crawl-grade corruption policy applied: `lenient = false` lets the
    * underlying format exception propagate (typed: ZipException /
    * ArchiveException / IOException — a deliberate-ingest contract
    * where one bad file SHOULD fail the load, the reference behavior);
    * `lenient = true` stops that archive's iteration at the first
    * corrupt entry, KEEPING entries already decoded — at 100 TB one
    * truncated archive in a million must not kill the job. Corruption
    * mid-entry (truncated deflate stream) is caught the same way as
    * corruption between entries. */
  private def entryIter(
      fetch: () => (String, Array[Byte]), lenient: Boolean): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextVal: (String, Array[Byte]) = _
      private var done = false
      // NOTE: the producer must not be named `next` — inside this
      // anonymous class the Iterator's own next() shadows an outer
      // parameter of that name, and advance() would recurse into
      // itself (found as a StackOverflowError by CorruptArchiveSpec)
      private def advance(): Unit =
        if (!done && nextVal == null) {
          try { nextVal = fetch(); if (nextVal == null) done = true }
          catch {
            case _: java.io.IOException if lenient => done = true
            case _: org.apache.commons.compress.archivers.ArchiveException
              if lenient => done = true
          }
        }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): (String, Array[Byte]) = {
        advance()
        if (done) throw new NoSuchElementException
        val v = nextVal; nextVal = null; v
      }
    }

  /** gratum `ZipSource.unzip` (ZipSource.groovy:11-39): one row per zip
    * entry. Executor-side extraction over binaryFile rows — each
    * archive is processed where its bytes land, no driver funnel.
    * Memory bound: one whole archive per task (inherent to Spark's
    * binaryFile format, capped by
    * `spark.sql.sources.binaryFile.maxLength`) plus ONE entry at a
    * time — the entry iterator is lazy, entries are never collected.
    * `lenient` applies the crawl-grade corruption policy of
    * [[entryIter]] (default strict — the reference contract). */
  def zipEntries(spark: SparkSession, dir: String, glob: String = "*.zip",
      lenient: Boolean = false): Pipeline = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).option("recursiveFileLookup", true).load(dir)
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    val df = files.flatMap { row =>
      val path = row.getString(pathIdx)
      val bytes = row.getAs[Array[Byte]](contentIdx)
      val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
      entryIter(() => {
        var e = zin.getNextEntry
        while (e != null && e.isDirectory) e = zin.getNextEntry
        if (e == null) null else (e.getName, zin.readAllBytes())
      }, lenient).map { case (name, content) =>
        Row(path, name, content.length.toLong, content)
      }
    }(org.apache.spark.sql.Encoders.row(entrySchema))
    Pipeline.of(s"unzip($dir)", df)
  }

  /** gratum `ArchivedSource.unarchive` (ArchivedSource.groovy:53-105):
    * any commons-compress-detectable archive format (zip/tar/ar/...),
    * one row per entry, auto-detected per file on the executor.
    * `lenient` additionally skips files whose FORMAT cannot be
    * detected at all (a misnamed or garbage file in the glob),
    * besides the per-entry policy of [[entryIter]]. */
  def archiveEntries(spark: SparkSession, dir: String, glob: String = "*",
      lenient: Boolean = false): Pipeline = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).option("recursiveFileLookup", true).load(dir)
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    val df = files.flatMap { row =>
      val path = row.getString(pathIdx)
      val bytes = row.getAs[Array[Byte]](contentIdx)
      import org.apache.commons.compress.archivers.{ArchiveEntry, ArchiveInputStream, ArchiveStreamFactory}
      val opened: Option[ArchiveInputStream[_ <: ArchiveEntry]] =
        try Some(new ArchiveStreamFactory().createArchiveInputStream(
          new java.io.BufferedInputStream(new ByteArrayInputStream(bytes))))
        catch {
          case e: org.apache.commons.compress.archivers.ArchiveException =>
            if (lenient) None else throw e
        }
      opened match {
        case None => Iterator.empty
        case Some(in) =>
          entryIter(() => {
            var e: ArchiveEntry = in.getNextEntry
            while (e != null && e.isDirectory) e = in.getNextEntry
            if (e == null) null else (e.getName, in.readAllBytes())
          }, lenient).map { case (name, content) =>
            Row(path, name, content.length.toLong, content)
          }
      }
    }(org.apache.spark.sql.Encoders.row(entrySchema))
    Pipeline.of(s"unarchive($dir)", df)
  }

  /** gratum `ConcatSource.concat` (ConcatSource.groovy:5-33). */
  def concat(sources: Pipeline*): Pipeline =
    sources.reduce(_.concatWith(_))

  /** gratum `JdbcSource.database(...).query(...)`
    * (JdbcSource.groovy:22-66): one SQL query against a JDBC database,
    * columns from the result-set metadata — exactly `spark.read.jdbc`
    * with the `query` option. `options` passes through connection
    * properties (user, password, driver, fetchsize, partitionColumn/
    * lowerBound/upperBound/numPartitions for parallel reads).
    *
    * Verified end-to-end against embedded Derby (on the Spark
    * classpath) in JdbcSpec; any other database needs only its driver
    * jar on the cluster classpath. */
  def jdbc(
      spark: SparkSession, url: String, query: String,
      options: Map[String, String] = Map.empty): Pipeline =
    Pipeline.of(s"jdbc($url)",
      spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .options(options)
        .load())
}
