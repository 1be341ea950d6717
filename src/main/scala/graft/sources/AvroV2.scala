package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Avro as a proper DataSource V2 — the architecture a custom source
  * should have at 100 TB, on top of [[Avro]]'s schema/value mapping:
  *
  *  - **Split planning**: each container file is cut into
  *    `spark.sql.files.maxPartitionBytes`-sized ranges on the DRIVER;
  *    readers `sync()` to the first block boundary inside their range
  *    and stop at `pastSync(end)` — one 10 GB file fans out across
  *    tasks, the same contract as the parquet scan.
  *  - **Column pruning**: `SupportsPushDownRequiredColumns` narrows the
  *    Avro READER schema to the referenced top-level fields, so
  *    unreferenced columns are skipped by Avro's resolver during
  *    decode, never materialized — `.explain` shows the pruned
  *    ReadSchema like any built-in source.
  *
  * Usage: `spark.read.format("graft-avro").load(dir)` (service-
  * registered short name) or [[Avro.read]].
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
    p.getOrElse(throw new IllegalArgumentException(
      "graft-avro requires a path: spark.read.format(\"graft-avro\").load(dir)"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroV2.sparkSchemaOf(
      AvroV2.probeWriterSchema(SparkSession.active, pathOf(options)))

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      pathOf(new CaseInsensitiveStringMap(properties)))
    new AvroTable(path, schema)
  }
}

private[sources] object AvroV2 {
  def probeWriterSchema(spark: SparkSession, path: String): ASchema =
    Avro.probeWriterSchema(spark, path)

  def sparkSchemaOf(a: ASchema): StructType =
    Avro.toSparkType(a, "<root>") match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"Avro root schema must be a record, got $other")
    }

  /** Reader-side projection: the writer record narrowed to `keep`
    * top-level fields (writer order, original branch schemas) — Avro's
    * resolver then SKIPS the dropped fields during decode. */
  def pruneAvroSchema(writer: ASchema, keep: Seq[String]): ASchema = {
    val keepSet = keep.toSet
    val fields = writer.getFields.asScala.toSeq
      .filter(f => keepSet.contains(f.name))
      .map(f => new ASchema.Field(f.name, f.schema, f.doc, f.defaultVal))
    ASchema.createRecord(
      writer.getName, writer.getDoc, writer.getNamespace, false, fields.asJava)
  }
}

private[sources] class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)
}

private[sources] class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required)
}

private[sources] case class AvroRange(
    file: String, start: Long, length: Long) extends InputPartition

private[sources] class AvroScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && f.getPath.getName.endsWith(".avro"))
      else Seq(st)
    }.filter(_.getLen > 0).sortBy(_.getPath.toString)
    val splitBytes = math.max(1L << 20,
      spark.sessionState.conf.filesMaxPartitionBytes)
    files.flatMap { f =>
      (0L until f.getLen by splitBytes).map { start =>
        AvroRange(f.getPath.toString, start,
          math.min(splitBytes, f.getLen - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // the TABLE-level writer schema anchors per-split reader projection;
    // per-file variation resolves through Avro schema resolution
    val writerJson = AvroV2.probeWriterSchema(spark, path).toString
    val conf = new SerializableWritable(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    new AvroReaderFactory(writerJson, required, conf)
  }
}

private[sources] class AvroReaderFactory(
    writerJson: String, required: StructType,
    conf: SerializableWritable[org.apache.hadoop.conf.Configuration])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[AvroRange]
    new AvroRangeReader(r, writerJson, required, conf.value)
  }
}

private[sources] class AvroRangeReader(
    range: AvroRange, writerJson: String, required: StructType,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val readerSchema = AvroV2.pruneAvroSchema(
    new ASchema.Parser().parse(writerJson), required.fieldNames.toSeq)
  private val reader = {
    val in = new FsInput(new Path(range.file), conf)
    val r = DataFileReader.openReader(
      in, new GenericDatumReader[GenericRecord](null, readerSchema))
    r.sync(range.start) // first block boundary at/after the range start
    r
  }
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)
  private val end = range.start + range.length
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (reader.hasNext && !reader.pastSync(end)) {
      val rec = reader.next()
      current = toCatalyst(Avro.recordToRow(rec, required, readerSchema))
        .asInstanceOf[InternalRow]
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
