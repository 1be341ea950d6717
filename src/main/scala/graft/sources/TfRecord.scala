package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.etl.Pipeline

/** TFRecord + `tf.Example` — the shard format ML dataloaders consume —
  * as a pure-JDK source/sink: the record framing is
  * `u64le length · masked-crc32c(length) · payload · masked-crc32c(payload)`
  * (CRC32C from `java.util.zip`, TensorFlow's mask constant), and the
  * payload is a hand-encoded `tf.Example` protobuf (public wire
  * format: Example→Features→map<string, Feature{bytes_list |
  * float_list | int64_list}>). No TensorFlow, no protobuf-java.
  *
  * This is the EXPORT surface of a training pipeline: after dedup /
  * decontamination / mixing / packing, shards leave Spark as
  * `part-NNNNN.tfrecord` files a `tf.data.TFRecordDataset` (or any
  * TFRecord reader) consumes directly. Writes run under the shared
  * staged commit ([[StagedCommit]]).
  *
  * Scale shape: one container per partition on write (shard count =
  * upstream partitioning — use `repartition(nShards)` or
  * [[graft.ops.Packing]] to size shards). TFRecord carries no sync
  * markers, so files are NOT byte-splittable — the read path assigns
  * ONE FILE PER TASK (the standard TFRecord practice: parallelism
  * comes from shard count, which the writer controls).
  *
  * Type mapping (the `tf.Example` universe is three list kinds):
  * string→bytes_list(utf8), binary→bytes_list, byte/short/int/long/
  * boolean→int64_list, float→float_list, double→float_list
  * (FLOAT32 — tf.Example has no double list; the narrowing is
  * documented and spec-pinned), arrays of those→multi-value lists.
  * NULL values write NO feature; absent features read back as NULL
  * (the TF convention). Other types are rejected loudly at plan time.
  *
  * Corruption policy mirrors the archive sources: strict read fails
  * typed on a bad CRC or truncated frame; `lenient = true` keeps the
  * records decoded before the corruption (one bad shard in a crawl
  * must not kill the job).
  */
object TfRecord {

  // ------------------------------------------------------------ framing

  /** TensorFlow's masked CRC32C: rotate right 15, add the mask. */
  private[sources] def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u64le(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def readU32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readU64le(b: Array[Byte], off: Int): Long =
    (0 until 8).map(i => (b(off + i) & 0xffL) << (8 * i)).reduce(_ | _)

  private[sources] def frame(payload: Array[Byte]): Array[Byte] = {
    val len = u64le(payload.length.toLong)
    len ++ u32le(maskedCrc(len, 0, 8)) ++ payload ++
      u32le(maskedCrc(payload, 0, payload.length))
  }

  /** Split a file's bytes into record payloads. Strict: typed
    * IOException on truncation or CRC mismatch; lenient: stop at the
    * first bad frame keeping the records before it. */
  private[sources] def deframe(
      bytes: Array[Byte], lenient: Boolean): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    def fail(msg: String): Seq[Array[Byte]] =
      if (lenient) out.result()
      else throw new java.io.IOException(s"corrupt tfrecord at byte $off: $msg")
    while (off < bytes.length) {
      if (off + 12 > bytes.length) return fail("truncated length frame")
      val len = readU64le(bytes, off)
      if (readU32le(bytes, off + 8) != maskedCrc(bytes, off, 8))
        return fail("length CRC mismatch")
      if (len < 0 || len > bytes.length - off - 16)
        return fail(s"declared length $len overruns the file")
      val dataOff = off + 12
      val payload = java.util.Arrays.copyOfRange(
        bytes, dataOff, dataOff + len.toInt)
      if (readU32le(bytes, dataOff + len.toInt) !=
        maskedCrc(payload, 0, payload.length))
        return fail("payload CRC mismatch")
      out += payload
      off = dataOff + len.toInt + 4
    }
    out.result()
  }

  // ------------------------------------------- protobuf wire encoding

  private def varint(v: Long): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var x = v
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x = x >>> 7
      more = x != 0
      out += (if (more) (b | 0x80).toByte else b.toByte)
    }
    out.result()
  }

  private def lenDelim(fieldTag: Int, body: Array[Byte]): Array[Byte] =
    varint(((fieldTag << 3) | 2).toLong) ++ varint(body.length.toLong) ++ body

  private def bytesListFeature(values: Seq[Array[Byte]]): Array[Byte] =
    // Feature.bytes_list = 1; BytesList.value = 1 (repeated bytes)
    lenDelim(1, values.toArray.flatMap(v => lenDelim(1, v)))

  private def floatListFeature(values: Seq[Float]): Array[Byte] = {
    // Feature.float_list = 2; FloatList.value = 1 [packed]
    val packed = new Array[Byte](values.length * 4)
    values.zipWithIndex.foreach { case (f, i) =>
      val bits = java.lang.Float.floatToIntBits(f)
      packed(i * 4) = (bits & 0xff).toByte
      packed(i * 4 + 1) = ((bits >> 8) & 0xff).toByte
      packed(i * 4 + 2) = ((bits >> 16) & 0xff).toByte
      packed(i * 4 + 3) = ((bits >> 24) & 0xff).toByte
    }
    lenDelim(2, lenDelim(1, packed))
  }

  private def int64ListFeature(values: Seq[Long]): Array[Byte] =
    // Feature.int64_list = 3; Int64List.value = 1 [packed varint]
    lenDelim(3, lenDelim(1, values.toArray.flatMap(varint)))

  /** One row → serialized tf.Example. */
  private[sources] def encodeExample(
      row: Row, schema: StructType): Array[Byte] = {
    val entries = mutable.ArrayBuilder.make[Byte]
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val feature: Array[Byte] = (f.dataType, row.get(i)) match {
          case (StringType, v: String) =>
            bytesListFeature(Seq(v.getBytes("UTF-8")))
          case (BinaryType, v: Array[Byte]) => bytesListFeature(Seq(v))
          case (LongType, v: Long) => int64ListFeature(Seq(v))
          case (IntegerType, v: Int) => int64ListFeature(Seq(v.toLong))
          case (ShortType, v: Short) => int64ListFeature(Seq(v.toLong))
          case (ByteType, v: Byte) => int64ListFeature(Seq(v.toLong))
          case (BooleanType, v: Boolean) =>
            int64ListFeature(Seq(if (v) 1L else 0L))
          case (FloatType, v: Float) => floatListFeature(Seq(v))
          case (DoubleType, v: Double) => floatListFeature(Seq(v.toFloat))
          case (ArrayType(et, _), v: scala.collection.Seq[_]) => et match {
            case StringType => bytesListFeature(
              v.map(x => x.asInstanceOf[String].getBytes("UTF-8")).toSeq)
            case BinaryType =>
              bytesListFeature(v.map(_.asInstanceOf[Array[Byte]]).toSeq)
            case LongType => int64ListFeature(v.map(_.asInstanceOf[Long]).toSeq)
            case IntegerType =>
              int64ListFeature(v.map(_.asInstanceOf[Int].toLong).toSeq)
            case FloatType => floatListFeature(v.map(_.asInstanceOf[Float]).toSeq)
            case DoubleType =>
              floatListFeature(v.map(_.asInstanceOf[Double].toFloat).toSeq)
            case other => throw new IllegalArgumentException(
              s"tfrecord: unsupported array element type ${other.simpleString}")
          }
          case (dt, _) => throw new IllegalArgumentException(
            s"tfrecord: unsupported type ${dt.simpleString} for column ${f.name}")
        }
        // Features.feature map entry: key = 1 (string), value = 2 (Feature)
        val entry = lenDelim(1, f.name.getBytes("UTF-8")) ++ lenDelim(2, feature)
        entries ++= lenDelim(1, entry)
      }
    }
    // Example.features = 1
    lenDelim(1, entries.result())
  }

  // ------------------------------------------- protobuf wire decoding

  private final class PbReader(b: Array[Byte], var off: Int, val end: Int) {
    def hasMore: Boolean = off < end
    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        if (off >= end) throw new java.io.IOException("tfrecord: truncated varint")
        val x = b(off) & 0xff
        off += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new java.io.IOException("tfrecord: varint overflow")
      }
      v
    }
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def sub(): PbReader = {
      val len = readVarint()
      if (len < 0 || len > end - off)
        throw new java.io.IOException("tfrecord: length overruns message")
      val r = new PbReader(b, off, off + len.toInt)
      off += len.toInt
      r
    }
    def slice(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || len > end - off)
        throw new java.io.IOException("tfrecord: length overruns message")
      val out = java.util.Arrays.copyOfRange(b, off, off + len.toInt)
      off += len.toInt
      out
    }
    def readFixed32(): Int = {
      if (end - off < 4) throw new java.io.IOException("tfrecord: truncated fixed32")
      val v = readU32le(b, off)
      off += 4
      v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(); ()
      case 1 =>
        if (end - off < 8) throw new java.io.IOException("tfrecord: truncated fixed64")
        off += 8
      case 2 => slice(); ()
      case 5 => readFixed32(); ()
      case other => throw new java.io.IOException(s"tfrecord: wire type $other")
    }
  }

  private[sources] sealed trait FeatureValue
  private[sources] case class BytesValues(v: Seq[Array[Byte]]) extends FeatureValue
  private[sources] case class FloatValues(v: Seq[Float]) extends FeatureValue
  private[sources] case class Int64Values(v: Seq[Long]) extends FeatureValue

  private def decodeFeature(r: PbReader): FeatureValue = {
    var out: FeatureValue = null
    while (r.hasMore) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (1, 2) => // BytesList
          val bl = r.sub()
          val vs = Seq.newBuilder[Array[Byte]]
          while (bl.hasMore) {
            val (f2, w2) = bl.readTag()
            if (f2 == 1 && w2 == 2) vs += bl.slice() else bl.skip(w2)
          }
          out = BytesValues(vs.result())
        case (2, fwt) => // FloatList: packed (len-delim) or repeated fixed32
          fwt match {
            case 2 =>
              val fl = r.sub()
              val vs = Seq.newBuilder[Float]
              // one level in: value = 1 packed OR repeated
              while (fl.hasMore) {
                val (f2, w2) = fl.readTag()
                if (f2 == 1 && w2 == 2) {
                  val packed = fl.sub()
                  while (packed.hasMore)
                    vs += java.lang.Float.intBitsToFloat(packed.readFixed32())
                } else if (f2 == 1 && w2 == 5) {
                  vs += java.lang.Float.intBitsToFloat(fl.readFixed32())
                } else fl.skip(w2)
              }
              out = FloatValues(vs.result())
            case other => r.skip(other)
          }
        case (3, 2) => // Int64List: packed or repeated varint
          val il = r.sub()
          val vs = Seq.newBuilder[Long]
          while (il.hasMore) {
            val (f2, w2) = il.readTag()
            if (f2 == 1 && w2 == 2) {
              val packed = il.sub()
              while (packed.hasMore) vs += packed.readVarint()
            } else if (f2 == 1 && w2 == 0) {
              vs += il.readVarint()
            } else il.skip(w2)
          }
          out = Int64Values(vs.result())
        case (_, w) => r.skip(w)
      }
    }
    out
  }

  /** Serialized tf.Example → (feature name → value). `wanted = null`
    * decodes everything; a non-null set decodes ONLY those features —
    * a shard often carries many features per record, and a 2-column
    * read must not pay for the other 28 (the entry's value bytes are
    * sliced but never parsed). */
  private[sources] def decodeExample(
      payload: Array[Byte],
      wanted: java.util.Set[String] = null): Map[String, FeatureValue] = {
    val out = Map.newBuilder[String, FeatureValue]
    val ex = new PbReader(payload, 0, payload.length)
    while (ex.hasMore) {
      val (field, wt) = ex.readTag()
      if (field == 1 && wt == 2) { // Features
        val fs = ex.sub()
        while (fs.hasMore) {
          val (f2, w2) = fs.readTag()
          if (f2 == 1 && w2 == 2) { // map entry
            val entry = fs.sub()
            var key: String = null
            var valueReader: PbReader = null
            while (entry.hasMore) {
              val (f3, w3) = entry.readTag()
              if (f3 == 1 && w3 == 2) key = new String(entry.slice(), "UTF-8")
              else if (f3 == 2 && w3 == 2) valueReader = entry.sub()
              else entry.skip(w3)
            }
            if (key != null && valueReader != null &&
              (wanted == null || wanted.contains(key)))
              out += key -> decodeFeature(valueReader)
          } else fs.skip(w2)
        }
      } else ex.skip(wt)
    }
    out.result()
  }

  private def toCell(
      fv: Option[FeatureValue], dt: DataType, name: String): Any = fv match {
    case None => null
    // a present-but-empty Feature (no bytes/float/int64 kind set) decodes
    // to null — treat it as an absent feature, not a kind mismatch
    case Some(null) => null
    case Some(v) => (dt, v) match {
      case (StringType, BytesValues(bs)) =>
        bs.headOption.map(new String(_, "UTF-8")).orNull
      case (BinaryType, BytesValues(bs)) => bs.headOption.orNull
      case (LongType, Int64Values(is)) => is.headOption.map(Long.box).orNull
      case (IntegerType, Int64Values(is)) =>
        is.headOption.map(l => Int.box(l.toInt)).orNull
      case (BooleanType, Int64Values(is)) =>
        is.headOption.map(l => Boolean.box(l != 0)).orNull
      case (FloatType, FloatValues(fs)) => fs.headOption.map(Float.box).orNull
      case (DoubleType, FloatValues(fs)) =>
        fs.headOption.map(f => Double.box(f.toDouble)).orNull
      case (ArrayType(StringType, _), BytesValues(bs)) =>
        bs.map(new String(_, "UTF-8"))
      case (ArrayType(BinaryType, _), BytesValues(bs)) => bs
      case (ArrayType(LongType, _), Int64Values(is)) => is
      case (ArrayType(IntegerType, _), Int64Values(is)) => is.map(_.toInt)
      case (ArrayType(FloatType, _), FloatValues(fs)) => fs
      case (ArrayType(DoubleType, _), FloatValues(fs)) => fs.map(_.toDouble)
      case (other, got) => throw new java.io.IOException(
        s"tfrecord: feature $name holds ${got.getClass.getSimpleName} " +
          s"but the read schema asks for ${other.simpleString}")
    }
  }

  // ------------------------------------------------------------ API

  /** Write `df` as TFRecord shards of tf.Example rows, one
    * `part-NNNNN.tfrecord[.gz]` per partition under `dir`, staged
    * commit. Shard count = `df`'s partitioning (repartition
    * upstream). `gzip` writes whole-file-gzipped shards — the
    * `tf.data.TFRecordDataset(compression_type="GZIP")` convention. */
  def write(df: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    val schema = df.schema
    // reject unsupported columns at PLAN time, not per executor row
    schema.fields.foreach { f =>
      f.dataType match {
        case StringType | BinaryType | LongType | IntegerType | ShortType |
          ByteType | BooleanType | FloatType | DoubleType => ()
        case ArrayType(StringType | BinaryType | LongType | IntegerType |
          FloatType | DoubleType, _) => ()
        case dt => throw new IllegalArgumentException(
          s"tfrecord: unsupported type ${dt.simpleString} for column " +
            s"${f.name} — tf.Example holds bytes/int64/float lists")
      }
    }
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    StagedCommit.write(df, dir, ext) { (_, rows, os) =>
      val raw = if (gzip) new java.util.zip.GZIPOutputStream(os, 1 << 16)
        else new java.io.BufferedOutputStream(os, 1 << 16)
      try rows.foreach(r => raw.write(frame(encodeExample(r, schema))))
      finally raw.close()
    }
  }

  /** Write a shuffled-sharded sequence set
    * ([[graft.ops.Packing.assignShuffledShards]]'s shape: a dense
    * `shard_id` 0..nShards−1 plus a unique `rank`) as its training
    * FILE layout: exactly ONE `part-NNNNN.tfrecord[.gz]` per shard
    * (file NNNNN = shard NNNNN), rows in rank order within the file —
    * the bijection a dataloader's `shard(i) = file(i)` contract needs.
    *
    * Hash repartitioning cannot guarantee that bijection (two shard
    * ids may fold into one task, leaving other files empty), so rows
    * are routed by a DIRECT partitioner on `shard_id` with the rank
    * sort folded into the same shuffle
    * (`repartitionAndSortWithinPartitions` — one exchange, no second
    * sort pass). `nShards` = max(shard_id)+1: one bounded scalar
    * action, and the cap below keeps a mis-assigned shard column from
    * provisioning millions of reducers. */
  def writeShardFiles(df: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    require(df.columns.contains("shard_id") && df.columns.contains("rank"),
      "writeShardFiles expects assignShuffledShards output (shard_id, rank columns)")
    val maxRow = df.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("shard_id")).cast("long")).head()
    if (maxRow.isNullAt(0)) { write(df.repartition(1), dir, gzip); return }
    val nShards = maxRow.getLong(0) + 1
    require(nShards >= 1 && nShards <= (1 << 20),
      s"writeShardFiles: $nShards shard files — raise rowsPerShard " +
        "(a shard per task AND per file; >1M files is a layout smell)")
    val schema = df.schema
    val sIdx = schema.fieldIndex("shard_id")
    val rIdx = schema.fieldIndex("rank")
    val keyed = df.rdd.map { r =>
      val sid = r.get(sIdx).asInstanceOf[Number].longValue
      val rk = r.get(rIdx).asInstanceOf[Number].longValue
      require(sid >= 0 && sid < nShards,
        s"writeShardFiles: shard_id $sid outside [0, $nShards)")
      ((sid, rk), r)
    }
    val byShard = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nShards.toInt
      override def getPartition(key: Any): Int =
        key.asInstanceOf[(Long, Long)]._1.toInt
    }
    implicit val keyOrd: Ordering[(Long, Long)] =
      Ordering.Tuple2(Ordering.Long, Ordering.Long)
    val sorted = keyed.repartitionAndSortWithinPartitions(byShard).values
    write(df.sparkSession.createDataFrame(sorted, schema), dir, gzip)
  }

  /** Read TFRecord shards of tf.Example rows back into `schema` —
    * features absent from a record read as NULL; features present
    * under a mismatching kind fail typed. One FILE per task
    * (TFRecord has no sync markers; shard count is the parallelism,
    * as the writer controls it). */
  def read(spark: SparkSession, dir: String, schema: StructType,
      lenient: Boolean = false): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord*")
      .option("recursiveFileLookup", true).load(dir)
    val pathIdx = files.schema.fieldIndex("path")
    val contentIdx = files.schema.fieldIndex("content")
    files.flatMap { fileRow =>
      val raw = fileRow.getAs[Array[Byte]](contentIdx)
      val bytes =
        if (!fileRow.getString(pathIdx).endsWith(".gz")) raw
        else {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw), 1 << 16)
          try in.readAllBytes() finally in.close()
        }
      val wanted = new java.util.HashSet[String]()
      schema.fieldNames.foreach(wanted.add)
      deframe(bytes, lenient).iterator.map { payload =>
        val features = decodeExample(payload, wanted)
        Row.fromSeq(schema.fields.toIndexedSeq.map(f =>
          toCell(features.get(f.name), f.dataType, f.name)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Pipeline-verb form of [[read]]. */
  def source(spark: SparkSession, dir: String, schema: StructType): Pipeline =
    Pipeline.of(s"tfrecord($dir)", read(spark, dir, schema))
}
