package graft.sources

import java.nio.file.Files

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Avro source/sink: full-fidelity roundtrip across the supported type
  * matrix, schema-aware logical-type decoding for files written by
  * OTHER writers (timestamp-millis), multi-file distributed reads, and
  * loud rejection of the unsupported corners. */
class AvroSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-avro-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-avro-$tag").toString

  test("roundtrip preserves every supported type bit-for-bit") {
    val schema = StructType(Seq(
      StructField("b", BooleanType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("tsn", TimestampNTZType),
      StructField("dec", DecimalType(18, 2)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, StringType)),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))))
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")
    val rows = Seq(
      Row(true, 7, 77L, 1.5f, 2.5, "hello", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2026-02-28"), ts,
        java.time.LocalDateTime.of(2026, 3, 1, 1, 2, 3, 123456000),
        new java.math.BigDecimal("12345.67"),
        Seq(1L, 2L, 3L), Map("a" -> "x", "b" -> "y"), Row(9, "in")),
      // every field null: the [null, T] unions must all engage
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir("roundtrip")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema == schema)
    val got = back.orderBy(col("i").asc_nulls_last).collect()
    val want = df.orderBy(col("i").asc_nulls_last).collect()
    assert(got.length == 2)
    // binary needs deep compare; everything else structural
    assert(got(0).getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 3))
    (0 until schema.length).filter(i => schema(i).name != "bin").foreach { i =>
      assert(got(0).get(i) == want(0).get(i),
        s"field ${schema(i).name}: ${got(0).get(i)} != ${want(0).get(i)}")
      assert(got(1).isNullAt(i), s"field ${schema(i).name} null lost")
    }
  }

  test("multi-partition write produces one container per partition; read sees all rows") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("id")
      .withColumn("s", concat(lit("row-"), col("id")))
      .repartition(8)
    val dir = tmpDir("multi")
    Avro.write(df, dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".avro"))
    assert(parts.length == 8)
    val back = Avro.read(spark, dir)
    assert(back.count() == 10000L)
    assert(back.agg(sum("id")).head.getLong(0) == 5000L * 10001L)
    // ingestion-shape sanity: the scan fans out over files at minimum
    assert(back.rdd.getNumPartitions >= 8)
  }

  test("timestamp-millis files from other writers decode with millis scaling") {
    // hand-write a container whose logical type is timestamp-MILLIS —
    // Avro does NOT up-convert on read, so a reader assuming micros
    // would be off by 1000x
    val fields = SchemaBuilder.record("r").fields()
      .name("id").`type`().longType().noDefault()
    val tsMillis = LogicalTypes.timestampMillis
      .addToSchema(ASchema.create(ASchema.Type.LONG))
    val schema = fields.name("ts").`type`(tsMillis).noDefault().endRecord()
    val dir = tmpDir("millis")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("id", 1L)
    rec.put("ts", 1767225600123L) // 2026-01-01 00:00:00.123 UTC in millis
    w.append(rec)
    w.close()
    val back = Avro.read(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    val got = back.head.getAs[java.sql.Timestamp]("ts")
    assert(got.toInstant == java.time.Instant.parse("2026-01-01T00:00:00.123Z"),
      s"millis logical type mis-scaled: $got")
  }

  test("enum and fixed decode as string and binary") {
    val enumS = ASchema.createEnum("color", null, null, java.util.List.of("RED", "GREEN"))
    val fixedS = ASchema.createFixed("f4", null, null, 4)
    val schema = SchemaBuilder.record("r").fields()
      .name("c").`type`(enumS).noDefault()
      .name("fx").`type`(fixedS).noDefault()
      .endRecord()
    val dir = tmpDir("enumfixed")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("c", new GenericData.EnumSymbol(enumS, "GREEN"))
    rec.put("fx", new GenericData.Fixed(fixedS, Array[Byte](9, 8, 7, 6)))
    w.append(rec)
    w.close()
    val back = Avro.read(spark, dir)
    assert(back.schema("c").dataType == StringType)
    assert(back.schema("fx").dataType == BinaryType)
    val r = back.head
    assert(r.getString(0) == "GREEN")
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](9, 8, 7, 6))
  }

  test("multi-branch unions are rejected loudly, naming the field") {
    val union = ASchema.createUnion(java.util.List.of(
      ASchema.create(ASchema.Type.STRING), ASchema.create(ASchema.Type.LONG)))
    val schema = SchemaBuilder.record("r").fields()
      .name("u").`type`(union).noDefault().endRecord()
    val dir = tmpDir("union")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("u", "either")
    w.append(rec)
    w.close()
    val e = intercept[IllegalArgumentException](Avro.read(spark, dir))
    assert(e.getMessage.contains("u"), e.getMessage)
  }

  test("empty directory and unsupported Spark types fail loudly") {
    intercept[IllegalArgumentException](
      Avro.read(spark, tmpDir("empty")))
    import spark.implicits._
    val df = Seq(1).toDF("i")
      .withColumn("ym", expr("INTERVAL '1-2' YEAR TO MONTH"))
    intercept[IllegalArgumentException](Avro.write(df, tmpDir("badtype")))
  }

  test("column pruning reaches the Avro reader schema and the plan") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("id")
      .withColumn("wide1", concat(lit("w"), col("id")))
      .withColumn("wide2", concat(lit("x"), col("id")))
      .withColumn("keep", col("id") * 2)
    val dir = tmpDir("prune")
    Avro.write(df, dir)
    val projected = Avro.read(spark, dir).select("keep")
    // plan-level: the scan's ReadSchema must mention ONLY the kept column
    val plan = projected.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<keep:bigint>"),
      s"scan not pruned:\n$plan")
    assert(!plan.contains("wide1"), s"pruned column still in scan:\n$plan")
    // value-level: pruned read decodes correctly
    assert(projected.agg(sum("keep")).head.getLong(0) == 5000L * 5001L)
    // reader-schema level: the avro-side projection drops the field
    val writer = Avro.probeWriterSchema(spark, dir)
    val pruned = AvroV2.pruneAvroSchema(writer, Seq("keep"))
    assert(pruned.getFields.size == 1 && pruned.getField("keep") != null)
  }

  test("one big container file splits across many input partitions") {
    import spark.implicits._
    // high-entropy payload: md5 hex defeats the container's deflate so
    // the single file stays well above one split
    val df = (1L to 200000L).toDF("id")
      .withColumn("pad", concat(md5(col("id").cast("string")),
        md5(concat(lit("s"), col("id")))))
      .coalesce(1) // ONE container file
    val dir = tmpDir("split")
    Avro.write(df, dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
      val back = Avro.read(spark, dir)
      assert(files.head.length > (1L << 20),
        s"fixture file too small to split: ${files.head.length}")
      assert(back.rdd.getNumPartitions > 1,
        s"single file did not split: ${back.rdd.getNumPartitions} partitions")
      // every row decodes exactly once across the splits
      assert(back.count() == 200000L)
      assert(back.agg(sum("id")).head.getLong(0) == 200000L * 200001L / 2)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("the service-registered short name loads") {
    import spark.implicits._
    val dir = tmpDir("shortname")
    Avro.write((1L to 10L).toDF("id"), dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 10L)
  }

  test("re-write with fewer partitions leaves no stale part files behind") {
    import spark.implicits._
    val dir = tmpDir("overwrite")
    Avro.write((1L to 100L).toDF("id").repartition(8), dir)
    assert(Avro.read(spark, dir).count() == 100L)
    // fewer partitions on the second write: per-file overwrite would
    // leave part-00004..00007 from the first write to be unioned in
    Avro.write((1L to 40L).toDF("id").repartition(4), dir)
    val back = Avro.read(spark, dir)
    assert(back.count() == 40L)
    assert(back.agg(max("id")).head.getLong(0) == 40L)
  }

  test("user-supplied schema wider than the writer reads unknown fields as null") {
    import spark.implicits._
    val dir = tmpDir("evolve")
    Avro.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val wider = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("added", DoubleType))) // never written
    val got = spark.read.format("graft-avro").schema(wider).load(dir)
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(got.forall(_.isNullAt(2)))
  }

  test("multi-path load reads every listed directory") {
    import spark.implicits._
    val dirA = tmpDir("multiA"); val dirB = tmpDir("multiB")
    Avro.write((1L to 5L).toDF("id"), dirA)
    Avro.write((6L to 9L).toDF("id"), dirB)
    val got = spark.read.format("graft-avro").load(dirA, dirB)
    assert(got.count() == 9L)
    assert(got.agg(sum("id")).head.getLong(0) == 45L)
  }

  test("failed write job leaves the previous data intact (staged commit)") {
    import spark.implicits._
    val dir = tmpDir("commit")
    Avro.write((1L to 50L).toDF("id"), dir)
    // a job that fails AFTER some tasks have written: the old
    // delete-then-write shape had already destroyed the previous data
    // by this point; the staged commit must leave it untouched
    val doomed = (1L to 100L).toDF("id").repartition(4)
      .select(when($"id" === 77L,
        raise_error(lit("injected task failure"))).otherwise($"id").as("id"))
    intercept[Exception] { Avro.write(doomed, dir) }
    val back = Avro.read(spark, dir)
    assert(back.count() == 50L, "previous data lost by a failed overwrite")
    assert(back.agg(max("id")).head.getLong(0) == 50L)
    // and no staging/old dirs left beside the target
    val parent = new java.io.File(dir).getParentFile
    val leftovers = parent.listFiles().map(_.getName)
      .filter(n => n.contains("-graft-staging-") || n.contains("-graft-old-"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(", ")}")
  }

  test("heterogeneous writer schemas in one directory NULL-fill per file") {
    import spark.implicits._
    val dir = tmpDir("hetero")
    // file A: (id, s); file B written later WITHOUT s and no default —
    // resolving B against A's writer schema used to throw executor-side
    Avro.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), s"$dir/a")
    Avro.write(Seq(3L, 4L).toDF("id"), s"$dir/b")
    val union = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val got = spark.read.format("graft-avro").schema(union)
      .load(s"$dir/a", s"$dir/b").orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.take(2).map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(got.drop(2).forall(_.isNullAt(1)),
      "rows from the s-less file must read s as NULL, not fail resolution")
  }

  test("gate-table roundtrip: orders through avro equals the parquet original") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val dir = tmpDir("orders")
    Avro.write(orders, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema == orders.schema)
    val a = back.orderBy("o_orderkey").collect()
    val b = orders.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }
}
