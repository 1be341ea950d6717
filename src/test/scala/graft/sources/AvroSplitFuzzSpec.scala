package graft.sources

import java.nio.file.Files

import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for the DSv2 split planner the way ExprFuzzSpec fuzzes
  * expressions: container files with RANDOMIZED record sizes and sync
  * (block) intervals — so block boundaries land at arbitrary byte
  * positions relative to the planner's fixed-width ranges — swept
  * across `spark.sql.files.maxPartitionBytes` settings. The invariant
  * under every (sync layout × split size) combination is exactly-once
  * delivery: each reader syncs to the first block boundary at/after
  * its range start and stops at `pastSync(end)`, so the union of
  * ranges yields every record exactly once — no loss at a boundary,
  * no double-read of a block straddling one. */
class AvroSplitFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-avro-split-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every record read exactly once across random sync layouts × split sizes") {
    val rnd = new scala.util.Random(20260814L)
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("payload").endRecord()

    (0 until 3).foreach { round =>
      val dir = Files.createTempDirectory(s"graft-avro-splitfuzz-$round").toString
      // randomized layout: sync interval 2 KB..64 KB, payloads
      // 50..5000 bytes, enough records for a multi-megabyte file
      val syncInterval = 2048 + rnd.nextInt(62 * 1024)
      val n = 4000 + rnd.nextInt(2000)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setSyncInterval(syncInterval)
      writer.create(schema, new java.io.File(s"$dir/part-00000.avro"))
      var i = 0
      while (i < n) {
        val rec = new GenericData.Record(schema)
        rec.put("id", i.toLong)
        rec.put("payload", "x" * (50 + rnd.nextInt(4951)))
        writer.append(rec)
        i += 1
      }
      writer.close()
      val fileLen = new java.io.File(s"$dir/part-00000.avro").length()
      assert(fileLen > (1L << 21),
        s"fixture too small to exercise splits: $fileLen bytes")

      // the planner clamps below 1 MB — sweep from the clamp upward,
      // including a split larger than the file (single range)
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        Seq(1L << 20, (1L << 20) + 333333L, 1L << 21, 1L << 22, 1L << 30)
          .foreach { split =>
            spark.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
            val ids = spark.read.format("graft-avro").load(dir)
              .select("id").collect().map(_.getLong(0))
            assert(ids.length == n,
              s"round $round sync=$syncInterval split=$split: " +
                s"read ${ids.length} of $n records")
            assert(ids.toSet.size == n,
              s"round $round sync=$syncInterval split=$split: duplicate reads")
          }
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
  }
}
