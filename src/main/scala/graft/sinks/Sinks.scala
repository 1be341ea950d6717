package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import java.io.{File, OutputStreamWriter, PrintWriter}
import java.nio.charset.StandardCharsets

/** Public sink contract (reference `Sink.groovy:5-12`:
  * name/attach/result/close). The declarative equivalent of
  * attach+close is a whole-frame `write`; `result` is its return value
  * — the reference's post-write row `{file, filename}` that
  * [[graft.etl.Pipeline.saveAs]] pushes downstream
  * (`Pipeline.groovy:833-844`).
  *
  * Single-FILE sinks are inherently single-writer: they stream the
  * frame through the driver with `toLocalIterator` (one partition in
  * memory at a time). That is the right mapping for the reference's
  * API, whose output is one local file by definition; bulk
  * distributed output goes through [[graft.etl.Pipeline.save]], which
  * writes a directory of parts in parallel.
  */
trait Sink {
  def name: String

  /** Write the frame; returns the reference's result row. */
  def write(df: DataFrame): Map[String, String]
}

/** Single-file CSV sink with the reference CSV writer's exact escaping
  * (`CSVFile.java:229-254`): every non-empty cell is ALWAYS quoted,
  * embedded `"` doubles, embedded newline becomes the literal two
  * characters `\n` (so records never span lines); null and empty cells
  * are written unquoted-empty; headers are escaped like cells
  * (`CSVFile.java:184-191`: column order frozen from the schema).
  * Optional UTF-8 BOM for Excel (`CSVFile.java:208-210`).
  */
final class CsvFileSink(
    path: String,
    separator: String = ",",
    columns: Seq[String] = null,
    writeBom: Boolean = false) extends Sink {

  override def name: String = new File(path).getName

  private def escape(s: String): String =
    if (s == null || s.isEmpty) ""
    else "\"" + s.replace("\"", "\"\"").replace("\n", "\\n") + "\""

  override def write(df: DataFrame): Map[String, String] = {
    val cols = if (columns == null) df.columns.toSeq else columns
    val proj = df.select(cols.map(c => col(c).cast(StringType).as(c)): _*)
    val file = new File(path)
    Option(file.getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val out = new PrintWriter(new OutputStreamWriter(
      new java.io.FileOutputStream(file), StandardCharsets.UTF_8))
    try {
      if (writeBom) out.print('\ufeff')
      out.print(cols.map(escape).mkString(separator) + "\n")
      val it = proj.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        out.print(cols.indices.map(i => escape(r.getString(i))).mkString(separator) + "\n")
      }
    } finally out.close()
    Map("file" -> path, "filename" -> file.getAbsolutePath)
  }
}

/** JSON sink in the reference's exact file format
  * (`JsonSink.groovy:40-66,77-82`): array mode writes `[`, one object
  * per line each terminated by `,`, then `\n]` — including the
  * reference's trailing-comma-before-close quirk, reproduced verbatim
  * for byte parity with files the reference produces;
  * `jsonObjectPerLine` writes plain JSONL. Null fields are kept
  * (Groovy JsonOutput parity — Spark's default drops them). */
final class JsonFileSink(
    path: String,
    columns: Seq[String] = null,
    jsonObjectPerLine: Boolean = false) extends Sink {

  override def name: String = new File(path).getName

  override def write(df: DataFrame): Map[String, String] = {
    val cols = if (columns == null) df.columns.toSeq else columns
    val json = df.select(to_json(
      struct(cols.map(col): _*),
      new java.util.HashMap[String, String] {
        put("ignoreNullFields", "false")
      }).as("j"))
    val file = new File(path)
    Option(file.getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val w = java.nio.file.Files.newBufferedWriter(file.toPath, StandardCharsets.UTF_8)
    try {
      if (!jsonObjectPerLine) w.write("[\n")
      val it = json.toLocalIterator()
      while (it.hasNext) {
        w.write(it.next().getString(0))
        w.write(if (jsonObjectPerLine) "\n" else ",\n")
      }
      if (!jsonObjectPerLine) w.write("\n]")
    } finally w.close()
    Map("file" -> path, "filename" -> file.getAbsolutePath)
  }
}
