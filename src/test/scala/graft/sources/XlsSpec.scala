package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Legacy-xls parity specs against the reference suite's own
  * `players.xls` fixture (produced by real Excel/POI): the counts its
  * XlsSourceTest asserts — 7 rows x 6 columns, string-typed values,
  * only the ID=7 row's `score` null, color groups green=2/blue=1/
  * purple=1 — plus startOnRow behavior. */
class XlsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-xls-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val playersXls = "/root/reference/src/test/resources/players.xls"
  private def havePlayers = new java.io.File(playersXls).exists()

  test("players.xls golden parity: shape, IDs, groups (reference XlsSourceTest)") {
    assume(havePlayers)
    val df = Xls.read(spark, playersXls).toDF
    assert(df.count() == 7)
    assert(df.columns.length == 6)
    assert(df.columns.contains("ID") && df.columns.contains("color"))
    val ids = df.select("ID").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == (1 to 7).map(_.toString).sorted)
    val colors = df.groupBy("color").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(colors("green") == 2L)
    assert(colors("blue") == 1L)
    assert(colors("purple") == 1L)
    // reference: only row ID=7 may have a null (its score cell)
    val nullRows = df.filter(df.columns.map(col(_).isNull).reduce(_ || _))
      .select("ID").collect().map(_.getString(0)).toSet
    assert(nullRows.subsetOf(Set("7")))
  }

  test("players.xls startOnRow shifts the header row") {
    assume(havePlayers)
    // startOnRow=1: the first DATA row becomes the header, 6 rows left
    val df = Xls.read(spark, playersXls, startOnRow = 1).toDF
    assert(df.count() == 6)
  }

  // ------------------------------------------------ formula-string mode

  /** Minimal BIFF8 record builders for the formula fixture (players.xls
    * carries no FORMULA records, and no tool here writes xls — the
    * OoxmlStandardSpec discipline: synthesize from the public MS-XLS
    * spec, sharing no code with the parser under test). */
  private object Biff {
    import java.nio.{ByteBuffer, ByteOrder}
    private def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def rec(id: Int, p: Array[Byte]): Array[Byte] = {
      val b = le(4 + p.length)
      b.putShort(id.toShort).putShort(p.length.toShort).put(p).array()
    }
    def bof(dt: Int): Array[Byte] =
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(dt.toShort).array())
    def boundsheet(pos: Int, name: String): Array[Byte] = {
      val chars = name.getBytes("ISO-8859-1")
      val b = le(8 + chars.length)
      b.putInt(pos).putShort(0).put(chars.length.toByte).put(0.toByte).put(chars)
      rec(0x85, b.array())
    }
    def eof: Array[Byte] = rec(0x0A, Array.empty)
    def label(row: Int, c: Int, s: String): Array[Byte] = {
      val chars = s.getBytes("ISO-8859-1")
      val b = le(9 + chars.length)
      b.putShort(row.toShort).putShort(c.toShort).putShort(0)
      b.putShort(chars.length.toShort).put(0.toByte).put(chars)
      rec(0x204, b.array())
    }
    def number(row: Int, c: Int, v: Double): Array[Byte] =
      rec(0x203, le(14).putShort(row.toShort).putShort(c.toShort)
        .putShort(0).putDouble(v).array())
    def formulaNum(row: Int, c: Int, cached: Double, rgce: Array[Byte],
        rgcb: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
      val b = le(22 + rgce.length + rgcb.length)
      b.putShort(row.toShort).putShort(c.toShort).putShort(0)
      b.putDouble(cached).putShort(0).putInt(0)
      b.putShort(rgce.length.toShort).put(rgce).put(rgcb)
      rec(0x06, b.array())
    }
    /** FORMULA whose cached result is a string (num field = the
      * 0xFFFF-marked type-0 stub; the text follows in a STRING rec). */
    def formulaStr(row: Int, c: Int, cachedText: String, rgce: Array[Byte]): Array[Byte] = {
      val b = le(22 + rgce.length)
      b.putShort(row.toShort).putShort(c.toShort).putShort(0)
      b.put(Array[Byte](0, 0, 0, 0, 0, 0, -1, -1)) // type=0 (string), 0xFFFF marker
      b.putShort(0).putInt(0)
      b.putShort(rgce.length.toShort).put(rgce)
      val chars = cachedText.getBytes("ISO-8859-1")
      val s = le(3 + chars.length)
      s.putShort(chars.length.toShort).put(0.toByte).put(chars)
      rec(0x06, b.array()) ++ rec(0x207, s.array())
    }
    // rgce token builders (value-class where classed)
    def tRef(row: Int, c: Int, rel: Boolean = true): Array[Byte] = {
      val colField = c | (if (rel) 0xC000 else 0)
      le(5).put(0x44.toByte).putShort(row.toShort).putShort(colField.toShort).array()
    }
    def tArea(r1: Int, r2: Int, c1: Int, c2: Int): Array[Byte] = {
      val b = le(9).put(0x45.toByte)
      b.putShort(r1.toShort).putShort(r2.toShort)
      b.putShort((c1 | 0xC000).toShort).putShort((c2 | 0xC000).toShort).array()
    }
    def tInt(v: Int): Array[Byte] = le(3).put(0x1E.toByte).putShort(v.toShort).array()
    def tStr(s: String): Array[Byte] = {
      val chars = s.getBytes("ISO-8859-1")
      le(3 + chars.length).put(0x17.toByte).put(chars.length.toByte)
        .put(0.toByte).put(chars).array()
    }
    def tFuncVar(cargs: Int, id: Int): Array[Byte] =
      le(4).put(0x42.toByte).put(cargs.toByte).putShort(id.toShort).array()
    def tFunc(id: Int): Array[Byte] =
      le(3).put(0x41.toByte).putShort(id.toShort).array()
    val tAdd: Array[Byte] = Array(0x03)
    val tMul: Array[Byte] = Array(0x05)
    val tConcat: Array[Byte] = Array(0x08)
    val tParen: Array[Byte] = Array(0x15)

    /** One-sheet workbook around the given sheet cell records. */
    def workbook(cellRecs: Array[Byte]*): Array[Byte] = {
      val name = "S"
      // globals size: BOF(20) + BOUNDSHEET(12 + |name|) + EOF(4)
      val globals = bof(0x05) ++ boundsheet(20 + 12 + name.length + 4, name) ++ eof
      val sheet = bof(0x10) ++ cellRecs.flatten ++ eof
      StdFixture.cfb(Seq("Workbook" -> (globals ++ sheet)))
    }

    // ---- 3-D / defined-name globals (MS-XLS 2.4.150/2.4.265/2.4.271)
    def supbookSelf(ctab: Int): Array[Byte] =
      rec(0x1AE, le(4).putShort(ctab.toShort).putShort(0x0401.toShort).array())
    def externsheet(entries: (Int, Int, Int)*): Array[Byte] =
      externsheetSplit(Int.MaxValue, entries: _*)
    /** EXTERNSHEET whose rgXTI spills into a CONTINUE record after
      * `split` entries (the >1370-entry real-file shape, miniature). */
    def externsheetSplit(split: Int, entries: (Int, Int, Int)*): Array[Byte] = {
      def pack(es: Seq[(Int, Int, Int)]): Array[Byte] = {
        val b = le(es.length * 6)
        es.foreach { case (iSup, first, last) =>
          b.putShort(iSup.toShort).putShort(first.toShort).putShort(last.toShort)
        }
        b.array()
      }
      val (head, tail) = entries.splitAt(split)
      val first = rec(0x17,
        le(2).putShort(entries.length.toShort).array() ++ pack(head))
      if (tail.isEmpty) first else first ++ rec(0x3C, pack(tail))
    }
    def lbl(name: String, builtin: Boolean = false): Array[Byte] = {
      val chars = name.getBytes("ISO-8859-1")
      val b = le(15 + chars.length)
      b.putShort(if (builtin) 0x20.toShort else 0.toShort) // grbit
      b.put(0.toByte).put(chars.length.toByte) // chKey, cch
      b.putShort(0).putShort(0).putShort(0) // cce, reserved, itab
      b.putInt(0) // 4 menu/description/help/status lengths
      b.put(0.toByte).put(chars) // XLUnicodeStringNoCch, compressed
      rec(0x18, b.array())
    }
    def tRef3d(ixti: Int, row: Int, c: Int): Array[Byte] =
      le(7).put(0x5A.toByte).putShort(ixti.toShort)
        .putShort(row.toShort).putShort((c | 0xC000).toShort).array()
    def tArea3d(ixti: Int, r1: Int, r2: Int, c1: Int, c2: Int): Array[Byte] =
      le(11).put(0x5B.toByte).putShort(ixti.toShort)
        .putShort(r1.toShort).putShort(r2.toShort)
        .putShort((c1 | 0xC000).toShort).putShort((c2 | 0xC000).toShort).array()
    def tName(index1: Int): Array[Byte] =
      le(5).put(0x43.toByte).putShort(index1.toShort).putShort(0).array()
    def tExp(rw: Int, c: Int): Array[Byte] =
      le(5).put(0x01.toByte).putShort(rw.toShort).putShort(c.toShort).array()
    def tRefN(rowOff: Int, colOff: Int,
        rowRel: Boolean = true, colRel: Boolean = true): Array[Byte] = {
      val colField = (if (colRel) (colOff & 0xFF) | 0x4000 else colOff & 0x3FFF) |
        (if (rowRel) 0x8000 else 0)
      le(5).put(0x4C.toByte).putShort(rowOff.toShort).putShort(colField.toShort).array()
    }
    def tAreaN(r1: Int, r2: Int, c1: Int, c2: Int): Array[Byte] = {
      def cf(c: Int) = ((c & 0xFF) | 0xC000).toShort
      le(9).put(0x4D.toByte).putShort(r1.toShort).putShort(r2.toShort)
        .putShort(cf(c1)).putShort(cf(c2)).array()
    }
    def shrfmla(rwFirst: Int, rwLast: Int, colFirst: Int, colLast: Int,
        rgce: Array[Byte]): Array[Byte] = {
      val b = le(10 + rgce.length)
      b.putShort(rwFirst.toShort).putShort(rwLast.toShort)
      b.put(colFirst.toByte).put(colLast.toByte)
      b.put(0.toByte).put(2.toByte) // unused, cUse
      b.putShort(rgce.length.toShort).put(rgce)
      rec(0x4BC, b.array())
    }
    def arrayRec(rwFirst: Int, colFirst: Int,
        rgce: Array[Byte] = Array.emptyByteArray,
        rgcb: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
      val b = le(16 + rgce.length + rgcb.length)
      b.putShort(rwFirst.toShort).putShort(rwFirst.toShort)
      b.put(colFirst.toByte).put(colFirst.toByte)
      b.putShort(0).putInt(0) // flags, chn
      b.putShort(rgce.length.toShort).put(rgce).put(rgcb)
      rec(0x221, b.array())
    }
    /** tArray token (7 unused operand bytes; values ride rgcb). */
    val tArray: Array[Byte] = Array[Byte](0x40, 0, 0, 0, 0, 0, 0, 0)
    /** SerArray rgcb block: values row-major, each (type, payload). */
    def serArray(cols: Int, rows: Int, values: Seq[Any]): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(cols - 1)
      buf.write((rows - 1) & 0xFF); buf.write(((rows - 1) >> 8) & 0xFF)
      values.foreach {
        case d: Double =>
          buf.write(0x01)
          buf.writeBytes(le(8).putDouble(d).array())
        case s: String =>
          buf.write(0x02)
          val chars = s.getBytes("ISO-8859-1")
          buf.write(chars.length & 0xFF); buf.write((chars.length >> 8) & 0xFF)
          buf.write(0) // compressed
          buf.writeBytes(chars)
        case v: Boolean =>
          buf.write(0x04)
          buf.write(if (v) 1 else 0)
          buf.writeBytes(new Array[Byte](7))
        case e: Int => // error code
          buf.write(0x10)
          buf.write(e)
          buf.writeBytes(new Array[Byte](7))
      }
      buf.toByteArray
    }

    /** Multi-sheet workbook with SUPBOOK/EXTERNSHEET/LBL globals:
      * cellRecs land on the FIRST sheet; the second ("My Sheet") holds
      * one number so 3-D refs have a real target. */
    def workbook3d(lbls: Seq[Array[Byte]], xti: Seq[(Int, Int, Int)],
        cellRecs: Array[Byte]*): Array[Byte] = {
      val names = Seq("S", "My Sheet")
      val fixed = bof(0x05) ++ supbookSelf(names.length) ++
        // the second XTI entry rides a CONTINUE record, so the e2e
        // arms also pin the EXTERNSHEET merge path
        externsheetSplit(1, xti: _*) ++ lbls.flatten
      val bsLen = names.map(n => 12 + n.length).sum
      val globalsLen = fixed.length + bsLen + 4
      val sheet1 = bof(0x10) ++ cellRecs.flatten ++ eof
      val globals = fixed ++
        boundsheet(globalsLen, names(0)) ++
        boundsheet(globalsLen + sheet1.length, names(1)) ++ eof
      val sheet2 = bof(0x10) ++ number(0, 0, 7) ++ eof
      StdFixture.cfb(Seq("Workbook" -> (globals ++ sheet1 ++ sheet2)))
    }
  }

  test("formula cells: cached values by default, formula text on outputFormulaValues=false") {
    val wb = Biff.workbook(
      Biff.label(0, 0, "a"), Biff.label(0, 1, "b"), Biff.label(0, 2, "f"),
      Biff.number(1, 0, 3), Biff.number(1, 1, 4),
      // f2 = A2+B2*2, cached 11
      Biff.formulaNum(1, 2, 11,
        Biff.tRef(1, 0) ++ Biff.tRef(1, 1) ++ Biff.tInt(2) ++ Biff.tMul ++ Biff.tAdd),
      // f3 = "x"&"y", cached string "xy" via the trailing STRING record
      Biff.formulaStr(2, 2, "xy", Biff.tStr("x") ++ Biff.tStr("y") ++ Biff.tConcat))
    val vals = XlsParser.parse(wb, null, "yyyy-MM-dd")
    assert(vals.headers == Vector("a", "b", "f"))
    assert(vals.rows == Vector(
      Vector("3", "4", "11"), Vector(null, null, "xy")))
    val fx = XlsParser.parse(wb, null, "yyyy-MM-dd", outputFormulaValues = false)
    assert(fx.rows == Vector(
      Vector("3", "4", "A2+B2*2"), Vector(null, null, "\"x\"&\"y\"")))
    // and through the Spark reader
    val dir = java.nio.file.Files.createTempDirectory("graft-xls-fx")
    java.nio.file.Files.write(dir.resolve("fx.xls"), wb)
    val df = Xls.read(spark, dir.toString, outputFormulaValues = false).toDF
    assert(df.select("f").collect().map(_.getString(0)).toSet
      == Set("A2+B2*2", "\"x\"&\"y\""))
  }

  test("XlsFormula.decompile: parens fidelity, functions, anchors, attrs, loud unsupported") {
    import Biff._
    def d(t: Array[Byte]*) = XlsFormula.decompile(t.flatten.toArray)
    // stored tParen is reproduced, not inferred
    assert(d(tRef(0, 0), tRef(0, 1), tAdd, tParen, tRef(0, 2), tMul)
      == "(A1+B1)*C1")
    assert(d(tRef(0, 0), tRef(0, 1), tRef(0, 2), tMul, tAdd) == "A1+B1*C1")
    // variable- and fixed-arity builtins
    assert(d(tArea(0, 9, 0, 1), tFuncVar(1, 4)) == "SUM(A1:B10)")
    assert(d(Array[Byte](0x1F) ++ {
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putDouble(2.5).array()
    }, tInt(0), tFunc(27)) == "ROUND(2.5,0)")
    // IF with a missing argument (tMissArg renders empty)
    assert(d(tRef(0, 0), Array[Byte](0x16), tInt(2), tFuncVar(3, 1)) == "IF(A1,,2)")
    // absolute anchors
    assert(d(tRef(0, 0, rel = false)) == "$A$1")
    // unary minus + percent, embedded-quote strings, error literals
    assert(d(tInt(5), Array[Byte](0x13), Array[Byte](0x14)) == "-5%")
    assert(d(tStr("say \"hi\"")) == "\"say \"\"hi\"\"\"")
    assert(d(Array[Byte](0x1C, 0x07)) == "#DIV/0!")
    // tAttrSum shorthand renders as SUM(..)
    assert(d(tArea(0, 4, 0, 0), Array[Byte](0x19, 0x10, 0, 0)) == "SUM(A1:A5)")
    // unsupported tokens fail loudly with NAMED errors
    val e = intercept[IllegalArgumentException](
      d(Array[Byte](0x20, 0, 0, 0, 0, 0, 0, 0))) // tArray with EMPTY rgcb
    assert(e.getMessage.contains("truncated"))
    val e2 = intercept[IllegalArgumentException](d(Array[Byte](0x01, 0, 0, 0, 0)))
    assert(e2.getMessage.contains("shared-formula"))
    // a name index against an EMPTY ctx names the problem, too
    val e3 = intercept[IllegalArgumentException](d(Array[Byte](0x23, 1, 0, 0, 0)))
    assert(e3.getMessage.contains("undefined name"))
  }

  test("array constants: tArray values render from the rgcb tail") {
    import Biff._
    // SUM({1,2;3,4}) — 2 cols × 2 rows, cached 10
    val wb = workbook(
      label(0, 0, "f"),
      formulaNum(1, 0, 10, tArray ++ tFuncVar(1, 4),
        serArray(2, 2, Seq(1.0, 2.0, 3.0, 4.0))))
    val vals = XlsParser.parse(wb, null, "yyyy-MM-dd")
    assert(vals.rows == Vector(Vector("10")))
    val fx = XlsParser.parse(wb, null, "yyyy-MM-dd", outputFormulaValues = false)
    assert(fx.rows == Vector(Vector("SUM({1,2;3,4})")))
    // mixed types: string (embedded quotes doubled), bool, error
    assert(XlsFormula.decompile(tArray, XlsFormula.emptyCtx, None,
      serArray(3, 1, Seq("""say "hi"""", true, 0x2A)))
      == "{\"say \"\"hi\"\"\",TRUE,#N/A}")
    // two tArray tokens consume rgcb IN ORDER
    assert(XlsFormula.decompile(tArray ++ tArray ++ Biff.tAdd,
      XlsFormula.emptyCtx, None,
      serArray(1, 1, Seq(5.0)) ++ serArray(1, 1, Seq(7.0))) == "{5}+{7}")
    // SerNil (legal empty slot) renders as an empty element
    assert(XlsFormula.decompile(tArray, XlsFormula.emptyCtx, None,
      Array[Byte](1, 0, 0, /*nil*/ 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
        serArray(1, 1, Seq(9.0)).drop(3)) == "{,9}")
    // truncated rgcb mid-array fails loudly as truncation
    val e = intercept[IllegalArgumentException](
      XlsFormula.decompile(tArray, XlsFormula.emptyCtx, None,
        serArray(2, 2, Seq(1.0, 2.0, 3.0, 4.0)).dropRight(4)))
    assert(e.getMessage.contains("truncated"))
  }

  test("XlsFormula.decompile: 3-D refs, sheet spans, quoting, deleted sheets, defined names") {
    import Biff._
    val ctx = XlsFormula.Ctx(
      sheets = Vector("Sheet1", "My Sheet", "Sales"),
      xti = Vector((0, 1, 1), (0, 0, 2), (0, -1, -1), (1, 0, 0), (0, 2, 2)),
      supbookInternal = Vector(true, false),
      names = Vector("TaxRate", "_FilterDatabase"))
    def d(t: Array[Byte]*) = XlsFormula.decompile(t.flatten.toArray, ctx)
    // sheet needing quotes; absolute-free A1-style ref
    assert(d(tRef3d(0, 0, 0)) == "'My Sheet'!A1")
    assert(d(tRef3d(4, 1, 1)) == "Sales!B2")
    // multi-sheet span: plain ends stay unquoted (quoting is one body
    // when either end needs it — the e2e spec covers that arm)
    assert(d(tRef3d(1, 0, 0)) == "Sheet1:Sales!A1")
    assert(d(tArea3d(4, 0, 9, 0, 1)) == "Sales!A1:B10")
    // deleted sheet (itab = -1) → #REF!; a span whose LAST endpoint is
    // dead must poison the prefix too, never silently shrink to a
    // single-sheet reference
    assert(d(tRef3d(2, 0, 0)) == "#REF!A1")
    assert(XlsFormula.decompile(tRef3d(0, 0, 0),
      ctx.copy(xti = Vector((0, 0, -1)))) == "#REF!A1")
    // defined names (tName is 1-based), inside an expression
    assert(d(tName(1)) == "TaxRate")
    assert(d(tRef3d(4, 0, 0), tName(1), tMul) == "Sales!A1*TaxRate")
    assert(d(tName(2)) == "_FilterDatabase")
    // a sheet NAMED like a cell ref (or a boolean) must quote, or the
    // rendered text re-parses as a cell/boolean instead of a sheet
    val trap = ctx.copy(sheets = Vector("A1", "TRUE", "S3"))
    // "S3" itself is a valid cell address, so it must quote too
    assert(XlsFormula.decompile(tRef3d(4, 1, 1), trap) == "'S3'!B2")
    assert(XlsFormula.decompile(tRef3d(0, 0, 0),
      trap.copy(xti = Vector((0, 0, 0)))) == "'A1'!A1")
    assert(XlsFormula.decompile(tRef3d(0, 0, 0),
      trap.copy(xti = Vector((0, 1, 1)))) == "'TRUE'!A1")
    // external-workbook supbook fails loudly, by name
    val e = intercept[IllegalArgumentException](d(tRef3d(3, 0, 0)))
    assert(e.getMessage.contains("external-workbook"))
    // undefined XTI entry fails loudly
    val e2 = intercept[IllegalArgumentException](d(tRef3d(9, 0, 0)))
    assert(e2.getMessage.contains("EXTERNSHEET"))
  }

  test("shared formulas: tExp stubs dereference SHRFMLA, relative tokens rebase per member cell") {
    import Biff._
    // col B = A*2 drag-filled over B2:B3 — Excel stores ONE template
    // (SHRFMLA after the master FORMULA) and a tExp stub in every
    // member cell; the template ref is RELATIVE (row +0, col -1)
    val template = tRefN(0, -1) ++ tInt(2) ++ tMul
    val wb = workbook(
      label(0, 0, "a"), label(0, 1, "f"),
      number(1, 0, 3), number(2, 0, 5),
      formulaNum(1, 1, 6, tExp(1, 1)) ++ shrfmla(1, 2, 1, 1, template),
      formulaNum(2, 1, 10, tExp(1, 1)))
    // cached-value mode ignores the stubs entirely
    val vals = XlsParser.parse(wb, null, "yyyy-MM-dd")
    assert(vals.rows == Vector(Vector("3", "6"), Vector("5", "10")))
    // formula-text mode: each member renders REBASED to its own cell
    val fx = XlsParser.parse(wb, null, "yyyy-MM-dd", outputFormulaValues = false)
    assert(fx.rows == Vector(Vector("3", "A2*2"), Vector("5", "A3*2")))
    // mixed anchors: absolute row survives the rebase ($ on row only)
    assert(XlsFormula.decompile(
      tRefN(5, 2, rowRel = false, colRel = true),
      XlsFormula.emptyCtx, Some((0, 0))) == "C$6")
    // tRefN outside a shared template fails loudly
    val e = intercept[IllegalArgumentException](
      XlsFormula.decompile(tRefN(0, 0)))
    assert(e.getMessage.contains("outside a shared-formula"))
    // a stub with no SHRFMLA/ARRAY target fails loudly
    val orphan = workbook(label(0, 0, "a"), formulaNum(1, 0, 0, tExp(9, 9)))
    val e2 = intercept[IllegalArgumentException](
      XlsParser.parse(orphan, null, "yyyy-MM-dd", outputFormulaValues = false))
    assert(e2.getMessage.contains("no SHRFMLA/ARRAY"))
    // array FORMULA: both member cells render the ARRAY record's rgce,
    // relative tokens anchored on the range TOP-LEFT (Excel shows the
    // same formula text in every member of {=A2:A3*2})
    val arr = workbook(
      label(0, 0, "a"), label(0, 1, "f"),
      number(1, 0, 3), number(2, 0, 5),
      formulaNum(1, 1, 6, tExp(1, 1)) ++
        arrayRec(1, 1, tAreaN(0, 1, -1, -1) ++ tInt(2) ++ tMul),
      formulaNum(2, 1, 10, tExp(1, 1)))
    val afx = XlsParser.parse(arr, null, "yyyy-MM-dd", outputFormulaValues = false)
    assert(afx.rows == Vector(Vector("3", "A2:A3*2"), Vector("5", "A2:A3*2")))
  }

  test("multi-sheet workbook end-to-end: Sheet2!A1 formulas render from EXTERNSHEET/LBL plumbing") {
    val wb = Biff.workbook3d(
      lbls = Seq(Biff.lbl("TaxRate"), Biff.lbl("\u0006", builtin = true)),
      xti = Seq((0, 1, 1), (0, 0, 1)),
      Biff.label(0, 0, "a"), Biff.label(0, 1, "f"), Biff.label(0, 2, "g"),
      Biff.number(1, 0, 3),
      // f2 = 'My Sheet'!A1*TaxRate (cached 21), g2 = SUM(S:My Sheet!A1:A1)
      Biff.formulaNum(1, 1, 21,
        Biff.tRef3d(0, 0, 0) ++ Biff.tName(1) ++ Biff.tMul),
      Biff.formulaNum(1, 2, 7,
        Biff.tArea3d(1, 0, 0, 0, 0) ++ Biff.tFuncVar(1, 4)))
    // cached-value mode unaffected by the new globals
    val vals = XlsParser.parse(wb, null, "yyyy-MM-dd")
    assert(vals.rows == Vector(Vector("3", "21", "7")))
    // formula-text mode renders 3-D refs + names via the workbook ctx
    val fx = XlsParser.parse(wb, null, "yyyy-MM-dd", outputFormulaValues = false)
    assert(fx.rows == Vector(Vector(
      "3", "'My Sheet'!A1*TaxRate", "SUM('S:My Sheet'!A1:A1)")))
    // the second sheet parses by name, proving the offsets are real
    val s2 = XlsParser.parse(wb, "My Sheet", "yyyy-MM-dd")
    assert(s2.headers == Vector("7"))
  }

  test("XlsFormula.decompile: hostile token streams return or throw IllegalArgument, fast") {
    // random rgce bytes: every outcome must be a string or a LOUD
    // IllegalArgumentException (unsupported token, truncation, stack
    // underflow/leftovers) — never another exception type, never a
    // hang. 2000 streams bound the walk behavior, not just one case.
    val rnd = new scala.util.Random(19)
    var ok = 0
    var rejected = 0
    (0 until 2000).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(40))
      rnd.nextBytes(bytes)
      try { XlsFormula.decompile(bytes); ok += 1 }
      catch { case _: IllegalArgumentException => rejected += 1 }
    }
    assert(ok + rejected == 2000)
    assert(rejected > 0, "fuzz produced no rejects — streams too tame")
    // same walk-behavior bound with the round-20 surface live: a
    // populated ctx (3-D/name tokens resolve instead of rejecting), a
    // member-cell base (tRefN/tAreaN resolve), and a random rgcb
    // (tArray reads from it) — every outcome still string-or-IAE
    val ctx = XlsFormula.Ctx(
      sheets = Vector("S1", "My Sheet"),
      xti = Vector((0, 0, 0), (0, 1, 1), (0, -1, -1)),
      supbookInternal = Vector(true),
      names = Vector("N1", "N2"))
    var ok2 = 0
    var rejected2 = 0
    (0 until 2000).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(40))
      rnd.nextBytes(bytes)
      val rgcb = new Array[Byte](rnd.nextInt(30))
      rnd.nextBytes(rgcb)
      try { XlsFormula.decompile(bytes, ctx, Some((3, 2)), rgcb); ok2 += 1 }
      catch { case _: IllegalArgumentException => rejected2 += 1 }
    }
    assert(ok2 + rejected2 == 2000)
    assert(rejected2 > 0)
  }
}
