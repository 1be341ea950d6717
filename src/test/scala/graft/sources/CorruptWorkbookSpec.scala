package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-bytes sweep for the workbook parsers — the same bar the
  * media expressions meet (MediaDims/Mp3Meta fuzz): truncated and
  * bit-flipped xlsx (zip+XML), xls (CFB+BIFF8) and encrypted-OOXML
  * (CFB+crypto descriptor) inputs must either parse or REJECT CLEANLY
  * with a typed, controlled error — never an NPE, index error,
  * negative-size allocation, stack overflow, or hang. A crawl feeds
  * parsers garbage routinely; an uncontrolled throw class is how one
  * bad file kills a 100 TB ingest job. */
class CorruptWorkbookSpec extends AnyFunSuite {

  private val xlsxFixture = "/root/reference/src/test/resources/players.xlsx"
  private val xlsFixture = "/root/reference/src/test/resources/players.xls"
  private val encFixture = "/root/reference/src/test/resources/encrypted_players.xlsx"

  /** The reject-cleanly contract: these are the CONTROLLED failure
    * types a caller can catch-and-skip per file. Anything else —
    * NullPointerException, ArrayIndexOutOfBounds, NegativeArraySize,
    * MatchError, StackOverflow — is a parser bug surfaced by fuzz. */
  private def clean(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException => true // incl. require() messages
    case _: java.io.IOException => true      // incl. Zip/EOF exceptions
    case _: javax.xml.stream.XMLStreamException => true
    case _: java.security.GeneralSecurityException => true
    case _: NumberFormatException => false   // leaking internals = bug
    case _ => false
  }

  private def sweep(name: String, seed: Array[Byte], parse: Array[Byte] => Any): Unit = {
    val rnd = new scala.util.Random(20260814L)
    // deterministic edge shapes first
    val edges: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      seed.take(1), seed.take(8), seed.take(seed.length / 2),
      new Array[Byte](64),
      Array.fill[Byte](64)(0xff.toByte))
    (edges ++ (0 until 400).map { i =>
      if (i % 4 == 0) { // random garbage
        val a = new Array[Byte](rnd.nextInt(2048)); rnd.nextBytes(a); a
      } else { // mutate the real fixture: flips then truncate
        val m = seed.clone()
        (0 until 1 + rnd.nextInt(8)).foreach(_ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        if (rnd.nextBoolean()) m.take(1 + rnd.nextInt(m.length)) else m
      }
    }).zipWithIndex.foreach { case (bytes, i) =>
      try { parse(bytes); () }
      catch {
        case t: Throwable =>
          assert(clean(t),
            s"$name case $i (${bytes.length} bytes): uncontrolled " +
              s"${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }

  test("xlsx parser rejects corrupt zip/XML cleanly") {
    val seed = Files.readAllBytes(Paths.get(xlsxFixture))
    sweep("xlsx", seed, b => XlsxParser.parse(b, null, "yyyy-MM-dd"))
  }

  test("xls parser rejects corrupt CFB/BIFF cleanly") {
    val seed = Files.readAllBytes(Paths.get(xlsFixture))
    sweep("xls", seed, b => XlsParser.parse(b, null, "yyyy-MM-dd"))
  }

  test("ooxml decrypt rejects corrupt containers/descriptors cleanly") {
    val seed = Files.readAllBytes(Paths.get(encFixture))
    sweep("ooxml-crypto", seed, b => OoxmlCrypto.decrypt(b, "pass"))
  }
}
