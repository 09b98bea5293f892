package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parsers.Pdf

/** The JDK-only PDF text extractor against documents it did NOT write:
  * the golden PDF below is hand-assembled (uncompressed stream, TJ
  * kerning array, ' line-advance operator, octal/paren escapes) so the
  * extractor can't be validated against its own writer's dialect alone. */
class PdfSpec extends AnyFunSuite {

  test("hand-crafted uncompressed PDF: Tj, TJ kerning arrays, ', escapes") {
    val content =
      """BT /F1 12 Tf 72 720 Td
        |(Hello \(World\)) Tj
        |T* [(Ker) -120 (ned) 40 ( pair)] TJ
        |(next line) '
        |T* (oct\101l \\ done) Tj
        |ET""".stripMargin
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\ntrailer\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.isPdf(pdf))
    assert(Pdf.extractText(pdf) ==
      "Hello (World)\nKerned pair\nnext line\noctAl \\ done")
  }

  test("writer/extractor roundtrip through FlateDecode") {
    val lines = Seq("Ticket 00042  TOTAL $ 1.234,56",
      "CARREFOUR sucursal 9 (centro)", "item: pan lactal x2")
    val bytes = Pdf.writePdf(lines)
    assert(Pdf.isPdf(bytes))
    // the content stream is genuinely compressed (raw text absent)
    assert(!new String(bytes, "ISO-8859-1").contains("TOTAL $"))
    assert(Pdf.extractText(bytes) == lines.mkString("\n"))
  }

  test("string escape grammar: octal, continuations, nesting") {
    assert(Pdf.unescapeString("a\\(b\\)c") == "a(b)c")
    assert(Pdf.unescapeString("\\101\\102\\103") == "ABC")
    assert(Pdf.unescapeString("one\\\ntwo") == "onetwo") // continuation
    assert(Pdf.unescapeString("tab\\there") == "tab\there")
    assert(Pdf.unescapeString("\\53") == "+") // short octal
  }

  test("/Length bounds the payload even when it contains 'endstream' bytes (ADVICE r8)") {
    // a binary payload that embeds the endstream token mid-stream: the
    // token scan would truncate at the embedded token and emit garbage;
    // the /Length-bounded reader must recover the whole text
    val content = "BT (before) Tj T* (endstream inside) Tj T* (after) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\ntrailer\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf) == "before\nendstream inside\nafter")
  }

  test("indirect or lying /Length falls back to the token scan") {
    val content = "BT (fallback ok) Tj ET"
    // indirect reference form: /Length 7 0 R must NOT be read as 7
    val indirect = ("%PDF-1.4\n1 0 obj\n<< /Length 7 0 R >>\nstream\n" +
      content + "\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(indirect) == "fallback ok")
    // direct but wrong: points nowhere near an endstream keyword
    val lying = ("%PDF-1.4\n1 0 obj\n<< /Length 3 >>\nstream\n" +
      content + "\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(lying) == "fallback ok")
  }

  test("writer refuses non-Latin-1 text instead of silently corrupting it") {
    val e = intercept[IllegalArgumentException] {
      Pdf.writePdf(Seq("total € 12")) // € is U+20AC, not Latin-1
    }
    assert(e.getMessage.contains("Latin-1"))
  }

  test("non-PDF and truncated inputs degrade to empty, never throw") {
    assert(!Pdf.isPdf("hello".getBytes))
    assert(Pdf.extractText("no streams here".getBytes) == "")
    assert(Pdf.extractText("stream\nabandoned without end".getBytes) == "")
    val garbageFlate = ("%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\n" +
      "stream\ngarbage\nendstream\n").getBytes("ISO-8859-1")
    // undecodable stream: surfaces as no text, not an exception
    assert(Pdf.extractText(garbageFlate) == "")
  }
}
