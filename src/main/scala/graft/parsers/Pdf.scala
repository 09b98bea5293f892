package graft.parsers

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

/** Minimal real PDF text I/O with ZERO extra dependencies (U3,
  * transform_data_pdf/lambda_function.py:14-33 — the reference pipes
  * ticket PDFs through a text extractor; pdfbox is unresolvable offline,
  * but the PDF 1.4 constructs its tickets actually use are public spec
  * [ISO 32000] and JDK-reachable):
  *  - object/xref skeleton (writer emits byte-exact offsets),
  *  - `/FlateDecode` streams — PDF's zlib, i.e. `java.util.zip`,
  *  - content-stream text operators: `(string) Tj`, `[(a) -120 (b)] TJ`,
  *    newline-advancing `Td`/`TD`/`T*`, with the full PDF string escape
  *    grammar (\\ \( \) \n \r \t \b \f, octal \ddd, line continuations).
  *
  * The extractor is deliberately structural, not rendering: it decodes
  * every Flate/plain `stream … endstream` block and tokenizes the text
  * operators — what a ticket/report pipeline needs (and what the
  * reference's extractor produces: running text). Scale shape: one PDF =
  * one binaryFile row = one task; a bucket of tickets parallelizes per
  * file with the parse riding mapPartitions, no driver involvement. */
object Pdf {

  // --------------------------------------------------------------- write

  private def flate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def escapeString(s: String): String = {
    // the writer encodes text as Latin-1 literal strings; a code point
    // above U+00FF would silently truncate to its low byte (ADVICE r8) —
    // fail loudly instead, matching the decodeWav codec discipline
    // (UTF-16BE hex strings are the spec'd escape hatch if fixtures ever
    // need non-Latin-1 text)
    require(s.forall(_.toInt <= 0xff),
      s"PDF writer encodes Latin-1 only; non-Latin-1 char in: ${s.take(40)}")
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 || c > 0x7e => f"\\${c.toInt & 0xff}%03o"
      case c => c.toString
    }
  }

  /** One-page PDF 1.4 with `lines` as Helvetica text, one `Tj` per line,
    * content stream FlateDecode-compressed, valid xref. Readable by any
    * conformant viewer. */
  def writePdf(lines: Seq[String]): Array[Byte] = {
    val content = {
      val body = lines.map(l => s"(${escapeString(l)}) Tj T*").mkString("\n")
      s"BT /F1 10 Tf 14 TL 50 780 Td\n$body\nET".getBytes("ISO-8859-1")
    }
    val zipped = flate(content)
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("ISO-8859-1"),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>").getBytes("ISO-8859-1"),
      null, // object 4 = the stream, assembled below
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes("ISO-8859-1"))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = Array.fill(objs.length + 1)(0)
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets(i + 1) = out.size()
      w(s"${i + 1} 0 obj\n")
      if (o != null) { out.write(o); w("\nendobj\n") }
      else {
        w(s"<< /Length ${zipped.length} /Filter /FlateDecode >>\nstream\n")
        out.write(zipped)
        w("\nendstream\nendobj\n")
      }
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------- read

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // needs dict/input: not zlib
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** The direct `/Length N` entry of the dictionary immediately before a
    * `stream` keyword at `s`, if present and not an indirect `N 0 R`
    * reference. Scans only the dictionary window preceding the keyword. */
  private def directLengthBefore(bytes: Array[Byte], s: Int): Option[Int] = {
    val from = math.max(0, s - 1024)
    val window = new String(bytes, from, s - from, "ISO-8859-1")
    // last /Length in the window is the one in this stream's dictionary
    LengthEntry.findAllMatchIn(window).toSeq.lastOption.flatMap { m =>
      val after = window.substring(m.end)
      // `/Length 12 0 R` = indirect reference — can't use it without an
      // xref walk; fall back to the token scan. Absurd digit counts are
      // distrusted rather than overflowed.
      if (IndirectTail.findPrefixOf(after).isDefined) None
      else if (m.group(1).length > 9) None
      else Some(m.group(1).toInt)
    }
  }
  private val LengthEntry = """/Length\s+(\d+)""".r
  private val IndirectTail = """\s+\d+\s+R""".r

  /** Every decoded `stream … endstream` payload in document order —
    * FlateDecode streams inflated, plain streams as-is. Payload extent
    * comes from the dictionary's direct `/Length` when present (ADVICE
    * r8: a binary payload may CONTAIN the bytes `endstream`, which the
    * token scan would mis-segment); the scan is the fallback for absent
    * or indirect `/Length`, and for a `/Length` that provably does not
    * land on an `endstream` keyword (a lying dictionary). */
  private[graft] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val streamTok = "stream".getBytes("ISO-8859-1")
    val endTok = "endstream".getBytes("ISO-8859-1")
    val found = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var s = indexOfBytes(bytes, streamTok, pos)
    while (s >= 0) {
      var dataStart = s + streamTok.length
      // per spec: `stream` is followed by CRLF or LF
      if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
      if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
      // /Length-bounded extent, validated: the bytes after payload + EOL
      // must actually be `endstream`, else distrust the dictionary
      val byLength = directLengthBefore(bytes, s).flatMap { len =>
        if (dataStart.toLong + len > bytes.length) None
        else {
          val dataEnd = dataStart + len
          var a = dataEnd
          if (a < bytes.length && bytes(a) == '\r') a += 1
          if (a < bytes.length && bytes(a) == '\n') a += 1
          if (a + endTok.length <= bytes.length &&
              endTok.indices.forall(j => bytes(a + j) == endTok(j)))
            Some((dataEnd, a))
          else None
        }
      }
      val bounds = byLength.orElse {
        val e = indexOfBytes(bytes, endTok, dataStart)
        if (e < 0) None
        else {
          var dataEnd = e
          // strip the EOL that precedes `endstream`
          if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
          Some((dataEnd, e))
        }
      }
      bounds match {
        case None => s = -1
        case Some((dataEnd, endPos)) =>
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          found += inflate(raw).getOrElse(raw)
          pos = endPos + endTok.length
          s = indexOfBytes(bytes, streamTok, pos)
      }
    }
    found.result()
  }

  /** PDF string-literal body (between parens, escapes unresolved) →
    * characters; implements the ISO 32000 §7.3.4.2 escape grammar. */
  private[graft] def unescapeString(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { sb += c; i += 1 }
      else if (i + 1 >= s.length) i += 1
      else s.charAt(i + 1) match {
        case 'n' => sb += '\n'; i += 2
        case 'r' => sb += '\r'; i += 2
        case 't' => sb += '\t'; i += 2
        case 'b' => sb += '\b'; i += 2
        case 'f' => sb += '\f'; i += 2
        case '(' => sb += '('; i += 2
        case ')' => sb += ')'; i += 2
        case '\\' => sb += '\\'; i += 2
        case '\n' => i += 2 // line continuation
        case '\r' => i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
        case d if d >= '0' && d <= '7' =>
          var j = i + 1; var acc = 0
          while (j < s.length && j <= i + 3 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
            acc = acc * 8 + (s.charAt(j) - '0'); j += 1
          }
          sb += (acc & 0xff).toChar; i = j
        case other => sb += other; i += 2
      }
    }
    sb.toString
  }

  /** Text-showing operators of one decoded content stream, in order:
    * `(s) Tj`, `(s) '`, `(s) "`, `[(a) kern (b)] TJ`. A newline is
    * emitted at each line-advance (`Td` `TD` `T*` `'` `"`). */
  private[graft] def textOps(content: String): String = {
    val sb = new StringBuilder
    var i = 0
    var pendingNewline = false
    def emit(s: String): Unit = {
      if (pendingNewline && sb.nonEmpty) sb += '\n'
      pendingNewline = false
      sb ++= s
    }
    // scan: parenthesized strings (with escape/nesting awareness) and
    // operator tokens between them; strings inside a [...] TJ array
    // ACCUMULATE (kerning numbers between them are positioning, the
    // glyphs concatenate)
    var lastString: String = null
    var inArray = false
    val arrayBuf = new StringBuilder
    while (i < content.length) {
      val c = content.charAt(i)
      if (c == '[') { inArray = true; arrayBuf.clear(); i += 1 }
      else if (c == ']') {
        inArray = false; lastString = arrayBuf.toString; i += 1
      } else if (c == '(') {
        var depth = 1; var j = i + 1; val body = new StringBuilder
        while (j < content.length && depth > 0) {
          val ch = content.charAt(j)
          if (ch == '\\' && j + 1 < content.length) { body += ch += content.charAt(j + 1); j += 2 }
          else if (ch == '(') { depth += 1; body += ch; j += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) body += ch; j += 1 }
          else { body += ch; j += 1 }
        }
        val s = unescapeString(body.toString)
        if (inArray) arrayBuf ++= s else lastString = s
        i = j
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val j = {
          var k = i
          while (k < content.length && !content.charAt(k).isWhitespace &&
            content.charAt(k) != '(' && content.charAt(k) != '[' &&
            content.charAt(k) != ']') k += 1
          k
        }
        content.substring(i, j) match {
          case "Tj" | "TJ" => if (lastString != null) { emit(lastString); lastString = null }
          case "'" | "\"" =>
            pendingNewline = true
            if (lastString != null) { emit(lastString); lastString = null }
          case "Td" | "TD" | "T*" => pendingNewline = true
          case _ => ()
        }
        i = j max (i + 1)
      } else i += 1
    }
    sb.toString
  }

  /** Full extraction: decode every stream, keep those containing text
    * operators, join. The reference's `extract_text` equivalent. */
  def extractText(bytes: Array[Byte]): String =
    contentStreams(bytes)
      .map(cs => textOps(new String(cs, "ISO-8859-1")))
      .filter(_.nonEmpty)
      .mkString("\n")

  /** `%PDF-` magic probe (F3). */
  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'
}
