package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.parsers.{MailParser, TicketParser}

/** ScalaCheck properties for the parser grammars (SURVEY.md §5.3) — run
  * natively by sbt's ScalaCheck framework. */
object ParserProps extends Properties("parsers") {

  private val cents = Gen.choose(1L, 99999999L)
  private def money(c: Long) = BigDecimal(c, 2)

  property("parseMoney inverts every currency formatting") = Prop.forAll(
    cents, Gen.oneOf("$", "U$S ", "US$", "AR$ ", "")) { (c, prefix) =>
    val d = money(c)
    MailParser.parseMoney(prefix + d.toString.replace(".", ",")).contains(d)
  }

  property("parseMoney handles thousands separators") = Prop.forAll(
    Gen.choose(1000L, 999999L)) { n =>
    // "1.234.567,89"-style grouping
    val whole = n.toString.reverse.grouped(3).mkString(".").reverse
    MailParser.parseMoney(s"$$$whole,50").contains(BigDecimal(s"$n.50"))
  }

  private val itemGen: Gen[(String, String, Long, Double, Double, Double)] = for {
    cat <- Gen.oneOf(TicketParser.categories)
    prod <- Gen.identifier.map("P" + _.take(12))
    weighted <- Gen.oneOf(true, false)
    cant <- Gen.choose(1L, 9L)
    kg <- cents.map(c => money(c % 9999 + 1).toDouble)
    unit <- cents.map(money(_).toDouble)
    total <- cents.map(money(_).toDouble)
  } yield if (weighted) (cat, prod, 1L, kg, unit, total)
          else (cat, prod, cant, 0.0, unit, total)

  property("ticket render∘parse is identity on item fields") = Prop.forAll(
    Gen.choose(1L, 99999L), Gen.nonEmptyListOf(itemGen).map(_.take(10))) { (nro, items) =>
    val text = TicketParser.render(nro, "07/11/2024", 0.0, items)
    val parsed = TicketParser.parse(text)
    parsed.map(p => (p.categ, p.prod, p.cant, p.peso, p.p_unit, p.p_total)) == items &&
      parsed.forall(_.nro_ticket == nro)
  }

  property("ticket bruto invariant: sum(p_total) − ahorro, meli = 30% HALF_UP") = Prop.forAll(
    Gen.nonEmptyListOf(itemGen).map(_.take(8)), Gen.choose(0L, 9999L)) { (items, ahorroCents) =>
    val ahorro = money(ahorroCents)
    val text = TicketParser.render(1L, "07/11/2024", ahorro.toDouble, items)
    val parsed = TicketParser.parse(text)
    val expected = (items.map(i => BigDecimal(i._6)).sum - ahorro)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    parsed.forall(p =>
      p.total_ticket_bruto == expected.toDouble &&
      p.total_ticket_meli == (expected * BigDecimal("0.3"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private val garbage: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.asciiPrintableStr, Gen.oneOf("Fecha", "TOTAL", "x 1,5 x", "AHORRO $",
      "P.V.", "Bebidas", "\u00a0\u00ad", "12 x 3,4 (0) 5,6", "\n\n")))
    .map(_.mkString("\n"))

  property("ticket parse never throws on arbitrary input") = Prop.forAll(garbage) { txt =>
    TicketParser.parse(txt)
    true
  }

  property("mail parse never throws on arbitrary html") = Prop.forAll(garbage) { html =>
    MailParser.parse(MailParser.MailDoc("m", "2024-01-01", "s", "subj", html, ""))
    true
  }

  // arbitrary unicode INCLUDING XML-invalid control chars and unpaired
  // surrogates: the workbook must stay parseable (one bad cell value
  // must not corrupt the export); invalid code points substitute U+FFFD
  private val anyStr: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.choose(0, 0xFFFF).map(_.toChar),            // full BMP incl. controls/surrogates
    Gen.oneOf('&', '<', '>', '"', '\t', '\n', '\r', '', '\uD800'),
    Gen.alphaNumChar)).map(_.mkString)

  property("xlsx write∘parse is identity modulo U+FFFD substitution of XML-invalid chars") =
    Prop.forAll(Gen.listOfN(3, anyStr)) { cells =>
      def expected(s: String): String = {
        val sb = new StringBuilder; var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          // CR is NOT in this validity mirror's special set: the writer
          // emits it as &#xD;, which round-trips exactly (a literal CR
          // would be normalized to LF by XML 1.0 §2.11)
          val valid = cp == 0x9 || cp == 0xA || cp == 0xD ||
            (cp >= 0x20 && cp <= 0xD7FF) || (cp >= 0xE000 && cp <= 0xFFFD) ||
            (cp >= 0x10000 && cp <= 0x10FFFF)
          if (valid) sb.appendAll(Character.toChars(cp)) else sb += '�'
          i += Character.charCount(cp)
        }
        sb.toString
      }
      val bytes = graft.sources.Xlsx.writeWorkbook(
        Seq("a", "b", "c"), Seq(cells))
      // independent oracle against mirror-testing: a STRICT namespace-
      // aware DOM parse of the sharedStrings part must accept the bytes
      // (this is the check that fails on raw control chars / lone
      // surrogates / literal-CR bugs regardless of what `expected` says)
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var sst: Array[Byte] = null
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") sst = zin.readAllBytes()
        e = zin.getNextEntry
      }
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(sst))
      val back = graft.sources.Xlsx.parseWorkbook(bytes, nCols = 3, headerRows = 1)
      back == Seq(cells.map(expected))
    }

  property("xlsx spot fixtures: CR survives via &#xD;, invalid chars substitute, markup escapes") =
    Prop.secure {
      val cells = Seq("a\rb\r\nc", "xy\uD800z", "p&<>\"q\tr\ns")
      val bytes = graft.sources.Xlsx.writeWorkbook(Seq("h1", "h2", "h3"), Seq(cells))
      val back = graft.sources.Xlsx.parseWorkbook(bytes, nCols = 3, headerRows = 1)
      back == Seq(Seq("a\rb\r\nc", "x�y�z", "p&<>\"q\tr\ns"))
    }

}
