package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parsers.{MailParser, TicketParser}

/** Golden-fixture + property tests for the U1/U2 grammars (FIXTURES.md §B). */
class ParserSpec extends AnyFunSuite {

  // -- U1 ticket grammar ----------------------------------------------------

  val goldenTicket =
    """Fecha 05/03/24 Hora 19:44
      |Caja 4
      |P.V. 001 Nro T. 4711
      |Bebidas
      |Agua Mineral 2L
      |2 x 850,50 (090) 1701,00
      |Carniceria
      |Bola De Lomo
      |x 1,25 x 8000,00 10000,00
      |Bebidas
      |Cerveza Lata
      |1 x 1200,00 (090) 1200,00
      |AHORRO $200,00
      |TOTAL 12701,00
      |""".stripMargin

  test("ticket: golden fixture parses to 3 items with correct fields") {
    val items = TicketParser.parse(goldenTicket)
    assert(items.size == 3)
    val Seq(agua, lomo, cerveza) = items
    assert(agua == TicketParser.TicketItem(4711L, "05/03/2024", "Bebidas",
      "Agua Mineral 2L", 2, 0.0, 850.50, 1701.00, 12701.00, 3810.30))
    assert(lomo.peso == 1.25 && lomo.cant == 1 && lomo.p_total == 10000.00)
    assert(cerveza.categ == "Bebidas")
  }

  test("ticket: bruto = sum(items) − ahorro; meli = round(bruto*0.3, 2)") {
    val items = TicketParser.parse(goldenTicket)
    val sum = BigDecimal("1701.00") + BigDecimal("10000.00") + BigDecimal("1200.00")
    assert(items.head.total_ticket_bruto == (sum - 200).toDouble)
    assert(items.head.total_ticket_meli ==
      ((sum - 200) * 0.3).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ticket: \\xa0/\\xad cleanup and 4-digit years pass through") {
    val t = goldenTicket.replace(' ', ' ').replace("05/03/24", "05/03/2024")
    val items = TicketParser.parse(t)
    assert(items.nonEmpty && items.head.fecha == "05/03/2024")
  }

  test("ticket: missing anchors → no items") {
    assert(TicketParser.parse("no anchors here\n1 x 2,00 (0) 2,00") == Nil)
    assert(TicketParser.parse("") == Nil)
  }

  test("ticket: render ∘ parse is identity on seeded random tickets (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { n =>
      val items = (1 to rnd.nextInt(8) + 1).map { i =>
        val cat = TicketParser.categories(rnd.nextInt(7))
        val weighted = rnd.nextBoolean()
        val total = BigDecimal(rnd.nextLong(999999), 2).toDouble
        val unit = BigDecimal(rnd.nextLong(99999), 2).toDouble
        if (weighted) (cat, s"Prod $i", 1L, BigDecimal(rnd.nextLong(9999), 2).toDouble max 0.01, unit, total)
        else (cat, s"Prod $i", rnd.nextLong(9) + 1, 0.0, unit, total)
      }
      val text = TicketParser.render(n.toLong, "01/02/2024", 0.0, items)
      val parsed = TicketParser.parse(text)
      assert(parsed.map(p => (p.categ, p.prod, p.cant, p.peso, p.p_unit, p.p_total)) == items,
        s"ticket $n failed round-trip:\n$text")
    }
  }

  // -- U2 mail grammar ------------------------------------------------------

  def doc(html: String) = MailParser.MailDoc("m1", "2024-03-05T19:44:00",
    "banco@x", "Pago", html, "")

  test("mail: golden fixture parses all fields") {
    val html = MailParser.renderHtml("05/03/2024", "19:44", "$1.234,56", "Comercio1", 3, "9876")
    val Some(p) = MailParser.parse(doc(html))
    assert(p.fecha_pago == "05/03/2024" && p.hora_pago == "19:44:00")
    assert(p.monto == BigDecimal("1234.56") && p.divisa == "ARS")
    assert(p.tarjeta == "Tarjeta_Santander" && p.nro_tarjeta == "9876")
    assert(p.comercio == "Comercio1" && p.cuotas == 3)
    assert(p.id == MailParser.md5Hex("05/03/2024_19:44:00_1234.56_Comercio1_Tarjeta_Santander_ARS"))
  }

  test("mail: USD detection via U$S prefix") {
    val html = MailParser.renderHtml("05/03/2024", "19:44", "U$S12,34", "C", 1, "0001")
    assert(MailParser.parse(doc(html)).get.divisa == "USD")
  }

  test("mail: missing required field → None (null gate)") {
    val noMonto = "<p>Fecha 05/03/2024</p><p>Hora 19:44</p><p>Comercio C</p>"
    assert(MailParser.parse(doc(noMonto)).isEmpty)
    val noFecha = "<p>Monto $1</p><p>Hora 19:44</p><p>Comercio C</p>"
    assert(MailParser.parse(doc(noFecha)).isEmpty)
  }

  test("mail: cuotas defaults to 1 when absent") {
    val html = "<p>Monto $10</p><p>Fecha 01/01/2024</p><p>Hora 09:00</p><p>Comercio C</p>"
    assert(MailParser.parse(doc(html)).get.cuotas == 1)
  }

  test("ticket constructions are value-equal: collect_list vs secondary sort") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = graft.queries.PackParsers.ticketTexts(spark, TestSpark.sf0001)
      .select($"text").as[String].collect().sorted.toSeq
    val b = graft.queries.PackParsers.ticketTextsSorted(spark, TestSpark.sf0001)
      .select($"text").as[String].collect().sorted.toSeq
    assert(a == b, "both construction plans must render identical ticket corpora")
  }
}
