package graft.parsers

/** U1 — the supermarket-ticket text grammar (SURVEY.md §2.9).
  *
  * The reference parses extracted PDF text with a stateful line scan
  * (transform_data_pdf/lambda_function.py:35-115): locate the
  * `Fecha .. Hora ..` / `Caja` / `P.V. .. Nro T.` / `TOTAL` / `AHORRO`
  * anchor lines (:39-49), slice the item region (:75-78), track the
  * current category from a fixed 7-value enum (:71-82), recognize the two
  * amount-line forms — `<qty> x <unit> (<code>) <total>` for unit-priced
  * items and `x <kg> x <unit> <total>` for weighted items (:89-101) —
  * with comma-decimal cleanup (:93,97,101), and treat any non-matching
  * line as the next item's name (:114-115).
  *
  * Here that grammar is a pure Scala function used via typed
  * `Dataset.flatMap` — a generator ("UDTF") in Spark terms. `render`
  * is the exact inverse, letting declared queries build ticket text from
  * relational rows and assert parse∘render == identity against a SQL
  * oracle (FIXTURES.md §B.1).
  */
object TicketParser {

  /** The 7-value category enum, transform_data_pdf:71. */
  val categories: Seq[String] = Seq(
    "Almacen", "Bebidas", "Carniceria", "Frutas Y Verduras",
    "Limpieza", "Perfumeria", "Hogar Bazar")
  private val categorySet = categories.toSet

  /** One parsed line item (warehouse column names, SURVEY.md §1.2 — the
    * loader's `categ/prod/cant/...` names win over the transform's
    * `categoria/producto/...` drift, load_data:22-27). */
  final case class TicketItem(
      nro_ticket: Long,
      fecha: String, // dd/MM/yyyy (2-digit years already fixed up)
      categ: String,
      prod: String,
      cant: Long,
      peso: Double,
      p_unit: Double,
      p_total: Double,
      total_ticket_bruto: Double,
      total_ticket_meli: Double)

  private val fechaRe = """Fecha\s+(\d{2}/\d{2}/\d{2,4})\s+Hora\s+\d{2}:\d{2}.*""".r
  private val ticketRe = """P\.V\.\s+\d+\s+Nro\s+T\.\s+(\d+).*""".r
  // unit-priced: "<qty> x <unit> (<code>) <total>"  (transform_data_pdf:89-95)
  private val qtyRe = """(\d+)\s+x\s+([\d.,]+)\s*\([^)]*\)\s*([\d.,]+)""".r
  // weighted: "x <kg> x <unit> <total>"             (transform_data_pdf:96-101)
  private val pesoRe = """x\s+([\d.,]+)\s+x\s+([\d.,]+)\s+([\d.,]+)""".r
  private val ahorroRe = """AHORRO\s+\$?\s*([\d.,]+)""".r
  private val totalRe = """TOTAL\s+([\d.,]+)""".r

  /** Comma-decimal cleanup (transform_data_pdf:93,97,101). Exact decimal —
    * ticket totals must round identically to a decimal-arithmetic oracle,
    * and double accumulation would drift at .xx5 boundaries. */
  private def num(s: String): BigDecimal = BigDecimal(s.replace(".", "").replace(",", "."))

  /** Double variant for amounts that are never summed (unit price, kg):
    * ≤2-decimal values convert exactly, and skipping BigDecimal halves the
    * per-amount parse cost. */
  private def numD(s: String): Double = s.replace(".", "").replace(",", ".").toDouble

  /** Two-digit-year fixup, Python twin of the watermark SQL
    * (extract_data_pdf:89-91). */
  private def fixYear(d: String): String = {
    val parts = d.split("/")
    if (parts(2).length == 2) s"${parts(0)}/${parts(1)}/20${parts(2)}" else d
  }

  /** Parse one ticket's text into line items. Pure; returns Nil when the
    * anchors are missing (malformed ticket).
    *
    * Single pass over the lines (this runs per ticket inside a flatMap
    * over the whole corpus, so constant factors matter): anchor lines
    * dispatch on their literal prefixes and the amount regexes only run
    * on lines containing the " x " grammar marker. */
  def parse(text: String): Seq[TicketItem] = {
    // \xa0/\xad cleanup, transform_data_pdf:32
    val lines = text.replace('\u00a0', ' ').replace("\u00ad", "").split("\n")

    var fecha: String = null
    var nro = -1L
    var ahorro = BigDecimal(0)
    var categ: String = null
    var prod: String = null
    val items = Seq.newBuilder[(String, String, Long, Double, Double, BigDecimal)]
    var i = 0
    var done = false
    while (i < lines.length && !done) {
      val l = lines(i).trim
      if (l.nonEmpty) {
        if (categorySet.contains(l)) { categ = l; prod = null }
        else if (l.startsWith("TOTAL") && totalRe.pattern.matcher(l).matches()) done = true
        else if (l.startsWith("Fecha")) { if (fecha == null) l match {
          case fechaRe(d) => fecha = fixYear(d)
          case _ => () } }
        else if (l.startsWith("P.V.")) { if (nro < 0) l match {
          case ticketRe(n) => nro = n.toLong
          case _ => () } }
        else if (l.startsWith("AHORRO")) l match {
          case ahorroRe(a) => ahorro = num(a)
          case _ => () }
        else if (l.startsWith("Caja")) ()
        else if (categ != null && prod != null && l.contains(" x ")) {
          // dispatch on the first char: weighted lines start with the 'x'
          // marker, unit-priced with the quantity digits — one regex try
          val m = (if (l.charAt(0) == 'x') pesoRe else qtyRe).pattern.matcher(l)
          if (m.matches()) {
            if (l.charAt(0) == 'x')
              items += ((categ, prod, 1L, numD(m.group(1)), numD(m.group(2)), num(m.group(3))))
            else
              items += ((categ, prod, m.group(1).toLong, 0.0, numD(m.group(2)), num(m.group(3))))
            prod = null
          } else prod = l // amount-looking line that isn't one → item name
        }
        else if (categ != null) prod = l // names the next item, transform_data_pdf:114-115
      }
      i += 1
    }
    if (fecha == null || nro < 0) return Nil
    val parsed = items.result()
    // ticket-level totals broadcast to every row (F6/F7,
    // transform_data_pdf:117-126): bruto = sum(items) − ahorro,
    // meli = round(bruto*0.3, 2) — exact decimal arithmetic, HALF_UP
    val bruto = (parsed.map(_._6).sum - ahorro).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val meli = (bruto * BigDecimal("0.3")).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    parsed.map { case (c, p, q, kg, u, t) =>
      TicketItem(nro, fecha, c, p, q, kg, u, t.toDouble,
        bruto.toDouble, meli.toDouble)
    }
  }

  /** Format a Double the way the ticket prints money: 2 decimals, comma
    * separator. */
  def money(d: Double): String = f"$d%.2f".replace(".", ",")

  /** Exact inverse of [[parse]] for round-trip testing: render relational
    * items (all same ticket) back to ticket text. */
  def render(nro: Long, fecha: String, ahorro: Double,
             items: Seq[(String, String, Long, Double, Double, Double)]): String = {
    val sb = new StringBuilder
    sb ++= s"Fecha $fecha Hora 12:00\n"
    sb ++= "Caja 4\n"
    sb ++= s"P.V. 001 Nro T. $nro\n"
    var last: String = null
    items.foreach { case (categ, prod, cant, peso, unit, total) =>
      if (categ != last) { sb ++= categ + "\n"; last = categ }
      sb ++= prod + "\n"
      if (peso > 0) sb ++= s"x ${money(peso)} x ${money(unit)} ${money(total)}\n"
      else sb ++= s"$cant x ${money(unit)} (090) ${money(total)}\n"
    }
    if (ahorro > 0) sb ++= s"AHORRO $$${money(ahorro)}\n"
    sb ++= s"TOTAL ${money(items.map(_._6).sum - ahorro)}\n"
    sb.result()
  }
}
