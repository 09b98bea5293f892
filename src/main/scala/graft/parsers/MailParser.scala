package graft.parsers

import java.security.MessageDigest

/** U2 — bank-payment notification-mail parser (SURVEY.md §2.9).
  *
  * The reference tokenizes the mail's HTML body into visible strings and
  * walks label→value pairs (transform_data_bank_pay/lambda_function.py:29-69):
  * `find_val(label)` returns the token after the label (:22-27), money
  * strings go through the currency/thousands/comma grammar (:9-20), the
  * card name is the first token containing "Tarjeta" (:61), the card number
  * the token after "terminada en" (:42-47), `cuotas` defaults to 1 (:64),
  * and a required-fields gate drops rows missing monto/fecha/comercio
  * (:49-51). The row id is `md5(fecha_hora_monto_comercio_tarjeta_divisa)`
  * (:53-54).
  *
  * Pure Scala function applied via typed `Dataset.map`/`flatMap`; `render`
  * is the inverse used by the round-trip oracle query (FIXTURES.md §B.2).
  */
object MailParser {

  final case class MailDoc(
      message_id: String, date: String, sender: String, subject: String,
      html_body: String, raw_text: String)

  final case class BankPayment(
      id: String, message_id: String, fecha_pago: String, hora_pago: String,
      monto: BigDecimal, divisa: String, tarjeta: String, nro_tarjeta: String,
      comercio: String, cuotas: Int)

  // precompiled — these run once per mail across the whole corpus
  private val moneyMarkRe = java.util.regex.Pattern.compile("(U\\$S|US\\$|USD|ARS\\$|AR\\$|\\$|\\s)")
  private val thousandsRe = java.util.regex.Pattern.compile("\\.(?=\\d{3})")

  /** F26b — HTML → visible-text token list (stripped_strings analog).
    * Single character scan (tag-state machine + whitespace split) — this
    * runs once per mail over the whole corpus, so it avoids the two full
    * regex passes + re-split of the naive form. Semantics identical:
    * tags count as separators, whitespace runs collapse. */
  def tokens(html: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder(24)
    var inTag = false
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') {
        inTag = true
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else if (Character.isWhitespace(c)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** F28 — token after a label token. */
  def findVal(toks: Vector[String], label: String): Option[String] = {
    val i = toks.indexOf(label)
    if (i >= 0 && i + 1 < toks.length) Some(toks(i + 1)) else None
  }

  /** F19 — money-string grammar (strip currency marks, `.` thousands,
    * `,` decimal). */
  def parseMoney(s: String): Option[BigDecimal] = {
    val cleaned = thousandsRe.matcher(moneyMarkRe.matcher(s).replaceAll(""))
      .replaceAll("").replace(',', '.')
    try Some(BigDecimal(cleaned).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    catch { case _: NumberFormatException => None }
  }

  /** F20 — currency code from the raw money string. */
  def currency(s: String): Option[String] =
    if (s.contains("U$S") || s.contains("US$") || s.contains("USD")) Some("USD")
    else if (s.contains("$")) Some("ARS")
    else None

  // one digest instance per executor thread — JCA provider lookup per row
  // would dominate the parse at corpus scale
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val bytes = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Parse one mail document; None when a required field is missing
    * (the null gate, transform_data_bank_pay:49-51). */
  def parse(doc: MailDoc): Option[BankPayment] = {
    val toks = tokens(doc.html_body)
    val montoRaw = findVal(toks, "Monto")
    val fecha = findVal(toks, "Fecha")
    val hora = findVal(toks, "Hora").map(h => if (h.length == 5) h + ":00" else h) // F22
    val comercio = findVal(toks, "Comercio")
    val cuotas = findVal(toks, "Cuotas").flatMap(c => c.toIntOption).getOrElse(1) // F21
    val tarjeta = toks.find(_.contains("Tarjeta")) // F29
    val nroTarjeta = { // token after "terminada en"
      val i = toks.indexOfSlice(Seq("terminada", "en"))
      if (i >= 0 && i + 2 < toks.length) Some(toks(i + 2)) else None
    }
    for {
      mRaw <- montoRaw
      m <- parseMoney(mRaw)
      d <- currency(mRaw)
      f <- fecha
      h <- hora
      c <- comercio
    } yield BankPayment(
      id = md5Hex(s"${f}_${h}_${m}_${c}_${tarjeta.getOrElse("")}_$d"),
      message_id = doc.message_id, fecha_pago = f, hora_pago = h, monto = m,
      divisa = d, tarjeta = tarjeta.orNull, nro_tarjeta = nroTarjeta.orNull,
      comercio = c, cuotas = cuotas)
  }

  /** Inverse of [[parse]] for the round-trip oracle: render a payment as a
    * notification-mail HTML body. */
  def renderHtml(fecha: String, hora: String, montoArs: String, comercio: String,
                 cuotas: Int, last4: String): String =
    s"<html><body><p>Pago con Tarjeta_Santander terminada en $last4</p>" +
      s"<p>Monto $montoArs</p><p>Fecha $fecha</p><p>Hora $hora</p>" +
      s"<p>Comercio $comercio</p><p>Cuotas $cuotas</p></body></html>"
}
