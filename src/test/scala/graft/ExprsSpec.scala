package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exprs

class ExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("parseMoney handles the reference grammar forms") {
    val cases = Map(
      "$1.234,56" -> "1234.56", "U$S 12,34" -> "12.34", "AR$ 99" -> "99.00",
      "USD1.000.000,10" -> "1000000.10", "55,5" -> "55.50")
    cases.foreach { case (in, want) =>
      assert(one(Exprs.parseMoney(lit(in))).toString == want, s"in=$in")
    }
  }

  test("parseMoney round-trips any 2-decimal amount (seeded property)") {
    // scalacheck-style property, seeded RNG (no scalatestplus bridge offline)
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)(BigDecimal(rnd.nextLong(999999999L), 2))
    val df = cases.map(d => "$" + d.toString.replace(".", ",")).toDF("m")
    val parsed = df.select(Exprs.parseMoney(col("m")).cast("string")).as[String].collect()
    assert(parsed.toSeq == cases.map(_.toString))
  }

  test("currencyCode: U$S→USD, $→ARS, else NULL") {
    assert(one(Exprs.currencyCode(lit("U$S 12"))) == "USD")
    assert(one(Exprs.currencyCode(lit("$12"))) == "ARS")
    assert(one(Exprs.currencyCode(lit("12"))) == null)
  }

  test("fixTwoDigitYear rewrites only 2-digit years") {
    assert(one(Exprs.fixTwoDigitYear(lit("05/03/24"))) == "05/03/2024")
    assert(one(Exprs.fixTwoDigitYear(lit("05/03/2024"))) == "05/03/2024")
  }

  test("timeNormalize appends seconds only to HH:mm") {
    assert(one(Exprs.timeNormalize(lit("19:44"))) == "19:44:00")
    assert(one(Exprs.timeNormalize(lit("19:44:10"))) == "19:44:10")
  }

  test("labelNext finds the token after a label, null when absent/terminal") {
    val toks = split(lit("Monto $12,50 Fecha 01/02/2024"), " ")
    assert(one(Exprs.labelNext(toks, "Monto")) == "$12,50")
    assert(one(Exprs.labelNext(toks, "Fecha")) == "01/02/2024")
    assert(one(Exprs.labelNext(toks, "Hora")) == null)
    assert(one(Exprs.labelNext(split(lit("a b Monto"), " "), "Monto")) == null)
  }

  test("b64UrlDecode inverts urlsafe base64") {
    val s = "hola señor ¿qué tal?"
    val enc = java.util.Base64.getUrlEncoder.encodeToString(s.getBytes("UTF-8"))
    assert(one(Exprs.b64UrlDecode(lit(enc))) == s)
  }

  test("htmlStrip drops tags and collapses whitespace") {
    assert(one(Exprs.htmlStrip(lit("<p>a</p>\n <b>b</b>  c"))) == "a b c")
  }

  test("regexFilename extracts the Report_<date>_<id>.<ext> groups") {
    val p = lit("mp/Report_2024-05-01_12345.csv")
    assert(one(Exprs.regexFilename(p, 2)) == "2024-05-01")
    assert(one(Exprs.regexFilename(p, 3)) == "12345")
    assert(one(Exprs.regexFilename(lit("nope.txt"), 3)) == "")
  }

  test("typed Aggregator registered for SQL: graft_geomean callable from SQL text") {
    spark.udf.register("graft_geomean",
      org.apache.spark.sql.functions.udaf(graft.plans.GeoMeanAgg,
        org.apache.spark.sql.Encoders.scalaDouble))
    val viaSql = spark.sql(
      """SELECT round(graft_geomean(v), 9) FROM VALUES (2.0), (8.0) AS t(v)""")
      .head().getDouble(0)
    assert(viaSql == 4.0, s"geomean(2,8) must be 4, got $viaSql")
  }

  test("Spark 4 collations: case-insensitive compare and grouping") {
    // UTF8_LCASE makes comparison/grouping case-insensitive without
    // lower() rewrites — the collation travels with the type
    val r = spark.sql(
      "SELECT 'Carrefour' COLLATE UTF8_LCASE = 'CARREFOUR' AS eq").head()
    assert(r.getBoolean(0))
    val groups = spark.sql(
      """SELECT count(DISTINCT c) AS n FROM VALUES
        |('Visa'), ('VISA'), ('visa'), ('Master') AS t(s),
        |LATERAL (SELECT s COLLATE UTF8_LCASE AS c)""".stripMargin)
    assert(groups.head().getLong(0) == 2, "case variants collapse under UTF8_LCASE")
  }

  test("SQL-defined function (Spark 4 SQL UDF) matches the native money parser") {
    // the F19 grammar as a declarative SQL scalar function: pure SQL
    // body, fully visible to Catalyst (inlined, codegen'd) — the
    // engine-side packaging a SQL-first team would use for the same rule
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION parse_money_sql(s STRING)
        |RETURNS DECIMAL(12,2)
        |RETURN CAST(replace(replace(
        |  regexp_replace(s, '(U\\$S|US\\$|USD|ARS\\$|AR\\$|\\$)\\s*', ''),
        |  '.', ''), ',', '.') AS DECIMAL(12,2))""".stripMargin)
    val cases = Seq("U$S 1.234,56", "$ 999,10", "ARS$ 12,00", "1.000.000,99")
    cases.foreach { c =>
      val viaSql = spark.sql(s"SELECT parse_money_sql('${c.replace("$", "$")}')")
        .head().getDecimal(0)
      val viaExpr = spark.range(1).select(
        Exprs.parseMoney(lit(c)).as("m")).head().getDecimal(0)
      assert(viaSql == viaExpr, s"mismatch on '$c': sql=$viaSql expr=$viaExpr")
    }
  }

  test("canonicalizeUrl collapses every noise axis independently (seeded property)") {
    // 300 random compositions of the six presentation-noise axes over a
    // fixed identity must all reach the same canonical form
    val rnd = new scala.util.Random(7)
    def variant(): String = {
      val scheme = if (rnd.nextBoolean()) "https" else "HTTPS"
      val host = if (rnd.nextBoolean()) "www.data.Example.COM" else "www.data.example.com"
      val port = if (rnd.nextBoolean()) ":443" else ""
      val slash = if (rnd.nextBoolean()) "/" else ""
      val params = rnd.shuffle(Seq("a=1", "b=2", "utm_source=x", "utm_medium=y")
        .take(2 + rnd.nextInt(3)))
      val frag = if (rnd.nextBoolean()) "#frag" else ""
      s"$scheme://$host$port/corpus/42$slash?${params.mkString("&")}$frag"
    }
    // params sample always contains a=1 and b=2 (take keeps prefix before shuffle)
    val urls = Seq.fill(300)(variant()).toDF("u")
    val canon = urls.select(Exprs.canonicalizeUrl(col("u"))).distinct()
      .as[String].collect().toSeq
    assert(canon == Seq("https://www.data.example.com/corpus/42?a=1&b=2"),
      s"every variant must collapse to one canonical form, got: $canon")
  }

  test("canonicalizeUrl preserves distinctions that are NOT noise") {
    // different host, path, or real param VALUES must stay distinct
    val urls = Seq(
      "https://www.data.example.com/corpus/42?a=1&b=2",
      "https://www.data.example.com/corpus/43?a=1&b=2", // other path
      "https://www.other.example.com/corpus/42?a=1&b=2", // other host
      "https://www.data.example.com/corpus/42?a=9&b=2", // other value
      "http://www.data.example.com/corpus/42?a=1&b=2" // other scheme
    ).toDF("u")
    assert(urls.select(Exprs.canonicalizeUrl(col("u"))).distinct().count() == 5)
  }

  test("canonicalizeUrl passes non-hierarchical URLs through unchanged") {
    // a crawled corpus carries bare hosts, relative paths and mailto:
    // rows; collapsing them to one canonical key would dedup unrelated
    // documents — they must each survive as themselves
    val odd = Seq("example.com/a", "other.org/b", "mailto:x@y.example", "/rel/path")
    val out = odd.toDF("u").select(Exprs.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq
    assert(out == odd, "non-hierarchical inputs must round-trip unchanged")
  }
}
