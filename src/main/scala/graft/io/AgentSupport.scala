package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The NL-analytics endpoint's engine-side support (SURVEY.md §3.3):
  * stage 1 — catalog resolve → schema description (the Glue get_tables →
  * prompt block, ai_agent/lambda_function.py:22-36, 51-69); stage 4 —
  * result rows → markdown table (U4, ai_agent:127-154). The LLM itself
  * stays outside the engine; these are the seams it plugs into. */
object AgentSupport {

  /** Describe catalog tables matching a prefix as the schema block a
    * SQL-generating agent consumes: one `table(col type, …)` line each. */
  def describeSchemas(spark: SparkSession, prefix: String): String = {
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(prefix))
      .sortBy(_.name)
      .map { t =>
        val cols = spark.catalog.listColumns(t.name).collect()
          .map(c => s"${c.name} ${c.dataType}").mkString(", ")
        s"${t.name}($cols)"
      }
      .mkString("\n")
  }

  /** The tables the agent prompt exposes — its rule 1 ("usa solo estas
    * columnas y las tablas mencionadas", ai_agent/lambda_function.py:59). */
  val allowedTables: Seq[String] = Seq("bank_payments", "mp_data", "carrefour_data")

  /** The prompt's table-routing golden rules (ai_agent/lambda_function.py:
    * 62-64), pinned as a deterministic contract: banco/santander →
    * bank_payments; mercado pago → mp_data; supermercado/carrefour →
    * carrefour_data. Tested in rule order (3 → 4 → 5), so a question
    * naming both banco and carrefour routes to bank_payments exactly as
    * the prompt's first-matching-rule reading. Unroutable questions fail
    * loudly — the reference would hand those to the LLM unconstrained,
    * which is outside the engine's deterministic surface. */
  // word-start guard: a bare substring test would route "supermercado
  // pagos…" to mp_data ("mercado pago" IS a substring of it) — the kind
  // of aliasing the reference's LLM absorbs silently and a deterministic
  // router must pin down
  private val mpPattern =
    java.util.regex.Pattern.compile("(?<!\\p{L})mercado ?pago")

  def routeTable(question: String): String = {
    val q = question.toLowerCase(java.util.Locale.ROOT)
    val routed =
      if (q.contains("banco") || q.contains("santander")) "bank_payments"
      else if (mpPattern.matcher(q).find()) "mp_data"
      else if (q.contains("supermercado") || q.contains("carrefour")) "carrefour_data"
      else throw new IllegalArgumentException(
        s"unroutable question (no table keyword): $question")
    require(allowedTables.contains(routed), s"routed outside schema: $routed")
    routed
  }

  /** Enforce the prompt's rule 1 on a GENERATED query before running it:
    * the SQL must be a read-only query (no DDL/DML — the reference
    * executes whatever text the LLM returns, with the lambda's
    * credentials, ai_agent:101-125; an engine must not trust that) and
    * every relation it reads must be in `allowed`. Parses without
    * executing; names defined by the query's own CTEs are exempt (the
    * LLM legitimately writes WITH-clauses), everything else — including
    * relations inside subquery expressions — must be allowlisted.
    * Case-insensitive to match the session resolver. Throws on violation. */
  def validateSql(spark: SparkSession, sql: String,
                  allowed: Seq[String] = allowedTables): Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, UnresolvedWith}
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    // UnresolvedWith keeps its CTE definitions as innerChildren (only the
    // main query is its child), so a plain collect never sees a CTE's
    // body — exactly where a forbidden table would hide. Descend into
    // them explicitly, recursively (CTEs nest), and through subquery
    // expressions everywhere.
    def nodes(p: LogicalPlan): Seq[LogicalPlan] = {
      val here = p.collectWithSubqueries { case n => n }
      val cteBodies = here.collect {
        case w: UnresolvedWith => w.cteRelations.map(_._2)
      }.flatten
      here ++ cteBodies.flatMap(nodes)
    }
    val all = nodes(plan)
    all.foreach {
      case c: Command =>
        throw new IllegalArgumentException(
          s"generated SQL is not a read-only query (${c.nodeName}): $sql")
      case i: InsertIntoStatement =>
        throw new IllegalArgumentException(
          s"generated SQL writes (${i.nodeName}): $sql")
      // NOT Commands, found by review: EXECUTE IMMEDIATE nests arbitrary
      // SQL in a string expression this validator cannot see into, and
      // CALL (ExecutableDuringAnalysis) runs procedure side effects at
      // analysis time — both would otherwise sail through the relation
      // check with zero UnresolvedRelations
      case _: org.apache.spark.sql.catalyst.analysis.UnresolvedExecuteImmediate =>
        throw new IllegalArgumentException(
          s"generated SQL nests dynamic SQL (EXECUTE IMMEDIATE): $sql")
      case x: org.apache.spark.sql.catalyst.plans.logical.ExecutableDuringAnalysis =>
        throw new IllegalArgumentException(
          s"generated SQL executes during analysis (${x.nodeName}): $sql")
      case _ => ()
    }
    val cteNames = all.collect { case w: UnresolvedWith =>
      w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    val ok = allowed.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val bad = all.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.filterNot(n => {
      val l = n.toLowerCase(java.util.Locale.ROOT)
      ok(l) || cteNames(l)
    })
    require(bad.isEmpty,
      s"generated SQL reads outside the allowed schema: ${bad.distinct.mkString(", ")}")
  }

  /** Schema block over an explicit table list — the agent prompt names its
    * three tables outright (ai_agent:54-57) rather than by prefix. */
  def describeTables(spark: SparkSession, names: Seq[String]): Seq[String] =
    names.map { t =>
      val cols = spark.catalog.listColumns(t).collect()
        .map(c => s"${c.name} ${c.dataType}").mkString(", ")
      s"$t($cols)"
    }

  /** Render the first `limit` rows as a markdown table (the Telegram
    * reply formatting; capped like the reference's LIMIT 20 rule).
    * Cell values escape the table's OWN structural characters — a value
    * containing '|' or a newline would otherwise splice extra columns or
    * rows into the reply (data-driven render corruption, the markdown
    * sibling of SQL injection). */
  def markdown(df: DataFrame, limit: Int = 20): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    def cell(v: Any): String = String.valueOf(v)
      .replace("\\", "\\\\").replace("|", "\\|")
      .replace("\r", " ").replace("\n", " ")
    val sb = new StringBuilder
    sb ++= cols.map(cell).mkString("| ", " | ", " |\n")
    sb ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
    rows.foreach { r =>
      sb ++= cols.indices.map(i => cell(r.get(i))).mkString("| ", " | ", " |\n")
    }
    sb.toString
  }

  /** Stages 1-4 composed: resolve → execute SQL → render. */
  def answer(spark: SparkSession, sql: String, limit: Int = 20): String =
    markdown(spark.sql(sql), limit)

  /** The whole handle_message read path minus the LLM
    * (ai_agent/lambda_function.py:156-199), as one call: route the
    * question to its table (rules 3-5), obtain the SQL from the caller's
    * generator — in the reference that's the GPT call, here any
    * `table => sql` function, e.g. a template bank or a model client —
    * validate it against the catalog contract (rule 1 + read-only),
    * execute, and render the reply capped at 20 rows (rule 6). The LLM
    * is the ONLY seam left outside the engine, and it is injected, not
    * trusted: whatever it returns passes validateSql before touching
    * the session. */
  def answerQuestion(spark: SparkSession, question: String,
                     sqlForTable: String => String, limit: Int = 20): String = {
    val table = routeTable(question)
    val sql = sqlForTable(table)
    validateSql(spark, sql)
    markdown(spark.sql(sql), limit)
  }
}
