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

  /** Scalar functions a GENERATED query must never call: `reflect` /
    * `java_method` invoke arbitrary JVM static methods driver-side (the
    * expression-level sibling of EXECUTE IMMEDIATE — no relation, no
    * Command, just a function call that reads env vars or worse), and the
    * identity/environment family leaks session state the agent's three
    * tables don't contain. Aggregations, arithmetic, string and date
    * functions — everything the prompt's SQL shape actually needs — are
    * untouched. */
  private val deniedFunctions: Set[String] = Set(
    "reflect", "try_reflect", "java_method",
    "current_user", "session_user", "user",
    "current_database", "current_schema", "current_catalog", "version",
    "input_file_name", "input_file_block_start", "input_file_block_length")

  /** Enforce the prompt's rule 1 on a GENERATED query before running it:
    * the SQL must be a read-only query (no DDL/DML — the reference
    * executes whatever text the LLM returns, with the lambda's
    * credentials, ai_agent:101-125; an engine must not trust that) and
    * every relation it reads must be in `allowed`. Parses without
    * executing. CTE names are exempt SCOPE-AWARELY (the LLM legitimately
    * writes WITH-clauses): a CTE defined inside a subquery exempts only
    * references within that subquery's scope — a same-named relation in
    * an ENCLOSING scope still resolves to the real table and is checked
    * against the allowlist (the laundering shape
    * `SELECT * FROM secrets WHERE id IN (WITH secrets AS … SELECT …)`
    * rejects). A CTE body sees only CTEs defined BEFORE it, never itself:
    * without RECURSIVE, SQL resolves a self-reference to the real table.
    * Qualified references to allowed tables (`default.mp_data`,
    * `spark_catalog.default.mp_data`) are accepted — the generator may
    * legitimately qualify — but any other qualifier fails closed.
    * Case-insensitive to match the session resolver. Throws on violation. */
  def validateSql(spark: SparkSession, sql: String,
                  allowed: Seq[String] = allowedTables): Unit = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation, UnresolvedTableValuedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Expression, PlanExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, UnresolvedWith}
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val ok = allowed.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    // Acceptable qualifier spellings for an allowlisted table in the
    // session catalog; anything else (another catalog, another schema)
    // fails closed.
    def allowedRelation(parts: Seq[String]): Boolean = {
      val p = parts.map(lc)
      ok(p.last) && (p.init match {
        case Seq() | Seq("default") | Seq("spark_catalog", "default") => true
        case _ => false
      })
    }
    def checkExpr(e: Expression, scope: Set[String]): Unit = e.foreach {
      case f: UnresolvedFunction
          if deniedFunctions(lc(f.nameParts.last)) =>
        throw new IllegalArgumentException(
          s"generated SQL calls a denied function (${f.nameParts.mkString(".")}): $sql")
      // IDENTIFIER('…') defers the FUNCTION name to analysis time — this
      // parse-time walk cannot know what it resolves to, so fail closed
      // (IDENTIFIER('reflect')(…) would otherwise dodge the denylist)
      case _: org.apache.spark.sql.catalyst.analysis.ExpressionWithUnresolvedIdentifier =>
        throw new IllegalArgumentException(
          s"generated SQL uses IDENTIFIER() for a deferred function/column name: $sql")
      // subquery expressions carry whole plans the expression walk does
      // not descend into on its own; they see the enclosing CTE scope
      case pe: PlanExpression[_] => pe.plan match {
        case lp: LogicalPlan => check(lp, scope)
        case _ => ()
      }
      case _ => ()
    }
    def check(p: LogicalPlan, scope: Set[String]): Unit = p match {
      case c: Command =>
        throw new IllegalArgumentException(
          s"generated SQL is not a read-only query (${c.nodeName}): $sql")
      case i: InsertIntoStatement =>
        throw new IllegalArgumentException(
          s"generated SQL writes (${i.nodeName}): $sql")
      // INSERT OVERWRITE DIRECTORY writes query output to an ARBITRARY
      // filesystem path and is neither a Command nor an
      // InsertIntoStatement — the write-shaped sibling of the script-
      // transform escape below
      case _: org.apache.spark.sql.catalyst.plans.logical.InsertIntoDir =>
        throw new IllegalArgumentException(
          s"generated SQL writes to a directory (INSERT OVERWRITE DIRECTORY): $sql")
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
      // Hive-style script transform pipes rows through an ARBITRARY OS
      // process (`SELECT TRANSFORM(x) USING 'bash -c …' FROM mp_data`) —
      // it reads only allowed tables, calls no function, and is not a
      // Command, so nothing else in this walk would stop it
      case _: org.apache.spark.sql.catalyst.plans.logical.ScriptTransformation =>
        throw new IllegalArgumentException(
          s"generated SQL pipes rows through an OS process (TRANSFORM ... USING): $sql")
      // IDENTIFIER('…') defers the RELATION name to analysis time, after
      // this walk has approved the plan — `FROM IDENTIFIER('secrets')`
      // carries no UnresolvedRelation at parse time. Fail closed: the
      // allowlist can only vouch for names it can see.
      case _: org.apache.spark.sql.catalyst.analysis.PlanWithUnresolvedIdentifier =>
        throw new IllegalArgumentException(
          s"generated SQL uses IDENTIFIER() for a deferred relation name: $sql")
      case w: UnresolvedWith =>
        // recursive CTEs would let a body legally reference its own name;
        // nothing the agent generates needs them — fail closed
        if (w.allowRecursion) throw new IllegalArgumentException(
          s"generated SQL uses WITH RECURSIVE: $sql")
        // each body sees only the CTEs defined before it (a self-reference
        // without RECURSIVE resolves to the real table — must be checked);
        // the main query sees them all
        var s = scope
        w.cteRelations.foreach { case (name, body, _) =>
          check(body, s)
          s = s + lc(name)
        }
        check(w.child, s)
      case r: UnresolvedRelation =>
        val parts = r.multipartIdentifier
        val bare = lc(parts.mkString("."))
        if (!allowedRelation(parts) && !(parts.length == 1 && scope(bare)))
          throw new IllegalArgumentException(
            s"generated SQL reads outside the allowed schema: ${parts.mkString(".")}")
      case tvf: UnresolvedTableValuedFunction
          if deniedFunctions(lc(tvf.name.last)) =>
        throw new IllegalArgumentException(
          s"generated SQL calls a denied function (${tvf.name.mkString(".")}): $sql")
      case other =>
        other.children.foreach(check(_, scope))
        other.expressions.foreach(checkExpr(_, scope))
    }
    check(plan, Set.empty)
    // Layer 2 (structural, VERDICT r14 missing-#1): the walk above vets
    // NAMES before resolution; this vets the RESOLVED plan. Safe to invoke
    // the analyzer only now — Commands, EXECUTE IMMEDIATE and
    // ExecutableDuringAnalysis (the analysis-time side-effect surface)
    // were all rejected above, so analysis here is pure resolution.
    validateAnalyzed(spark, plan, sql, allowed)
  }

  /** Logical node types a read-only SELECT can legitimately analyze to.
    * This is an ALLOWLIST, the inverse of layer 1's enumerated denials:
    * when a Spark upgrade mints a new side-effecting node the parse walk
    * has never heard of, it fails CLOSED here instead of sailing through
    * (the TRANSFORM/INSERT OVERWRITE DIRECTORY lesson from r14 — those
    * were found only by enumerating parser nodes). Matching on nodeName
    * keeps this readable; an upstream rename also fails closed. */
  private val allowedAnalyzedNodes: Set[String] = Set(
    "Project", "Filter", "Aggregate", "Join", "LateralJoin", "Sort",
    "GlobalLimit", "LocalLimit", "Offset", "Tail", "Distinct", "Deduplicate",
    "Union", "Intersect", "Intersect All", "Except", "Except All",
    "SubqueryAlias", "Window", "Expand",
    "Generate", "Sample", "WithCTE", "CTERelationDef", "ResolvedHint",
    "Unpivot", "Repartition", "RepartitionByExpression", "RebalancePartitions")

  /** Validate the ANALYZED form of an already parse-vetted plan: every
    * node must come from [[allowedAnalyzedNodes]], every table-backed leaf
    * must carry an allowlisted identifier (a leaf with NO identifier —
    * e.g. a path-based scan — fails closed: the allowlist can only vouch
    * for names), and no resolved expression may be one of the denied
    * reflection/identity classes. View boundaries are checked by NAME and
    * not descended into — a view's body is the catalog's trusted
    * definition, not the generated query's text. An UNRESOLVED-NAME
    * analysis failure (table/column/function not found) is NOT a gate
    * violation: the same analyzer will refuse to execute that SQL, so
    * there is nothing to protect — callers legitimately validate against
    * catalogs that don't have the tables registered. That skip is LOGGED
    * (a validate-here/execute-there split must know layer 2 never ran and
    * re-validate in the executing session). Any OTHER AnalysisException
    * propagates: a blanket catch made the entire structural layer vanish
    * for every analysis-failure class (r15 advice) — fail closed. */
  private[graft] def validateAnalyzed(spark: SparkSession,
                                   parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                                   sql: String, allowed: Seq[String]): Unit = {
    val analyzed =
      try spark.sessionState.executePlan(parsed).analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException if unresolvedName(e) =>
          log.warn(s"SQL gate layer 2 (resolved-plan walk) SKIPPED — the " +
            s"validating catalog cannot resolve a name (${e.getCondition}); " +
            s"the executing session must re-validate: $sql")
          return
      }
    validateAnalyzedPlan(analyzed, sql, allowed)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The analysis-failure classes that mean "this catalog doesn't have the
    * name", not "the plan is malformed" — the only failures layer 2 may
    * skip on. Matched by error-condition prefix so sub-conditions
    * (`UNRESOLVED_COLUMN.WITH_SUGGESTION`, …) are covered; an exception
    * carrying no condition (legacy single-message form) fails closed. */
  private def unresolvedName(e: org.apache.spark.sql.AnalysisException): Boolean = {
    val skippable = Seq("TABLE_OR_VIEW_NOT_FOUND", "UNRESOLVED_COLUMN",
      "UNRESOLVED_FIELD", "UNRESOLVED_MAP_KEY", "UNRESOLVED_USING_COLUMN",
      "UNRESOLVED_ROUTINE", "UNRESOLVED_VARIABLE")
    Option(e.getCondition).exists(c => skippable.exists(c.startsWith))
  }

  private[graft] def validateAnalyzedPlan(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      sql: String, allowed: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.catalyst.expressions.{CallMethodViaReflection, CurrentCatalog, CurrentDatabase, CurrentUser, Expression, InputFileBlockLength, InputFileBlockStart, InputFileName, PlanExpression, SparkVersion}
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val ok = allowed.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def allowedName(parts: Seq[String]): Boolean = {
      val p = parts.map(lc)
      p.nonEmpty && ok(p.last) && (p.init match {
        case Seq() | Seq("default") | Seq("spark_catalog", "default") => true
        case _ => false
      })
    }
    def reject(what: String): Nothing = throw new IllegalArgumentException(
      s"generated SQL analyzed to a non-query node ($what): $sql")
    def checkExpr(e: Expression): Unit = e.foreach {
      case _: CallMethodViaReflection | _: CurrentUser | _: CurrentDatabase |
          _: CurrentCatalog | _: SparkVersion | _: InputFileName |
          _: InputFileBlockStart | _: InputFileBlockLength =>
        throw new IllegalArgumentException(
          s"generated SQL resolved to a denied expression (${e.getClass.getSimpleName}): $sql")
      case pe: PlanExpression[_] => pe.plan match {
        case lp: LogicalPlan => walk(lp)
        case _ => ()
      }
      case _ => ()
    }
    def walk(p: LogicalPlan): Unit = p match {
      case v: View =>
        if (!allowedName(v.desc.identifier.nameParts)) reject(
          s"view ${v.desc.identifier}") // body not descended: catalog-owned
      case l: LogicalRelation =>
        if (!l.catalogTable.map(_.identifier.nameParts).exists(allowedName))
          reject(s"relation without an allowlisted identifier (${l.simpleString(40)})")
      case h: HiveTableRelation =>
        if (!allowedName(h.tableMeta.identifier.nameParts)) reject(
          s"table ${h.tableMeta.identifier}")
      case d: DataSourceV2Relation =>
        if (!d.identifier.map(id => (id.namespace.toSeq :+ id.name)).exists(allowedName))
          reject(s"v2 relation ${d.name}")
      case _: LocalRelation | _: OneRowRelation | _: Range |
          _: CTERelationRef => ()
      case n if allowedAnalyzedNodes(n.nodeName) =>
        n.expressions.foreach(checkExpr)
        n.children.foreach(walk)
      case other => reject(other.nodeName)
    }
    walk(analyzed)
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
    // NULL renders as an EMPTY cell — the reference's typed cell decode
    // leaves empties (ai_agent:137-149), and the literal string "null"
    // would be indistinguishable from data in the reply
    def cell(v: Any): String = (if (v == null) "" else String.valueOf(v))
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

  /** Stages 1-4 composed: resolve → validate → execute SQL → render.
    * Validates against the SAME gate as [[answerQuestion]] — there is no
    * execute path that skips [[validateSql]] (a gate with an unvalidated
    * sibling entry point claims safety it doesn't have). Callers running
    * trusted, hand-written SQL pass their own `allowed` list. */
  def answer(spark: SparkSession, sql: String, limit: Int = 20,
             allowed: Seq[String] = allowedTables): String = {
    validateSql(spark, sql, allowed)
    markdown(spark.sql(sql), limit)
  }

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
