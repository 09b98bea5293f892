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
    import scala.jdk.CollectionConverters._
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

  /** Render the first `limit` rows as a markdown table (the Telegram
    * reply formatting; capped like the reference's LIMIT 20 rule). */
  def markdown(df: DataFrame, limit: Int = 20): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    val sb = new StringBuilder
    sb ++= cols.mkString("| ", " | ", " |\n")
    sb ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
    rows.foreach { r =>
      sb ++= cols.indices.map(i => String.valueOf(r.get(i))).mkString("| ", " | ", " |\n")
    }
    sb.toString
  }

  /** Stages 1-4 composed: resolve → execute SQL → render. */
  def answer(spark: SparkSession, sql: String, limit: Int = 20): String =
    markdown(spark.sql(sql), limit)
}
