package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Pack

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All query logic lives in graft.queries.Pack; this object only adapts it
  * to the driver's shape. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The ai_agent "gastos por categoría" surface (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    Pack.byName("agg_group_topk").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Pack.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Pack.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
