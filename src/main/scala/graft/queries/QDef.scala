package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: the Spark program plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL run by the driver at sf0.01
  * (driver contract, SparkEntry.scala). Oracle column names/aliases MUST
  * match the Spark result exactly — the comparison sorts columns by name
  * before hashing. */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
