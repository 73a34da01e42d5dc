package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QuerySpec {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QuerySpec =
    QuerySpec(fn, Some(sql))
}
