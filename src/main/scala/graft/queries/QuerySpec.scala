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

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{round, sum}

  /** Money columns are 2-decimal values stored as doubles; summing them in
    * double accumulates order-dependent error, and the exact 4-decimal
    * rationals frequently end in ...50 — so round(sum(double), 2) flips by
    * a cent whenever partitioning changes the summation order. Summing in
    * DECIMAL is exact and order-independent; rounding happens in decimal
    * space, and only the final (identical) value is cast to double.
    *
    * DuckDB oracle equivalent:
    *   CAST(round(sum(CAST(x AS DECIMAL(18,4)) ...), 2) AS DOUBLE)
    */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** round-then-cast for an already-decimal aggregate. */
  def money2(sumExpr: Column): Column = round(sumExpr, 2).cast("double")

  /** Exact decimal sum of a decimal expression → 2-decimal double. */
  def sumMoney(e: Column): Column = money2(sum(e))
}
