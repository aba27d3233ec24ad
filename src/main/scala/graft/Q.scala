package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle = None` → driver records a weaker rows-only check
  * (used for ops whose semantics aren't SQL-expressible, e.g. LSH ANN).
  *
  * Determinism contract (SURVEY.md §7.0): every query ends in a total
  * ORDER BY over a unique key; double aggregation goes through exact
  * DECIMAL accumulation so Spark and DuckDB agree bit-for-bit; output
  * columns are long/string/double only (no raw timestamp/binary/array).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
