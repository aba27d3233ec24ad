package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle = None` → driver records a weaker rows-only check
  * (used for ops whose semantics aren't SQL-expressible, e.g. the HLL
  * sketch or iterative greedy selection).
  *
  * The oracle is a THUNK, evaluated when the driver dumps
  * `SparkEntry.oracleSql` — which `graft.Verify` does AFTER running
  * every query. That ordering lets data-DERIVED constants (the k-means
  * centroids / PQ codebooks trained during the run, session-memoized)
  * inline into the oracle text as literals: the oracle then verifies
  * the whole pipeline downstream of training, and the training itself
  * is seed-pinned by specs. Static oracles just close over a string.
  *
  * Determinism contract (SURVEY.md §7.0): every query ends in a total
  * ORDER BY over a unique key; double aggregation goes through exact
  * DECIMAL accumulation so Spark and DuckDB agree bit-for-bit; output
  * columns are long/string/double only (no raw timestamp/binary/array).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracleThunk: () => Option[String]) {
  def oracle: Option[String] = oracleThunk()
}

object Q {
  def apply(name: String, oracle: => String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, () => Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, () => None)
}
