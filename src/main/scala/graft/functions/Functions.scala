package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — Spark `Column` expressions for the
  * reference's scalar surface (SURVEY.md §2.8). Everything here is
  * built from codegen'd builtins (no UDFs) so it stays inside
  * whole-stage codegen and remains pushdown-friendly.
  */
object Functions {

  /** Shelley-era boundary on Cardano mainnet: first 1-second slot.
    * (/root/reference/token_fee_analysis.py:8-16)
    */
  val ShelleyStartSlot: Long = 4492800L
  val ShelleyStartPosixMs: Long = 1596059091000L
  val ByronStartPosixMs: Long = 1506203091000L

  /** F4 — era-aware slot → POSIX milliseconds (piecewise linear):
    * Shelley slots are 1 s from slot 4,492,800; Byron slots are 20 s
    * from POSIX 1,506,203,091,000 ms.
    * (/root/reference/token_fee_analysis.py:8-16)
    */
  def slotToPosixMs(slot: Column): Column =
    when(slot >= ShelleyStartSlot,
      lit(ShelleyStartPosixMs) + (slot - ShelleyStartSlot) * 1000L)
      .otherwise(lit(ByronStartPosixMs) + slot * 20000L)

  /** Same SQL text, for oracle parity / spark.sql use. */
  def slotToPosixMsSql(slotExpr: String): String =
    s"CASE WHEN $slotExpr >= $ShelleyStartSlot " +
      s"THEN $ShelleyStartPosixMs + ($slotExpr - $ShelleyStartSlot) * 1000 " +
      s"ELSE $ByronStartPosixMs + $slotExpr * 20000 END"

  /** F4 continued — slot → TimestampType, for window/time ops. */
  def slotToTimestamp(slot: Column): Column =
    timestamp_millis(slotToPosixMs(slot))

  /** F5 — lovelace → ADA (/root/reference/token_fee_analysis.py:313). */
  def lovelaceToAda(lovelace: Column): Column = lovelace / 1000000L

  /** P4 — dynamic AND-composition of an optional inclusive range
    * predicate, the reference's optional slot-range filter
    * (/root/reference/token_fee_analysis.py:133-140). Returns
    * `lit(true)` when both bounds are absent.
    */
  def rangeFilter(col: Column, min: Option[Column], max: Option[Column]): Column =
    Seq(min.map(col >= _), max.map(col <= _))
      .flatten
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** µs-truncate a nanoseconds-since-epoch long: DuckDB reads parquet
    * TIMESTAMP(NANOS) at microsecond precision, so every cross-engine
    * comparison/order/bucket on the event-time axis must truncate
    * (`epoch_ns(ts)` on the oracle side is already µs-truncated).
    */
  def tsUs(c: Column): Column = c - c % 1000L

  /** Exact decimal accumulator cast for order-independent, engine-exact
    * double aggregation (SURVEY.md §7.0 determinism rules): a double is
    * rounded to a fixed decimal scale (deterministic — both engines round
    * the exact binary value), summed exactly as DECIMAL, and only the
    * final result is cast back to double.
    */
  def dec(c: Column): Column = c.cast("decimal(38,6)")

  /** Matching DuckDB-side SQL fragment for [[dec]]. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(38,6))"

  /** DuckDB-side DECIMAL→DOUBLE read-back for oracle SQL. NOT a plain
    * `CAST(x AS DOUBLE)`: DuckDB converts decimals in two roundings
    * (int128 unscaled → double, then ÷10^scale), which drifts 1 ULP
    * from the correctly-rounded conversion once the unscaled value
    * passes 2⁵³ (≈9.0e9 units at scale 6 — q03's sf1 group sums cross
    * it). Spark's `Decimal.toDouble` is correctly rounded
    * (BigDecimal.doubleValue), as is [[MicrosDouble]]. Routing DuckDB
    * through VARCHAR makes its conversion single-rounded too (decimal→
    * string is exact; strtod is correctly rounded), so both engines
    * agree bit-for-bit at every scale factor.
    */
  def dblSql(e: String): String = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  /** Long-partial twin of the [[dec]] accumulator, for the hot grouped
    * sums: `microsDouble(sum(decMicros(c)))` is bit-identical to
    * `sum(dec(c)).cast("double")` while the SUM runs on primitive LONG
    * partials (in-place-mutable codegen buffer) instead of
    * DECIMAL(38,6)'s per-add BigDecimal. Valid while the group's
    * unscaled total stays within ±2⁶³ (|Σc| < ~9.2e12 units) —
    * see [[graft.functions.DecimalMicros]]; keep [[dec]] above that.
    */
  def decMicros(c: Column): Column = call_function("decimal_micros", c)

  /** Final per-group read-back for [[decMicros]] sums. */
  def microsDouble(c: Column): Column = call_function("micros_double", c)

  /** Cell-level read-back of a micros long into the exact DECIMAL(38,6)
    * it encodes, for headroom-safe SECOND-level summation (rollup/cube
    * grand totals, which aggregate ungrouped-scale magnitudes): the
    * value has at most 6 decimal places, so the division is exact at
    * the result scale and the re-cast changes representation, not
    * value. Runs once per pre-aggregated CELL — its BigDecimal hop is
    * off the per-row hot path, while the 128-bit DECIMAL partials above
    * it keep the ±2⁶³ micros bound from ever applying to the roll-up.
    */
  def microsDec(c: Column): Column =
    (c.cast("decimal(38,6)") / lit(1000000).cast("decimal(7,0)"))
      .cast("decimal(38,6)")

  /** DuckDB twin of [[microsDec]] for oracle SQL over micros longs. */
  def microsDecSql(e: String): String =
    s"CAST(CAST($e AS DECIMAL(38,6)) / 1000000 AS DECIMAL(38,6))"
}
