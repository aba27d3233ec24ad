package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Functions.{decMicros, microsDouble}
import graft.io.Tables.{table, tableFan, tableFanBy}

/** Operators the reference does NOT use (SURVEY.md §2.3/§2.4/§2.7
  * "not present" rows) but a complete engine must offer — each
  * demonstrated Spark-first with a DuckDB oracle, so the coverage claim
  * is verified, not asserted.
  */
object ExtendedQueries {

  // ---------------------------------------------------------------------
  // q17 — set operations (§2.7: none in reference): UNION (distinct),
  // INTERSECT and EXCEPT over customer segments. Spark plans these as
  // aggregates/joins; tagging each branch keeps the result readable and
  // the output total-ordered.
  // ---------------------------------------------------------------------
  val q17 = Q("q17_set_ops",
    """WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000),
      |auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      |SELECT 'union' AS op, c_custkey FROM (SELECT * FROM hi UNION SELECT * FROM auto)
      |UNION ALL
      |SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM auto)
      |UNION ALL
      |SELECT 'except' AS op, c_custkey FROM (SELECT * FROM hi EXCEPT SELECT * FROM auto)
      |ORDER BY op, c_custkey""".stripMargin
  ) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val hi = c.filter(col("c_acctbal") > 8000d).select("c_custkey")
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    hi.union(auto).distinct().select(lit("union").as("op"), col("c_custkey"))
      .unionAll(hi.intersect(auto).select(lit("intersect").as("op"), col("c_custkey")))
      .unionAll(hi.except(auto).select(lit("except").as("op"), col("c_custkey")))
      .orderBy("op", "c_custkey")
  }

  // ---------------------------------------------------------------------
  // q18 — ROLLUP (§2.4: no grouping sets in reference): hierarchical
  // subtotals over (returnflag, linestatus). Group-marker NULLs are
  // coalesced to a sentinel BEFORE the ORDER BY — Spark sorts NULLS
  // FIRST, DuckDB NULLS LAST, so raw NULL keys would never hash-match.
  // ---------------------------------------------------------------------
  val q18 = Q("q18_rollup",
    s"""SELECT COALESCE(l_returnflag, '<all>') AS rflag,
       |  COALESCE(l_linestatus, '<all>') AS lstatus,
       |  COUNT(*) AS cnt,
       |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rflag, lstatus""".stripMargin
  ) { (spark, dir) =>
    // Pre-aggregate to the grouping keys BEFORE the rollup: the naive
    // `.rollup` over the fact table plans Expand (3 output rows per
    // input row) into the aggregate — 3× the rows hashed. Aggregating
    // to the ~distinct-key-combination relation first (ordinary
    // map-side-partial groupBy), then rolling up the tiny pre-aggregate
    // (COUNT→SUM cnt, SUM→SUM of exact-decimal partials), is
    // bit-identical and at 100 TB turns the Expand from a fact-table
    // multiplier into a no-op over a few dozen rows. (Empty-input note:
    // the grand-total row's count is coalesced to 0 — a rollup over an
    // empty pre-aggregate yields NULL sums where the direct form counts
    // 0.)
    // Long-micros partials in the fact-table pre-aggregate (the hot
    // level; see DecimalMicros — quantity totals sit orders of
    // magnitude under the ±2⁶³ bound even ungrouped). The rollup level
    // re-sums a few dozen longs.
    graft.functions.CustomFunctions.register(spark)
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt0"),
        sum(decMicros(col("l_quantity"))).as("sum0"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(coalesce(sum("cnt0"), lit(0L)).as("cnt"),
        microsDouble(sum("sum0")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("rflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("lstatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("rflag", "lstatus")
  }

  // ---------------------------------------------------------------------
  // q19 — anti join + full outer join (§2.3: neither in reference):
  // customers who never ordered (anti), and the nation↔customer-nation
  // full outer alignment with null-safe tagging.
  // ---------------------------------------------------------------------
  val q19 = Q("q19_anti_full_outer",
    """WITH never AS (
      |  SELECT c_custkey FROM customer
      |  WHERE c_custkey NOT IN (
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 400000)),
      |cn AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9900)
      |SELECT 'never_ordered' AS op, CAST(c_custkey AS BIGINT) AS key
      |FROM never
      |UNION ALL
      |SELECT CASE WHEN n.n_nationkey IS NULL THEN 'cust_only'
      |            WHEN cn.c_nationkey IS NULL THEN 'nation_only'
      |            ELSE 'both' END AS op,
      |       CAST(COALESCE(n.n_nationkey, cn.c_nationkey) AS BIGINT) AS key
      |FROM (SELECT n_nationkey FROM nation WHERE n_nationkey < 20) n
      |FULL OUTER JOIN cn ON cn.c_nationkey = n.n_nationkey
      |ORDER BY op, key""".stripMargin
  ) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    // anti join: customers who never placed a >400k order. Measured,
    // rejected (round 12): shuffle_hash on the key side — 0.77→0.86 s
    // solo at sf10, same window. Unlike q33, the BUILD side here (the
    // ~3M filtered order keys) outnumbers the PROBE side (1.5M
    // customers), so hashing the bigger relation to skip sorting the
    // smaller one is backwards; sort-merge stands.
    val never = c
      .join(table(spark, dir, "orders")
          .filter(col("o_totalprice") > 400000d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("never_ordered").as("op"), col("c_custkey").cast("long").as("key"))
    val n = table(spark, dir, "nation")
      .filter(col("n_nationkey") < 20).select("n_nationkey")
    val cn = c.filter(col("c_acctbal") > 9900d).select("c_nationkey").distinct()
    val fo = n.join(cn, col("c_nationkey") === col("n_nationkey"), "full_outer")
      .select(
        when(col("n_nationkey").isNull, "cust_only")
          .when(col("c_nationkey").isNull, "nation_only")
          .otherwise("both").as("op"),
        coalesce(col("n_nationkey"), col("c_nationkey")).cast("long").as("key"))
    never.unionAll(fo).orderBy("op", "key")
  }

  // ---------------------------------------------------------------------
  // q20 — approximate distinct (§2.4: the scale answer to COUNT
  // DISTINCT): a RELATIONAL HyperLogLog (Flajolet et al. 2007), built
  // so the whole sketch is oracle-recomputable — the same trick that
  // oracled t06's count-min (TextQueries.scala): Spark's builtin
  // `approx_count_distinct` carries engine-internal HLL++ bias tables
  // no oracle can recompute, so rounds ≤8 ran it rows-only. Here both
  // engines derive identical registers from `md5_lower64` /
  // `md5_number_lower` (full-64-bit-twin hash, see Md5Lower64):
  // register index j = low p bits; rank ρ = leading-zero run of the
  // remaining 64-p bits + 1, computed PORTABLY as
  // (64-p+1) - length(bin(w)) — `bin()` (exact integer → binary
  // string) exists in both engines, unlike count-leading-zeros, and
  // avoids floor(log2(w)) whose double rounding can misclassify exact
  // powers of two. The harmonic sum Σ 2^-M[j] is kept EXACT as the
  // integer Σ 2^(62-M[j]) (a shiftleft per register, always in
  // ±2⁶³ for p ≥ 3) summed into DECIMAL(38,0); the only float ops are
  // one correctly-rounded decimal→double read-back (via VARCHAR on the
  // DuckDB side — its direct decimal→double double-rounds) and one IEEE
  // division by the inlined constant α·m²·2⁶² — bit-identical in both
  // engines, so the estimate hash-matches.
  //
  // 100 TB posture: identical to the builtin's — one map-side-combined
  // groupBy whose key space is bounded at |groups|·m registers
  // regardless of input rows (the fact-table scan reduces to ≤ m longs
  // per group per task before the shuffle), then a grid left-join over
  // the |groups|·m relation. Never pays exact-distinct's full key-set
  // shuffle. ExtendedSpec pins the error vs the exact twin for BOTH
  // this estimator and the spec-only builtin twin (q20Builtin).
  // ---------------------------------------------------------------------
  private val hllP = 9
  private val hllM = 1 << hllP // 512 registers → rsd ≈ 1.04/√512 ≈ 4.6%
  private val hllMaxRho = 64 - hllP + 1
  // α_m·m²·2⁶² — same IEEE evaluation order as the oracle's inlined
  // literal (Scala Double.toString is shortest-round-trip; DuckDB
  // parses it back correctly-rounded to the identical double).
  private val hllC: Double =
    0.7213 / (1d + 1.079 / hllM) * hllM * hllM * math.pow(2d, 62d)

  val q20 = Q("q20_approx_distinct",
    s"""WITH h AS (
       |  SELECT l_returnflag AS flag,
       |         md5_number_lower(CAST(l_orderkey AS VARCHAR)) AS h
       |  FROM lineitem),
       |r AS (
       |  SELECT flag, CAST(h & ${hllM - 1} AS BIGINT) AS j,
       |         CASE WHEN (h >> $hllP) = 0 THEN $hllMaxRho
       |              ELSE $hllMaxRho - length(bin(h >> $hllP)) END AS rho
       |  FROM h),
       |reg AS (SELECT flag, j, MAX(rho) AS m FROM r GROUP BY 1, 2),
       |grid AS (
       |  SELECT f.flag, g.j
       |  FROM (SELECT DISTINCT l_returnflag AS flag FROM lineitem) f
       |  CROSS JOIN (SELECT unnest(range(0, $hllM)) AS j) g),
       |full_reg AS (
       |  SELECT g.flag, COALESCE(reg.m, 0) AS m
       |  FROM grid g LEFT JOIN reg ON g.flag = reg.flag AND g.j = reg.j),
       |s AS (
       |  SELECT flag, SUM(CAST(1::BIGINT << (62 - m) AS DECIMAL(38,0))) AS ssum
       |  FROM full_reg GROUP BY 1)
       |SELECT flag AS l_returnflag,
       |       -- FLOOR: Spark's double→long cast truncates; DuckDB's rounds
       |       CAST(FLOOR($hllC / CAST(CAST(ssum AS VARCHAR) AS DOUBLE)) AS BIGINT)
       |         AS approx_orders,
       |       $hllC / CAST(CAST(ssum AS VARCHAR) AS DOUBLE) AS approx_raw
       |FROM s ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    // One codegen pass per row: hll_packed = (j << 8) | rho (see
    // HllPacked) — replaces the composed md5 + bin()/length() register
    // derivation, whose bin() allocated a string per input row. The
    // unpack expressions below are plain bit ops inside the same
    // whole-stage-codegen span as the partial aggregate.
    val li = table(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      // long input: hashes the decimal-string bytes directly (see
      // HllPacked.packedLong) — no per-row cast/UTF8String round-trip
      call_function("hll_packed", col("l_orderkey"), lit(hllP)).as("pk"))
    val reg = li
      .groupBy(col("flag"), shiftrightunsigned(col("pk"), 8).as("j"))
      .agg(max(col("pk").bitwiseAND(lit(255L))).cast("int").as("m"))
    val grid = li.select("flag").distinct()
      .select(col("flag"), explode(sequence(lit(0L), lit((hllM - 1).toLong))).as("j"))
    val est = lit(hllC) /
      sum(call_function("shiftleft", lit(1L), lit(62) - col("m"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("double")
    grid.join(reg, Seq("flag", "j"), "left")
      .na.fill(0, Seq("m"))
      .groupBy("flag").agg(est.as("approx_raw"))
      .select(col("flag").as("l_returnflag"),
        col("approx_raw").cast("long").as("approx_orders"),
        col("approx_raw"))
      .orderBy("l_returnflag")
  }

  /** Spark's builtin HLL++ — kept as a spec-pinned twin of the oracled
    * relational estimator (its bias tables are engine-internal, so it
    * can never hash-match an oracle; the spec pins its error bound).
    */
  def q20Builtin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .orderBy("l_returnflag")

  /** The exact twin q20's error-bound spec compares against — not part
    * of the measured query (see q20's scaladoc).
    */
  def q20Exact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------------
  // q21 — AS-OF JOIN (the operator family behind the reference's README
  // community asks, /root/reference/README.md:130-145, and the classic
  // "operator Spark lacks"): every event matched to the latest
  // 'purchase' checkpoint of the same user at-or-before its timestamp.
  //
  // Spark-first realization: NO range join. Tag checkpoints (0) and
  // probes (1), sort each user's merged timeline once, and forward-fill
  // the checkpoint columns with last(ignoreNulls) over an unbounded
  // preceding frame — two key-partitioned window shuffles and ZERO
  // joins, linear in the timeline, vs the O(probes × checkpoints)
  // nested-loop a range predicate would plan. Oracle: DuckDB's native ASOF LEFT JOIN.
  // Event-time axis is µs-truncated on both sides (Functions.tsUs).
  // Checkpoints are deduped per (user, ts) — ASOF is ambiguous under
  // duplicate right timestamps.
  // ---------------------------------------------------------------------
  val q21 = Q("q21_asof_join",
    """WITH ev AS (SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts_us
      |           FROM events),
      |cp AS (SELECT user_id, ts_us, event_id AS cp_event_id, value AS cp_value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) AS rn
      |  FROM ev WHERE event_type = 'purchase') t WHERE rn = 1)
      |SELECT e.user_id, e.event_id, e.ts_us, cp.cp_event_id, cp.cp_value
      |FROM ev e ASOF LEFT JOIN cp
      |  ON e.user_id = cp.user_id AND e.ts_us >= cp.ts_us
      |ORDER BY e.event_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Functions.tsUs
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        tsUs(col("ts")).as("ts_us"))
    val dedup = Window.partitionBy("user_id", "ts_us").orderBy(col("event_id").desc)
    val cp = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedup))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("cp_event_id"), col("value").as("cp_value"))
    // merged timeline: checkpoints (tag 0) sort before probes (tag 1) at
    // equal timestamps, matching ASOF's inclusive `>=`
    val tagged = ev
      .select(col("user_id"), col("ts_us"), lit(1).as("tag"), col("event_id"),
        lit(null).cast("long").as("cp_event_id"),
        lit(null).cast("double").as("cp_value"))
      .unionByName(cp.select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"), col("cp_event_id"), col("cp_value")))
    val fill = Window.partitionBy("user_id").orderBy("ts_us", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_cp", last(col("cp_event_id"), ignoreNulls = true).over(fill))
      .withColumn("asof_val", last(col("cp_value"), ignoreNulls = true).over(fill))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("asof_cp").as("cp_event_id"), col("asof_val").as("cp_value"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------------
  // q30 — the SAME as-of semantics through the native custom physical
  // operator (graft.plans.AsOfJoinExec: LogicalPlan + SparkStrategy +
  // SparkPlan, extension ladder rung (c)): one hash shuffle per side,
  // one (key, ts) sort each, then a linear streaming merge per
  // co-partition — vs q21's union + double-window idiom, which sorts
  // probes and checkpoints TOGETHER and carries the checkpoint payload
  // through the window. Same DuckDB ASOF LEFT JOIN oracle as q21, so
  // the driver gate pins the custom exec's results bit-for-bit.
  // ---------------------------------------------------------------------
  val q30 = Q("q30_asof_native", q21.oracle.get) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Functions.tsUs
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        tsUs(col("ts")).as("ts_us"))
    val dedup = Window.partitionBy("user_id", "ts_us").orderBy(col("event_id").desc)
    val cp = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedup))
      .filter(col("rn") === 1)
      .select(col("user_id").as("cp_user"), col("ts_us").as("cp_ts"),
        col("event_id").as("cp_event_id"), col("value").as("cp_value"))
    graft.plans.AsOf.join(ev.select("user_id", "event_id", "ts_us"), cp,
        Seq("user_id"), Seq("cp_user"), "ts_us", "cp_ts")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("cp_event_id"), col("cp_value"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------------
  // q22 — batch sessionization, the relational twin of the streaming
  // flatMapGroupsWithState sessionize: a new session starts where the
  // gap to the previous event exceeds 30 min; session id = running sum
  // of session-start flags; then one aggregate per (user, session).
  // The lag + cumulative-sum idiom is the single-shuffle batch plan —
  // both windows and the final groupBy share the user_id partitioning.
  // ---------------------------------------------------------------------
  private val gapNs = 30L * 60L * 1000000000L

  val q22 = Q("q22_sessionize_batch",
    s"""WITH ev AS (
       |  SELECT user_id, event_id, value, epoch_ns(ts) AS ts_us FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > $gapNs
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |sessions AS (
       |  SELECT *, CAST(SUM(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM flagged)
       |SELECT user_id, session_seq, COUNT(*) AS n_events,
       |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |  MAX(ts_us) - MIN(ts_us) AS duration_us,
       |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_value
       |FROM sessions GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Functions.tsUs
    graft.functions.CustomFunctions.register(spark)
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        tsUs(col("ts")).as("ts_us"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(cum))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        microsDouble(sum(decMicros(col("value")))).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  // ---------------------------------------------------------------------
  // q23 — three-way join + grouped revenue top-k (the TPC-H Q3 shape):
  // dimension filter broadcast against the fact chain, partial-agg
  // revenue, TakeOrderedAndProject for the top 20. The canonical
  // multi-table reporting plan: the only wide operations are the
  // orders⋈lineitem shuffle and the 20-row ordered take.
  // ---------------------------------------------------------------------
  val q23 = Q("q23_top_revenue",
    """SELECT l.l_orderkey,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 20""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    // session-TZ parse (pinned UTC), not JVM-default-TZ Timestamp.valueOf;
    // foldable, so the comparison still pushes into the parquet scan
    val cutoff = to_timestamp(lit("1995-03-15 00:00:00"))
    val c = table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // the segment-filtered customer side is data-dependent (1/5 of a
    // 100 TB customer table is not broadcastable) — no static hint;
    // AQE picks broadcast from the filtered scan's runtime size
    val co = c.join(o, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    // Round-11 rewrite, measured at sf10 (best-of-3 per form, same
    // session): join-then-agg 2.10 s → agg-below-join 1.87 s →
    // bloom-pruned agg-below-join 0.79 s.
    //  1. Aggregate BELOW the join: o_orderkey is unique, so each
    //     pre-agg group joins ≤ 1 order row — the reorder is exact and
    //     the join shuffles ~4× fewer (pre-agged) rows.
    //  2. Bloom-prune the lineitem scan with the (c⋈o) key set BEFORE
    //     the aggregate: unlike q33 (where the bloom only saved
    //     shared-memory shuffle bytes and was gated OFF locally), here
    //     the cut removes ~90% of a 7M-group hash aggregate — CPU, not
    //     transport — so it repays even on local[32]. Same saturation
    //     discipline as q33: sized from the measured key count, gated
    //     on dim selectivity (an unselective filter would make the
    //     probe pure overhead; the gate keeps that regime at the plain
    //     pre-agg plan). False positives only create extra pre-agg
    //     groups that the exact join drops — output identical.
    // Round 12: the gate + sizing previously paid `co.count()` — a FULL
    // extra execution of the customer⋈orders join before the main query
    // runs it again (and the bloom build scans it a third time).
    // Estimate |co| instead from single-column pushed-filter scan
    // counts: |co| ≈ |date-filtered orders| × segment fraction (the two
    // dim filters are independent by construction). The estimate only
    // sizes the bloom (undersizing adds false positives → extra pre-agg
    // groups the exact join drops; the ×1.5 margin keeps the fpp near
    // design) and drives the on/off gate — BOTH paths end in the same
    // exact join, so output is identical for any gate decision.
    // Measured (R12Profile, equality-checked): sf0.1 0.223 → 0.202 s,
    // sf10 1.76 → 1.52 s.
    val nSegCust = table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").count()
    val nCust = table(spark, dir, "customer").count()
    val nDateOrders = o.count()
    val nOrders = table(spark, dir, "orders").count()
    val estKeys = math.max(4096L,
      (nDateOrders * nSegCust.toDouble / math.max(nCust, 1L)).toLong)
    val lPruned = if (estKeys * 2 >= nOrders) l
    else {
      val bloomBytes = co
        .agg(call_function("bloom_agg", xxhash64(col("o_orderkey")),
          lit(math.max((estKeys * 1.5).toLong, 4096L))))
        .collect()(0).getAs[Array[Byte]](0)
      l.filter(call_function("bloom_might_contain",
        lit(bloomBytes), xxhash64(col("l_orderkey"))))
    }
    val lAgg = lPruned.groupBy("l_orderkey")
      .agg(microsDouble(sum(decMicros(
        col("l_extendedprice") * (lit(1d) - col("l_discount"))))).as("revenue"))
    co.join(lAgg, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // q24 — grouped exact quantiles (§2.4: no quantile support in the
  // reference): p50/p90/p99 of order totals per priority class, the
  // ⌈p·n⌉-th smallest per group (lower discrete quantile). The naive
  // form — rank every row in a window partitioned by the GROUP key —
  // hash-shuffles the whole table to 5 tasks (one per priority class)
  // no matter how wide the cluster is; this body distributes the
  // selection instead:
  //   1. one tiny per-group aggregate (exact row count + exact global
  //      value min/max) collected at plan construction — 5 rows, the
  //      trained-constant pattern of s03/s04.
  //   2. a map-side `width_bucket` tag from the min/max literals
  //      (codegen'd, deterministic — a sketch-based boundary could
  //      legally differ between recomputations), then ≤ G·B bucket
  //      counts + a cumulative sum over that tiny relation locate, for
  //      each target rank, the bucket holding it and the rank's offset
  //      inside the bucket.
  //   3. only the ≤ G·P target buckets' rows reach a window partitioned
  //      by (group, percentile) — G·P-way parallel.
  // The selected values are EXISTING data values (no interpolation
  // arithmetic) so Spark and DuckDB agree bit-for-bit, and any
  // monotone bucket placement yields the same value (ties share a
  // bucket; the rank offset is exact) — uniform-width buckets only
  // affect balance, and B=256 keeps the worst target bucket small for
  // anything short of a point-mass distribution (which would need a
  // recursive second split). At 100 TB: B scales with cluster width,
  // the full-data stages are a map-side tag, a combiner-friendly
  // count, and a ~P/B-selectivity filter — no group-cardinality
  // parallelism cap anywhere.
  // ---------------------------------------------------------------------
  val q24 = Q("q24_group_quantiles",
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice, o_orderkey) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority, CAST(p AS DOUBLE) AS p, o_totalprice AS value
      |FROM ranked, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
      |              (CAST(0.99 AS DOUBLE))) q(p)
      |WHERE rn = CAST(ceil(p * n) AS BIGINT)
      |ORDER BY o_orderpriority, p""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ps = Seq(0.5, 0.9, 0.99)
    val nBuckets = 256
    def rows = table(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"),
        col("o_orderkey").as("k"))
    // (1) 5-row bounded collect: exact per-group n + global value range.
    val stats = rows.groupBy("g").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    val targetDf = stats.flatMap { r =>
      val g = r.getString(0); val n = r.getLong(1)
      ps.map(p => (g, p, math.ceil(p * n).toLong))
    }.toSeq.toDF("g", "p", "r")
    val (vLo, vHi) = (stats.map(_.getDouble(2)).min, stats.map(_.getDouble(3)).max)
    // Range inlines as literals so both bucket-tag sites compute the
    // identical assignment; width_bucket stays inside whole-stage
    // codegen (a fold over a boundary array would be an interpreted
    // higher-order function on every row).
    def withBucket(df: DataFrame): DataFrame = df.withColumn("b",
      if (vLo < vHi) width_bucket(col("v"), lit(vLo), lit(vHi), lit(nBuckets))
      else lit(1L)) // degenerate range: every value in one bucket
    // (2) locate each target rank: bucket counts → running total →
    // the bucket where cum_prev < r ≤ cum, offset r - cum_prev.
    val loc = withBucket(rows).groupBy("g", "b").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.partitionBy("g").orderBy("b")))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .join(targetDf, Seq("g"))
      .filter(col("cum_prev") < col("r") && col("r") <= col("cum"))
      .select(col("g"), col("b"), col("p"), (col("r") - col("cum_prev")).as("lr"))
    // (3) rank only the target buckets, G·P-way parallel.
    withBucket(rows).join(broadcast(loc), Seq("g", "b"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("g", "p").orderBy("v", "k")))
      .filter(col("rn") === col("lr"))
      .select(col("g").as("o_orderpriority"), col("p"), col("v").as("value"))
      .orderBy("o_orderpriority", "p")
  }

  // ---------------------------------------------------------------------
  // q25 — correlated scalar subqueries (§2.2: the reference's only
  // subquery is an uncorrelated IN): orders strictly above their own
  // customer's average order value, phrased as two correlated scalar
  // subqueries (COUNT and SUM against the outer row's customer) and
  // entered through `spark.sql` in the correlated form Catalyst
  // DECORRELATES into aggregate+join instead of the naive per-outer-row
  // re-scan — at 100 TB the difference between O(N) and
  // O(N²/customers). Catalyst decorrelates each scalar subquery
  // SEPARATELY though (two aggregates + two joins over the same key),
  // so the shipped body fuses them by hand: ONE per-customer
  // (count, sum) aggregate joined back once — half the shuffles for
  // the identical relation. ExtendedSpec pins the correlated
  // `spark.sql` form against this body. The avg comparison is
  // cross-multiplied (price · count > sum) so everything stays in exact
  // DECIMAL — no division, bit-exact across engines.
  // ---------------------------------------------------------------------
  val q25 = Q("q25_correlated_subquery",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(38,6)) *
      |      (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |    > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(38,6)))
      |       FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    // The correlated comparison runs entirely in long micros: with both
    // sides at the same fixed scale, decimal > decimal IS unscaled-long
    // > unscaled-long (price·cnt peaks ~2.5e13 micros per customer —
    // nowhere near ±2⁶³).
    graft.functions.CustomFunctions.register(spark)
    val o = table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val per = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("cust_cnt"), sum(decMicros(col("o_totalprice"))).as("cust_sum"))
    o.join(per, Seq("o_custkey"))
      .filter(decMicros(col("o_totalprice")) * col("cust_cnt") > col("cust_sum"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** The correlated `spark.sql` form of q25 — the SQL front door whose
    * decorrelation ExtendedSpec pins against the fused body above.
    */
  private[graft] def q25Correlated(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("q25_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM q25_orders o
        |WHERE CAST(o_totalprice AS DECIMAL(38,6)) *
        |      (SELECT COUNT(*) FROM q25_orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(38,6)))
        |       FROM q25_orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // q26 — grouped top-k via the native bounded-heap aggregate (TopKAgg):
  // top-3 orders by value per customer. The window idiom the oracle uses
  // (row_number over each customer ORDER BY price) sorts every group's
  // FULL row set and shuffles every row; topk_agg is a
  // TypedImperativeAggregate, so map-side partial aggregation reduces
  // each partition to ≤ k entries per customer BEFORE the shuffle —
  // O(N log k), and only k·customers rows cross the wire. The grouped
  // twin of Spark's global TakeOrderedAndProject, and the pattern for
  // any per-entity leaderboard at 100 TB.
  // ---------------------------------------------------------------------
  val q26 = Q("q26_grouped_topk",
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders)
      |SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey, o_totalprice
      |FROM ranked WHERE rank <= 3
      |ORDER BY o_custkey, rank""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.CustomFunctions
    CustomFunctions.register(spark)
    // tableFanBy(custkey): parallelize the heap-building partial
    // aggregate (the query's only real work) past the 1-2-split scan at
    // bench scale; the hash fan doubles as the aggregation exchange.
    // Measured solo at sf1: 1.21 s → 1.05 s.
    tableFanBy(spark, dir, "orders", col("o_custkey"))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .groupBy("o_custkey")
      .agg(call_function("topk_agg",
        struct(col("o_totalprice").as("ord"), col("o_orderkey").as("id")),
        lit(3)).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("o_orderkey"), col("col.ord").as("o_totalprice"))
      .orderBy("o_custkey", "rank")
  }

  // ---------------------------------------------------------------------
  // q27 — PIVOT (§2.4: no pivot in the reference): order counts and
  // exact-decimal value totals per nation, pivoted across the five
  // order-priority classes. Spark's `groupBy().pivot(col, values)` with
  // EXPLICIT pivot values — at 100 TB never let pivot infer its column
  // set (that's an extra distinct scan AND a nondeterministic schema);
  // a declared value list keeps the plan a single pass. The oracle
  // expresses the same relation portably as CASE-filtered aggregates —
  // which is also exactly what Catalyst lowers pivot to.
  // ---------------------------------------------------------------------
  private val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val q27 = Q("q27_pivot", {
    val cols = prios.map { p =>
      val key = p.split("-")(0) // stable short column suffix: 1..5
      s"""  COUNT(CASE WHEN o.o_orderpriority = '$p' THEN 1 END) AS cnt_$key,
         |  CAST(CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '$p'
         |    THEN CAST(o.o_totalprice AS DECIMAL(38,6)) END), 0) AS VARCHAR) AS DOUBLE) AS sum_$key""".stripMargin
    }.mkString(",\n")
    s"""SELECT c.c_nationkey,
       |$cols
       |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin
  }) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    val joined = table(spark, dir, "orders")
      .join(table(spark, dir, "customer"),
        col("c_custkey") === col("o_custkey"))
    val pivoted = joined
      .groupBy("c_nationkey")
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)).as("cnt"),
        sum(decMicros(col("o_totalprice"))).as("sum"))
    // pivot names columns "<value>_cnt"/"<value>_sum"; project to the
    // oracle's stable names; an empty cell's NULL micros total reads
    // back as the same 0.0 the exact-decimal zero produced
    val out = prios.foldLeft(pivoted) { (df, p) =>
      val key = p.split("-")(0)
      df.withColumn(s"cnt_$key", coalesce(col(s"`${p}_cnt`"), lit(0L)))
        .withColumn(s"sum_$key",
          microsDouble(coalesce(col(s"`${p}_sum`"), lit(0L))))
    }
    out.select(col("c_nationkey") +:
        prios.flatMap { p =>
          val key = p.split("-")(0)
          Seq(col(s"cnt_$key"), col(s"sum_$key"))
        }: _*)
      .orderBy("c_nationkey")
  }

  // ---------------------------------------------------------------------
  // q28 — UNPIVOT/melt (the inverse reshape of q27): region-level
  // customer statistics laid out wide (count, total balance, max
  // balance), melted to (nation, stat, value) long form — the tidy shape
  // feeding ML/reporting consumers. Spark's native `unpivot` is a
  // zero-shuffle Expand over the aggregate; the oracle mirrors it
  // portably as the UNION ALL of one projection per stat (what melt
  // lowers to relationally).
  // ---------------------------------------------------------------------
  val q28 = Q("q28_unpivot",
    """WITH agg AS (
      |  SELECT c_nationkey,
      |    CAST(COUNT(*) AS DOUBLE) AS n_customers,
      |    CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_bal,
      |    MAX(c_acctbal) AS max_bal
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey, stat, value FROM (
      |  SELECT c_nationkey, 'n_customers' AS stat, n_customers AS value FROM agg
      |  UNION ALL
      |  SELECT c_nationkey, 'total_bal' AS stat, total_bal AS value FROM agg
      |  UNION ALL
      |  SELECT c_nationkey, 'max_bal' AS stat, max_bal AS value FROM agg)
      |ORDER BY c_nationkey, stat""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    table(spark, dir, "customer")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("double").as("n_customers"),
        microsDouble(sum(decMicros(col("c_acctbal")))).as("total_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .unpivot(Array(col("c_nationkey")),
        Array(col("n_customers"), col("total_bal"), col("max_bal")),
        "stat", "value")
      .orderBy("c_nationkey", "stat")
  }

  // ---------------------------------------------------------------------
  // q29 — the ranking-function family (§2.5: the reference has no window
  // functions at all): rank, dense_rank, quartile (ntile), percent_rank
  // and cume_dist over each nation's customers by balance, one shared
  // window spec → ONE partition shuffle + sort serves all five. The
  // ratio functions are exact small-integer quotients ((rank−1)/(n−1),
  // peers/n), identical IEEE division in both engines.
  // ---------------------------------------------------------------------
  val q29 = Q("q29_window_ranks",
    """SELECT c_custkey, c_nationkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------------
  // q31 — RANGE JOIN (interval containment) via bucket expansion: spike
  // events (value ≥ 300) open 60-minute incident windows; every event
  // inside a window joins it — a join with NO equi key, which Spark
  // would otherwise plan as a BroadcastNestedLoopJoin (O(events ×
  // windows), the classic range-join trap). The scale rewrite: quantize
  // the time axis into buckets a fraction of the window length, expand
  // each interval to the few buckets it can overlap, tag each event with
  // its single bucket, equi-join ON THE BUCKET, and re-check the exact
  // range as a cheap residual filter. Candidates per event are bounded
  // by the true windows in its bucket — at 100 TB the bucket id is an
  // ordinary hash-shuffle key. The window side is small at every tested
  // threshold, but it is DATA-DEPENDENT (spike rate), so the broadcast
  // is NOT hinted: AQE picks broadcast from the expanded relation's
  // runtime size, and a low-threshold deployment where half the corpus
  // spikes degrades to a shuffled hash join instead of OOMing the
  // driver — the same treatment d09 got. Round9Spec pins the degrade
  // plan + output equality; PlanQualitySpec's global
  // no-cartesian/no-BNLJ check pins the plan shape.
  // ---------------------------------------------------------------------
  private val spikeThreshold = 300.0
  private val windowNs = 60L * 60L * 1000000000L // 60 min on the ns axis
  // Bucket granularity = windowNs / q31Fan. A window spans ≤ q31Fan+1
  // buckets (broadcast-side expansion), an event exactly one, and the
  // candidate set an event probes is the windows starting within
  // (window + bucket) of it — so the residual filter's candidate:match
  // ratio is (fan+1)/fan, vs 2 at fan=1. Diminishing returns against a
  // linearly growing broadcast side; fan=4 cuts candidates ~38% for a
  // 2.5× (still KB-scale) window relation. Measured solo at sf1 (one
  // quiet window, best-of-7, q08 as stable control): fan=1 1.92 s,
  // fan=4 1.80 s, fan=8 2.05 s — fan=4 keeps the candidate win before
  // the broadcast-side expansion starts paying it back.
  private val q31Fan = 4L
  private val q31BucketNs = windowNs / q31Fan

  val q31 = Q("q31_range_bucket_join",
    s"""WITH ev AS (SELECT event_id, user_id, value, epoch_ns(ts) AS ts_ns FROM events),
       |w AS (SELECT event_id AS window_id, ts_ns AS w_start FROM ev
       |      WHERE value >= $spikeThreshold)
       |SELECT w.window_id, w.w_start, count(*) AS n_events,
       |  count(DISTINCT e.user_id) AS n_users,
       |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_value
       |FROM w JOIN ev e
       |  ON e.ts_ns >= w.w_start AND e.ts_ns < w.w_start + $windowNs
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Functions.tsUs
    graft.functions.CustomFunctions.register(spark)
    val ev = table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        tsUs(col("ts")).as("ts_ns"))
    val windows = ev.filter(col("value") >= spikeThreshold)
      .select(col("event_id").as("window_id"), col("ts_ns").as("w_start"))
    // a window [s, s+W) overlaps buckets s div g .. s div g + fan
    // (g = W/fan). NB: integer `div`, not `/` — long / long is DOUBLE in
    // Spark SQL, and the ns axis (~1.7e18) is beyond double's exact
    // range.
    val wb = windows.withColumn("bucket",
      explode(sequence(expr(s"w_start div $q31BucketNs"),
        expr(s"w_start div $q31BucketNs") + q31Fan)))
    // The probe side fans out before the bucket join: candidate
    // expansion (~3.4 pairs/event at sf1) plus the aggregate's partial
    // phase is the expensive part, and it runs pre-shuffle — on a
    // single-row-group file that is one core without the rebalance.
    val eb = tableFan(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        tsUs(col("ts")).as("ts_ns"))
      .withColumn("bucket", expr(s"ts_ns div $q31BucketNs"))
    // COUNT(DISTINCT user_id) alongside plain aggregates makes Catalyst
    // Expand every joined row into two projections; aggregating
    // (window, user) first, then the window, computes the identical
    // result with the pairs passing the hash aggregate exactly once.
    // Measured, rejected (round 8): fusing both levels into one
    // groupBy(window) with size(collect_set(user_id)) was 2.21 s vs
    // 2.33 s solo at sf1 — inside window noise — and concentrates a
    // whole window's distinct-user set in ONE aggregation buffer, the
    // wrong posture for hot windows at 100 TB. Two levels stand.
    eb.join(wb, Seq("bucket"))
      .filter(col("ts_ns") >= col("w_start") &&
        col("ts_ns") < col("w_start") + windowNs)
      .groupBy("window_id", "w_start", "user_id")
      .agg(count(lit(1)).as("cnt"), sum(decMicros(col("value"))).as("s"))
      .groupBy("window_id", "w_start")
      .agg(sum("cnt").as("n_events"), count(lit(1)).as("n_users"),
        microsDouble(sum("s")).as("sum_value"))
      .orderBy("window_id")
  }

  // ---------------------------------------------------------------------
  // q32 — bloom-filter semi-join reduction: the fact side is pre-pruned
  // by a bloom filter built over the dim side's join keys BEFORE the
  // exact semi join — Spark's own runtime-filter shape
  // (InjectRuntimeFilter / BloomFilterAggregate +
  // BloomFilterMightContain), demonstrated explicitly through the same
  // native expressions so the mechanism is visible and testable rather
  // than depending on the optimizer firing. The bloom is built
  // DISTRIBUTED (per-partition sketches OR-merge; only the KB-sized
  // sketch reaches the driver — the sanctioned scalar collect), then
  // probes inside whole-stage codegen on the scan side.
  //
  // Semantics are EXACT: false positives survive the bloom probe but die
  // in the exact semi join that follows — the bloom only cuts shuffle
  // input — so the oracle is the plain IN-subquery. At 100 TB this is
  // the difference between shuffling the full fact table and shuffling
  // only rows that can possibly match; with selective dim predicates the
  // reduction is 10-100×, at the cost of one scan-side hash per row.
  // BloomSemiJoinSpec pins the pruning factor and the no-false-negative
  // guarantee.
  //
  // The bloom is SIZED FROM THE MEASURED KEY COUNT (one count job over
  // the pushed-filter orders scan), not a constant: the round-10 sf10
  // probe (graft.Q33Profile) caught the original constant
  // expectedNumItems=100000 silently SATURATING once the key set grows
  // past it — at sf10 the filter yields 3.01M keys and the saturated
  // bloom passed 60M of 60M fact rows (zero pruning, pure probe
  // overhead; the failure is silent because the exact join keeps the
  // output correct). Right-sized, it prunes 78% (13.0M survive).
  // Measured local trade at sf10: nobloom 2.15 s < saturated 2.54 s <
  // sized 2.99 s — locally the extra build+probe outweighs the pruning
  // because local[32] "shuffle" is shared-memory I/O; on a network
  // shuffle the 4.6× row cut is the win this operator exists to
  // demonstrate, and a saturating constant is the worst of both
  // regimes. DuckDB's 0.4 s here is a perfect-hash IN-join with no
  // shuffle at all — the right local plan, not the right 100 TB plan.
  // ---------------------------------------------------------------------
  val bloomPriceMin = 400000.0

  val q33 = Q("q33_bloom_semi_join",
    s"""SELECT l_returnflag, count(*) AS n_items,
       |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
       |FROM lineitem
       |WHERE l_orderkey IN (
       |  SELECT o_orderkey FROM orders WHERE o_totalprice > $bloomPriceMin)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) => q33Pipeline(spark, dir) }

  /** q33's body with the bloom GATED on expected repayment (round 11).
    * The bloom's only value is cutting rows from the semi join's
    * shuffle; it can repay its build + per-row probe only when
    *   (a) that shuffle crosses a NETWORK (a `local[...]` master's
    *       "shuffle" is shared-memory I/O — measured at sf10: nobloom
    *       2.15 s < sized bloom 2.99 s, the bloom is pure overhead
    *       locally no matter how well it prunes), and
    *   (b) the dim filter is SELECTIVE (expected cut ≥ half the fact
    *       rows: nKeys·2 < nOrders under the uniform lineitem-per-order
    *       fill; a high-pass-rate bloom passes almost everything and
    *       only adds a hash per row).
    * Both paths end in the same exact semi join, so the output — and
    * the oracle — are identical; only the pruning stage is gated
    * (BloomSemiJoinSpec pins path equality and plan shape both ways).
    * On the gated-off path the key count is skipped too: it existed
    * only to size the bloom, and a metadata-cheap isLocal check must
    * not pay a scan to decide to do nothing.
    * `forceBloom` overrides the gate for specs/benchmarks.
    */
  def q33Pipeline(spark: SparkSession, dir: String,
      forceBloom: Option[Boolean] = None): DataFrame =
    q33PipelineOn(spark, table(spark, dir, "lineitem"),
      table(spark, dir, "orders"), forceBloom)

  /** [[q33Pipeline]] over caller-supplied relations — the seam the
    * storage-layout A/B (graft.BucketedBench) drives with bucketed
    * `orders_b`/`lineitem_b` so the semi join inherits the layout
    * instead of shuffling, same pattern as q10's transferPipelineOn. */
  def q33PipelineOn(spark: SparkSession, lineitem: DataFrame,
      orders: DataFrame, forceBloom: Option[Boolean] = None): DataFrame = {
    import graft.functions.CustomFunctions
    CustomFunctions.register(spark)
    val keys = orders
      .filter(col("o_totalprice") > bloomPriceMin).select("o_orderkey")
    val useBloom = forceBloom.getOrElse {
      !spark.sparkContext.isLocal && {
        // both counts are pushed-filter single-column / metadata scans
        val nKeys = keys.count()
        val nOrders = orders.count()
        nKeys * 2 < nOrders
      }
    }
    val fact = lineitem
    val pruned = if (!useBloom) fact
    else {
      // size from the data, never a constant (see saturation note
      // above); the count is a pushed-filter single-column scan —
      // cheap relative to a bloom that silently stops pruning
      val nKeys = keys.count()
      val bloomBytes = keys
        .agg(call_function("bloom_agg", xxhash64(col("o_orderkey")),
          lit(math.max(nKeys, 4096L))))
        .collect()(0).getAs[Array[Byte]](0)
      fact.filter(call_function("bloom_might_contain",
        lit(bloomBytes), xxhash64(col("l_orderkey"))))
    }
    pruned
      // keys is the price-filtered order set — data-dependent, so no
      // BROADCAST hint (the 100 TB driver-OOM mode; AQE may still
      // convert while runtime size allows). Round 12 first shipped a
      // static shuffle_hash hint here (SMJ sorts the 60M-row probe side
      // just to discard it — measured solo at sf10: SMJ 3.11 s → SHJ
      // 2.86 s), but a strategy hint PINS the logical plan: AQE can no
      // longer convert the join to broadcast when the key side turns
      // out tiny, and the sf0.1 row regressed 0.28 → 0.70 s (the gate
      // scale the driver benches). The scale-correct form is NO hint +
      // `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`
      // (set in Bench's session, guide §3.1): AQE then picks broadcast
      // when the built side fits, shuffled-hash when per-partition
      // builds fit (skipping both sorts — the key set is unique
      // o_orderkey, no skew, per-partition build = nKeys/parts, bounded
      // at any scale by widening parts), and sort-merge only as the
      // spill-safe fallback. Measured solo, same windows (best-of-N):
      // sf0.1 hint 0.59 s → no-hint+threshold 0.38 s (AQE broadcast);
      // sf10 SMJ 17.3 s → threshold-SHJ 7.1-7.8 s vs hint 6.4 s — the
      // static hint keeps a ~10% edge at sf10 but costs 55% at the
      // gate scale and forfeits the broadcast regime entirely; the
      // size-driven plan is the scale-honest one.
      .join(keys,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        microsDouble(sum(decMicros(col("l_quantity")))).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------------
  // q34 — value-based window frame (RANGE BETWEEN): per event, the count
  // and exact-decimal sum of the same user's activity in the trailing 10
  // minutes — the event-time sliding aggregate behind rate limiting /
  // rolling features. RANGE frames bound the frame by ORDER-BY VALUE
  // distance, not row offsets (q14's ROWS frame), so ties share one
  // frame and gaps shrink it. ONE user_id window shuffle serves both
  // aggregates; at 100 TB this is a key-partitioned sort with a
  // two-pointer frame scan per partition — linear, no self-join (the
  // naive equivalent is an interval self-join, O(events × window_len)).
  // ---------------------------------------------------------------------
  private val trailNs = 10L * 60L * 1000000000L // 10 min on the ns axis

  val q34 = Q("q34_range_frame",
    s"""WITH ev AS (SELECT event_id, user_id, value, epoch_ns(ts) AS ts_ns FROM events)
       |SELECT event_id, user_id, ts_ns,
       |  COUNT(*) OVER w AS n_10m,
       |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_10m
       |FROM ev
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
       |  RANGE BETWEEN $trailNs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Functions.tsUs
    graft.functions.CustomFunctions.register(spark)
    val w = Window.partitionBy("user_id").orderBy("ts_ns")
      .rangeBetween(-trailNs, 0L)
    table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        tsUs(col("ts")).as("ts_ns"))
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        count(lit(1)).over(w).as("n_10m"),
        microsDouble(sum(decMicros(col("value"))).over(w)).as("sum_10m"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------------
  // q35 — JSON extraction (a function family the reference lacks
  // entirely, SURVEY.md §2.8 "no JSON functions"): the semi-structured
  // `props` payload is parsed ONCE per row with an explicit schema
  // (from_json — at scale never schema-infer, and never re-parse per
  // field), then aggregated by the extracted key. Parse + bucket stay in
  // the scan's map stage; the only shuffle is the final groupBy.
  // ---------------------------------------------------------------------
  val q35 = Q("q35_json_extract",
    """WITH ev AS (SELECT user_id, value,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT k // 10 AS k_bucket, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  MIN(k) AS min_k, MAX(k) AS max_k,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    // json_get_long, not from_json: the payload is a ~10-byte object and
    // Jackson's per-row machinery dominates the parse at that size (the
    // measured sf1 gap vs DuckDB's yyjson); the codegen single-key scan
    // matches from_json's semantics on well-formed documents
    // (JsonGetLongSpec) and keeps extract+bucket in the scan stage.
    table(spark, dir, "events")
      .select(col("user_id"), col("value"),
        call_function("json_get_long", col("props"), lit("k")).as("k"))
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min("k").as("min_k"), max("k").as("max_k"),
        microsDouble(sum(decMicros(col("value")))).as("sum_value"))
      .orderBy("k_bucket")
  }

  // ---------------------------------------------------------------------
  // q36 — incremental snapshot merge (SCD-1 upsert): the maintenance
  // operation every continuously-ingested 100 TB table needs. The
  // "base" snapshot (latest order per customer before the cutoff) is
  // merged with a "delta" batch (latest order at-or-after it): delta
  // rows win, base rows without a delta carry over, delta rows without a
  // base insert.
  //
  // Both sides are LARGE → no broadcast: the plan is one
  // co-partitioned sort-merge join on the key (with bucketed/clustered
  // storage — Tables.writeBucketed — even that shuffle disappears; this
  // is exactly the merge-on-read compaction shape).
  //
  // Measured, rejected (round 9): a no-join rewrite — ONE hash
  // aggregate computing both sides' latest rows as conditional
  // max_by(struct(ok,tp,od), when(side, struct(od,ok))) — looked like
  // one shuffle and no sorts, but a struct-typed aggregation buffer is
  // not HashAggregateExec-compatible (buffers must be mutable
  // fixed-width), so Catalyst silently planned SortAggregate: solo at
  // sf1 it measured 1.30 s unfanned / 1.33 s with a keyed fan vs this
  // form's 1.11 s in the same windows, bit-identical output. The
  // window+full-outer form stands; packing the argmax into a primitive
  // long buffer can't carry the price payload, and a custom
  // TypedImperativeAggregate would only re-create the existing
  // ObjectHashAggregate cost structure.
  // ---------------------------------------------------------------------
  private val mergeCutoff = "1999-01-01 00:00:00"

  val q36 = Q("q36_incremental_merge",
    s"""WITH base AS (
       |  SELECT * FROM (
       |    SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
       |      row_number() OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
       |    FROM orders WHERE o_orderdate < TIMESTAMP '$mergeCutoff') WHERE rn = 1),
       |delta AS (
       |  SELECT * FROM (
       |    SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
       |      row_number() OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
       |    FROM orders WHERE o_orderdate >= TIMESTAMP '$mergeCutoff') WHERE rn = 1)
       |SELECT COALESCE(d.o_custkey, b.o_custkey) AS custkey,
       |  CASE WHEN b.o_custkey IS NULL THEN 'insert'
       |       WHEN d.o_custkey IS NULL THEN 'carry'
       |       ELSE 'update' END AS op,
       |  COALESCE(d.o_orderkey, b.o_orderkey) AS latest_orderkey,
       |  COALESCE(d.o_totalprice, b.o_totalprice) AS latest_totalprice,
       |  strftime(COALESCE(d.o_orderdate, b.o_orderdate), '%Y-%m-%d') AS latest_date
       |FROM base b FULL OUTER JOIN delta d ON d.o_custkey = b.o_custkey
       |ORDER BY custkey""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // to_timestamp resolves in the SESSION time zone (pinned UTC by the
    // harness) — java.sql.Timestamp.valueOf would parse in the JVM
    // default TZ and shift the cutoff instant on non-UTC hosts
    val cutoff = to_timestamp(lit(mergeCutoff))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    def latest(df: DataFrame, prefix: String): DataFrame =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as(s"${prefix}_custkey"),
          col("o_orderkey").as(s"${prefix}_orderkey"),
          col("o_totalprice").as(s"${prefix}_totalprice"),
          col("o_orderdate").as(s"${prefix}_date"))
    val orders = table(spark, dir, "orders")
    val base = latest(orders.filter(col("o_orderdate") < cutoff), "b")
    val delta = latest(orders.filter(col("o_orderdate") >= cutoff), "d")
    base.join(delta, col("d_custkey") === col("b_custkey"), "full_outer")
      .select(coalesce(col("d_custkey"), col("b_custkey")).as("custkey"),
        when(col("b_custkey").isNull, "insert")
          .when(col("d_custkey").isNull, "carry")
          .otherwise("update").as("op"),
        coalesce(col("d_orderkey"), col("b_orderkey")).as("latest_orderkey"),
        coalesce(col("d_totalprice"), col("b_totalprice")).as("latest_totalprice"),
        date_format(coalesce(col("d_date"), col("b_date")), "yyyy-MM-dd")
          .as("latest_date"))
      .orderBy("custkey")
  }

  // ---------------------------------------------------------------------
  // q37 — CUBE (completing the grouping-sets family next to q18's
  // ROLLUP): all four (status × priority) grouping combinations in ONE
  // pass — Spark plans a single Expand (4 output rows per input) into
  // one hash aggregate, vs 4 separate scans UNION'd. Same NULL-marker
  // coalescing as q18 (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
  // ---------------------------------------------------------------------
  val q37 = Q("q37_cube",
    """SELECT COALESCE(o_orderstatus, '<all>') AS status,
      |  COALESCE(o_orderpriority, '<all>') AS priority,
      |  COUNT(*) AS cnt,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Functions.microsDec
    // Same pre-aggregate-then-expand shape as q18: cube's Expand emits
    // 4 rows per input, so feed it the ~15-row (status × priority)
    // pre-aggregate instead of the fact table. The hot fact-table level
    // sums long micros; the cube level converts each CELL back to its
    // exact DECIMAL(38,6) and re-sums with 128-bit headroom — order
    // values are the magnitudes whose GRAND-TOTAL cell would cross the
    // ±2⁶³ micros bound around sf30 if the roll-up also ran on longs.
    graft.functions.CustomFunctions.register(spark)
    table(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt0"), sum(decMicros(col("o_totalprice"))).as("sum0"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(coalesce(sum("cnt0"), lit(0L)).as("cnt"),
        sum(microsDec(col("sum0"))).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("cnt"), col("sum_price"))
      .orderBy("status", "priority")
  }

  // ---------------------------------------------------------------------
  // q38 — explicit GROUPING SETS (the third grouping-sets form, after
  // q18 ROLLUP and q37 CUBE): per-nation AND per-segment subtotals in
  // ONE pass — a set combination neither rollup nor cube expresses
  // (cube would add the cross product and grand total). Entered via the
  // SQL front door (grouping sets have no DataFrame-side method), one
  // Expand (2 rows per input) → one hash aggregate. The -1/'<all>'
  // markers keep the NULL sort portability of q18.
  // ---------------------------------------------------------------------
  /** One SQL text, parameterized by the table name — the oracle runs it
    * against DuckDB's `customer` view, the Spark side against a
    * session-scoped temp view (so no shared-session relation is
    * shadowed and no fragile string surgery on the query text).
    * nationkey is CAST to BIGINT per the determinism contract (output
    * columns long/string/double only — 32-bit columns risk typed-hash
    * width mismatches, the round-4 t07 failure class).
    */
  private def q38Sql(tbl: String) =
    s"""SELECT CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nationkey,
       |  COALESCE(c_mktsegment, '<all>') AS segment,
       |  COUNT(*) AS cnt,
       |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_bal
       |FROM $tbl GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment))
       |ORDER BY nationkey, segment""".stripMargin

  val q38 = Q("q38_grouping_sets", q38Sql("customer")) { (spark, dir) =>
    // Pre-aggregate to (nationkey, segment) before the grouping-sets
    // Expand — same shape as q18/q37: COUNT(*) per set-group equals
    // SUM of the pre-aggregate's counts, the hot level sums long micros
    // (acctbal magnitudes never approach the ±2⁶³ bound), and Expand
    // runs over ~125 rows instead of the customer table. micros_double
    // reads each set-group total back as the identical double.
    graft.functions.CustomFunctions.register(spark)
    table(spark, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt0"), sum(decMicros(col("c_acctbal"))).as("sum0"))
      .createOrReplaceTempView("q38_customer_pre")
    spark.sql(
      """SELECT CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nationkey,
        |  COALESCE(c_mktsegment, '<all>') AS segment,
        |  SUM(cnt0) AS cnt,
        |  micros_double(SUM(sum0)) AS sum_bal
        |FROM q38_customer_pre
        |GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment))
        |ORDER BY nationkey, segment""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // q39 — sequential conversion funnel (view → click → purchase, each
  // stage strictly at-or-after the previous stage's FIRST event): the
  // event-sequence analytics op behind product funnels and pipeline
  // stage tracking. The naive form is three self-joins; the window form
  // (three chained whole-partition windows) is linear but sorts every
  // user's events and walks them three more times.
  //
  // This form is ONE hash aggregate: per user, min(view ts) plus the
  // click/purchase timestamp lists (collect_list skips the NULLs the
  // off-type rows contribute), then the chained "first at-or-after"
  // steps are array folds over those per-user lists —
  // array_min(filter(clicks, ≥ v1)) and the purchase twin. One shuffle
  // carrying only (user, v1, clicks, purchases), no partition sort, no
  // window passes, map-side partial aggregation. Per-user arrays are
  // bounded by events-per-user (a session cap in any real event
  // pipeline; ~30 here), so aggregate state is bounded the same way
  // q08's address sets are. A NULL v1 nulls the ≥-predicate, so the
  // filter drops everything and c1/p1 stay NULL — exactly the window
  // form's semantics on users with no view. Measured solo at sf1
  // (adjacent windows, best-of-5): 1.11 s → 0.82 s, bit-identical.
  // ---------------------------------------------------------------------
  val q39 = Q("q39_funnel",
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
      |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_ns END)
      |  OVER (PARTITION BY user_id) AS v1 FROM ev),
      |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_ns >= v1
      |  THEN ts_ns END) OVER (PARTITION BY user_id) AS c1 FROM w1),
      |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_ns >= c1
      |  THEN ts_ns END) OVER (PARTITION BY user_id) AS p1 FROM w2)
      |SELECT user_id, MAX(v1) AS view_ts, MAX(c1) AS click_ts,
      |  MAX(p1) AS purchase_ts,
      |  CAST(CASE WHEN MAX(p1) IS NOT NULL THEN 3
      |            WHEN MAX(c1) IS NOT NULL THEN 2
      |            WHEN MAX(v1) IS NOT NULL THEN 1
      |            ELSE 0 END AS BIGINT) AS stage
      |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Functions.tsUs
    // NO fan here (measured): the collect_list partials compress 1M
    // events to 60k users BEFORE the shuffle, and that serial partial
    // is cheaper than hash-fanning the raw rows first — solo at sf1
    // 0.82 s unfanned vs 1.05 s with tableFanBy(user_id) in the same
    // window. Map-side combine wins when it reduces; contrast q08/q36,
    // whose inputs don't compress until the final agg.
    val agged = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsUs(col("ts")).as("ts_ns"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts_ns"))).as("v1"),
        collect_list(when(col("event_type") === "click", col("ts_ns")))
          .as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("ts_ns")))
          .as("purchases"))
      .withColumn("c1",
        array_min(filter(col("clicks"), t => t >= col("v1"))))
      .withColumn("p1",
        array_min(filter(col("purchases"), t => t >= col("c1"))))
    agged
      .select(col("user_id"), col("v1").as("view_ts"), col("c1").as("click_ts"),
        col("p1").as("purchase_ts"),
        when(col("p1").isNotNull, 3L).when(col("c1").isNotNull, 2L)
          .when(col("v1").isNotNull, 1L).otherwise(0L).as("stage"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q40 — cohort retention: users bucketed by the week of their FIRST
  // event (the cohort), then counted per (cohort, weeks-since-cohort)
  // activity cell — the retention matrix behind every engagement
  // dashboard. The week axis is pure integer arithmetic on the ns
  // epoch (`div` 7-days-of-ns), not calendar truncation — deterministic
  // across engines and time zones. Plan (round 11): ONE user_id groupBy
  // carrying `min(wk)` + `collect_set(wk)` — the map-side partial
  // compresses the event stream to a per-user week set before the only
  // wide shuffle, and the collect_set subsumes the distinct. The prior
  // form (min-over-window, then distinct, then the matrix aggregate)
  // paid three data-wide exchanges: the window's user_id sort-shuffle,
  // the distinct's 3-column re-shuffle, and the matrix groupBy; this
  // pays one user_id shuffle of ~|users| pre-combined rows plus the
  // ~|cohort×offset|-sized matrix exchange. Measured solo at sf10
  // (best-of-5, adjacent windows): 1.88 → 0.72 s, hash-identical
  // (gate re-run 90/90). Per-user week sets are bounded by the
  // calendar (|weeks| ≪ memory) — no skew risk at 100 TB.
  // ---------------------------------------------------------------------
  private val weekNs = 7L * 24L * 3600L * 1000000000L

  val q40 = Q("q40_cohort_retention",
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // $weekNs AS wk FROM events),
       |coh AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1),
       |act AS (SELECT DISTINCT e.user_id, c.cohort_wk, e.wk
       |        FROM ev e JOIN coh c USING (user_id))
       |SELECT cohort_wk, wk - cohort_wk AS week_offset, COUNT(*) AS n_users
       |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Functions.tsUs
    table(spark, dir, "events")
      .select(col("user_id"), tsUs(col("ts")).as("ts_ns"))
      .select(col("user_id"), expr(s"ts_ns div $weekNs").as("wk"))
      .groupBy("user_id")
      .agg(min("wk").as("cohort_wk"), collect_set("wk").as("wks"))
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "week_offset")
  }

  // ---------------------------------------------------------------------
  // q41 — time-series gap-fill / resample: every user's activity rolled
  // up to a DENSE hourly grid over the dataset's full hour range —
  // missing hours materialized and forward-filled from the user's last
  // observed hour (leading gaps stay NULL) — the regularization step
  // before any windowed feature extraction or charting. Plan: one
  // (user, hour) aggregate; the grid is users × sequence(min, max hour)
  // (the 2-row bound relation broadcast — sanctioned scalar use); a
  // left join pins observations onto the grid; last(ignoreNulls) over
  // the user partition fills forward. Grid size is users × hours —
  // generated, never shuffled wider than the final (user) partitioning;
  // at 100 TB the grid is the small side of a broadcast-able dimension.
  // Measured, rejected: collapsing to one user_id shuffle by carrying a
  // per-user hour→value MAP through the explode (1.53 vs 1.84 s at
  // sf0.1) — it materializes each user's whole observation set as one
  // row, which row-level spill can't split; the join form has no
  // per-user memory term.
  // ---------------------------------------------------------------------
  private val hourNs = 3600L * 1000000000L

  /** Session memo of q41's (user, hour) aggregate. The query needs obs
    * three ways — the grid's user list, the hour bounds, and the join
    * probe side — and without materialization each consumer re-executes
    * the full events scan+aggregate subtree (the suite's single most
    * expensive rescan). Caching the POST-aggregate relation is the
    * 100 TB-safe choice: it is bounded by users × active-hours, not by
    * event count. Same contract as [[TextQueries.sharedToks]]: parquet
    * immutable for the session; [[invalidateCaches]] releases blocks.
    */
  private val obsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def sharedObs(spark: SparkSession, dir: String): DataFrame =
    obsMemo.getOrElseUpdate((spark, dir), {
      import graft.functions.Functions.tsUs
      graft.functions.CustomFunctions.register(spark)
      table(spark, dir, "events")
        .select(col("user_id"), tsUs(col("ts")).as("ts_ns"), col("value"))
        .select(col("user_id"), expr(s"ts_ns div $hourNs").as("hour"),
          col("value"))
        .groupBy("user_id", "hour")
        .agg(microsDouble(sum(decMicros(col("value")))).as("v"))
        .cache()
    })

  def invalidateCaches(): Unit = {
    obsMemo.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    obsMemo.clear()
  }

  val q41 = Q("q41_gapfill",
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // $hourNs AS hour, value FROM events),
       |obs AS (SELECT user_id, hour,
       |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS v
       |  FROM ev GROUP BY 1, 2),
       |ub AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM ev GROUP BY 1),
       |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM ub),
       |joined AS (
       |  SELECT g.user_id, g.hour, o.v,
       |    CAST(CASE WHEN o.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
       |  FROM grid g LEFT JOIN obs o USING (user_id, hour))
       |SELECT user_id, hour,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
       |  filled
       |FROM joined ORDER BY user_id, hour""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // Gap-fill extent is EACH SERIES' OWN [first, last] observation
    // hour (the pandas per-group resample semantics), NOT the global
    // corpus span: a global-bounds grid is users × total-history rows —
    // output grows ∝ users·span, and on a history that grows with the
    // corpus (the constant-event-rate regime) that is QUADRATIC in
    // scale. Measured: the round-9 generator fix shifted copies onto a
    // constant-rate axis, and the global-span form's sf10 output blew
    // up ~10,000× (users ×100 · span ×100) — the write never finished;
    // the per-user form is Σ_user span_user, linear in the corpus.
    // A deployment wanting a fixed reporting range passes explicit
    // bounds instead — that range is a constant, not a corpus property.
    //
    // The dense grid is NEVER materialized as a join input: each
    // observation row knows its successor's hour (lead), so it owns the
    // half-open run [hour, nxt) of grid hours and emits them directly —
    // carrying the forward-filled value computed over the SMALL obs
    // relation — via one per-row sequence+explode; the last observation
    // owns just its own hour (the series ends at h1 = its hour).
    // Compared to the grid LEFT JOIN + last_value window over
    // Σ span rows, this runs the windows over obs only and replaces the
    // grid join and grid-sized sort with a map-side explode; only the
    // final presentation ORDER BY touches grid-sized data. Same
    // relation: runs partition [h0_u, h1_u] per user exactly.
    val obs = sharedObs(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("hour")
    obs
      .withColumn("nxt", lead(col("hour"), 1).over(byUser))
      // last_value(v IGNORE NULLS): a NULL-v observation carries the
      // previous non-null value through its own run (a leading NULL-v
      // observation's run stays NULL — IGNORE NULLS finds nothing).
      .withColumn("carry", last(col("v"), ignoreNulls = true).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // Explode the BARE hour sequence and derive the per-cell fields
      // after the explode with ordinary (codegen'd) expressions — a
      // transform() lambda building structs here would run interpreted
      // per grid cell (higher-order functions are CodegenFallback).
      .select(col("user_id"), col("hour"), col("v"), col("carry"),
        explode(sequence(col("hour"),
          coalesce(col("nxt") - 1, col("hour")))).as("grid_hour"))
      .select(col("user_id"), col("grid_hour").as("out_hour"),
        col("carry").as("sum_value"),
        when(col("grid_hour") =!= col("hour") || col("v").isNull, 1L)
          .otherwise(0L).as("filled"))
      .withColumnRenamed("out_hour", "hour")
      .orderBy("user_id", "hour")
  }

  val all: Seq[Q] = Seq(q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27,
    q28, q29, q30, q31, q33, q34, q35, q36, q37, q38, q39, q40, q41)
}
