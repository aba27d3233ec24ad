package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.Q
import graft.io.Tables.{table, tableFanBy}
import graft.functions.Functions._

/** Reference-parity operator coverage (SURVEY.md §2), each re-expressed
  * Spark-first over the driver's TPC-H-ish testdata with the *same
  * operator shape* as its Cardano original, plus a DuckDB oracle.
  *
  * Operator key → reference site map is given per query.
  */
object CoreQueries {

  /** Timestamp literal matching however Spark read the parquet column
    * (TIMESTAMP_NTZ when inferTimestampNTZ kicks in, LTZ otherwise) so
    * comparisons stay type-correct AND parquet-pushable.
    */
  private def tsLit(df: DataFrame, colName: String, ts: String): Column =
    df.schema(colName).dataType match {
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.parse(ts.replace(' ', 'T')))
      // session-TZ parse (harness pins UTC); foldable → still pushable.
      // Timestamp.valueOf would parse in the JVM default TZ and shift
      // the instant on non-UTC hosts.
      case _ => to_timestamp(lit(ts))
    }

  /** events.ts reads as int64 nanoseconds-since-epoch — Tables.table
    * normalizes both physical encodings the generator has shipped
    * (TIMESTAMP(NANOS) via `nanosAsLong`, TIMESTAMP(MICROS) via a
    * µs→ns widening) to that one axis; the oracle mirrors via DuckDB
    * `epoch_ns(ts)`. At 100 TB the event-time axis being a plain long
    * is also the cheapest possible sort/partition key.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  /** DuckDB reads TIMESTAMP(NANOS) parquet at microsecond precision, so
    * its `epoch_ns(ts)` is always µs-truncated while Spark keeps the full
    * nanoseconds. Every comparison/order/output on the event-time axis
    * must use this µs-truncated value for the two engines to agree.
    */
  private def tsUs(c: Column): Column = c - c % 1000L

  // ---------------------------------------------------------------------
  // q01 — S1+P1+P2+O1: scan → filter → project → top-K.
  // Cardano original: high-fee top-100 (/root/reference/main.py:24-35).
  // Catalyst plans TakeOrderedAndProject: no global sort materialization,
  // each task keeps a 100-row heap — the right plan at any scale.
  // Unique (orderkey, linenumber) tiebreak makes top-K ties deterministic.
  // ---------------------------------------------------------------------
  val q01 = Q("q01_topk_filter",
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
      |FROM lineitem WHERE l_extendedprice > 95000
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin
  ) { (spark, dir) =>
    table(spark, dir, "lineitem")
      .filter(col("l_extendedprice") > 95000d)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  // ---------------------------------------------------------------------
  // q02 — A2: ungrouped multi-aggregate over the filtered "high fee" set
  // (/root/reference/main.py:45-53). Partial+final HashAggregate, no raw
  // double sums: DECIMAL accumulation is order-independent.
  // ---------------------------------------------------------------------
  val q02 = Q("q02_multi_agg",
    s"""SELECT COUNT(*) AS cnt,
       |  CAST(CAST(SUM(${decSql("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS sum_price,
       |  CAST(CAST(SUM(${decSql("l_extendedprice")}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       |  MAX(l_extendedprice) AS max_price, MIN(l_extendedprice) AS min_price
       |FROM lineitem WHERE l_extendedprice > 50000""".stripMargin
  ) { (spark, dir) =>
    // Deliberately NOT the long-micros fast path (cf. q03): this is a
    // single UNGROUPED financial total, whose unscaled sum crosses the
    // ±2⁶³ micros bound around sf25 (~9.2e12 price units) — the one
    // shape where DECIMAL(38,6)'s 128-bit headroom is the requirement,
    // not a tax.
    table(spark, dir, "lineitem")
      .filter(col("l_extendedprice") > 50000d)
      .agg(
        count(lit(1)).as("cnt"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"))
  }

  // ---------------------------------------------------------------------
  // q03 — A1/A4 grouped aggregation (TPC-H Q1 shape): the reference's
  // pandas groupby-agg (/root/reference/token_fee_analysis.py:319-325)
  // folded into the engine. Map-side partial agg → 6-group final agg.
  // ---------------------------------------------------------------------
  val q03 = Q("q03_group_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(CAST(SUM(${decSql("l_quantity")}) AS VARCHAR) AS DOUBLE) AS sum_qty,
       |  CAST(CAST(SUM(${decSql("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       |  CAST(CAST(SUM(${decSql("l_extendedprice * (1 - l_discount)")}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       |  CAST(CAST(SUM(${decSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS VARCHAR) AS DOUBLE) AS sum_charge,
       |  CAST(CAST(SUM(${decSql("l_quantity")}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(CAST(SUM(${decSql("l_extendedprice")}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       |  CAST(CAST(SUM(${decSql("l_discount")}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (spark, dir) =>
    // Long-micros partials instead of DECIMAL(38,6) partials: every
    // DECIMAL(38) `+` is a Java BigDecimal allocation, the measured
    // 9.5× gap vs DuckDB's int128 sums at sf1. decimal_micros rounds
    // each double to the cast's exact unscaled value ONCE per row, the
    // five SUMs then run on primitive longs, and micros_double reads
    // each group total back as the identical double — DecimalSumSpec
    // pins bit-equality vs the dec() form on real data. Bound: exact
    // while a group's unscaled total fits ±2⁶³ (|Σ| < ~9.2e12 units —
    // extendedprice sums reach ~1e11/group at sf1, ~1e13 only around
    // sf100: at that scale flip these five sums back to dec()).
    graft.functions.CustomFunctions.register(spark)
    val li = table(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= tsLit(li, "l_shipdate", "1998-09-01 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(decMicros(col("l_quantity"))).as("_sq"),
        sum(decMicros(col("l_extendedprice"))).as("_sp"),
        sum(decMicros(col("l_extendedprice") * (lit(1d) - col("l_discount")))).as("_sdp"),
        sum(decMicros(col("l_extendedprice") * (lit(1d) - col("l_discount")) * (lit(1d) + col("l_tax")))).as("_sc"),
        sum(decMicros(col("l_discount"))).as("_sd"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        microsDouble(col("_sq")).as("sum_qty"),
        microsDouble(col("_sp")).as("sum_base_price"),
        microsDouble(col("_sdp")).as("sum_disc_price"),
        microsDouble(col("_sc")).as("sum_charge"),
        (microsDouble(col("_sq")) / col("count_order")).as("avg_qty"),
        (microsDouble(col("_sp")) / col("count_order")).as("avg_price"),
        (microsDouble(col("_sd")) / col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------------
  // q04 — P3+F1: binary equality filter against an unhex'd hex literal,
  // the token (policy_id, asset_name) lookup shape
  // (/root/reference/token_fee_analysis.py:130-131). BinaryType === works
  // natively; md5 stands in for the 28-byte policy id.
  // ---------------------------------------------------------------------
  private val brandHex = "aa782da4cba1782417f6e0cc74f2f95a" // md5('Brand#13')
  val q04 = Q("q04_binary_unhex_filter",
    s"""SELECT p_partkey, p_brand, md5(p_brand) AS brand_md5 FROM part
       |WHERE unhex(md5(p_brand)) = unhex('$brandHex')
       |ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    table(spark, dir, "part")
      .filter(unhex(md5(col("p_brand"))) === unhex(lit(brandHex)))
      .select(col("p_partkey"), col("p_brand"), md5(col("p_brand")).as("brand_md5"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------------
  // q05 — P4: dynamic AND-composed optional range predicate, the
  // reference's optional slot-range filter
  // (/root/reference/token_fee_analysis.py:133-140), on the order-date
  // axis. Both bounds push down to the parquet scan.
  // ---------------------------------------------------------------------
  val q05 = Q("q05_range_filter",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val o = table(spark, dir, "orders")
    o.filter(rangeFilter(col("o_orderdate"),
        Some(tsLit(o, "o_orderdate", "1996-01-01 00:00:00")),
        Some(tsLit(o, "o_orderdate", "1996-12-31 00:00:00"))))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------------
  // q06 — J1: IN-subquery as left-semi join
  // (/root/reference/token_fee_analysis.py:212). The distinct key set is
  // small → Catalyst/AQE broadcasts it; no full shuffle of orders.
  // ---------------------------------------------------------------------
  val q06 = Q("q06_semi_join",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val rich = table(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000d).select("c_custkey")
    table(spark, dir, "orders")
      // the distinct key set is balance-filtered → data-dependent; AQE
      // broadcasts it from runtime size (no static hint to outgrow)
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------------
  // q07 — J2: composite-key equi join resolving each line item against a
  // (partkey, suppkey)-keyed aggregate — the relational core of the
  // UNNEST(tx.inputs) JOIN in
  // /root/reference/token_fee_analysis.py:220-225. The measured query is
  // the direct join (the plan a real user gets — explode∘collect_list is
  // the identity, so materializing the array first only adds two
  // shuffles); the array-of-struct build + explode shape itself
  // (/root/reference/ogmios_parquet.py:40-51) is pinned equivalent to
  // this plan by OperatorsSpec, and exercised for real on nested Cardano
  // data by q10/c01.
  // ---------------------------------------------------------------------
  val q07 = Q("q07_explode_composite_join",
    s"""SELECT l.l_orderkey, COUNT(*) AS n_items,
       |  CAST(CAST(SUM(g.tot) AS VARCHAR) AS DOUBLE) AS sum_group_qty
       |FROM lineitem l
       |JOIN (SELECT l_partkey, l_suppkey, SUM(${decSql("l_quantity")}) AS tot
       |      FROM lineitem GROUP BY l_partkey, l_suppkey) g
       |  ON g.l_partkey = l.l_partkey AND g.l_suppkey = l.l_suppkey
       |GROUP BY l.l_orderkey ORDER BY l.l_orderkey""".stripMargin
  ) { (spark, dir) =>
    // The join-back against the table's own (partkey, suppkey) aggregate
    // is a whole-partition window sum in disguise: every lineitem row
    // joins exactly one group row, so `SUM(qty) OVER (PARTITION BY pk,
    // sk)` attaches the same `tot` with ONE scan and ONE shuffle of the
    // fact table — where the join form scans lineitem twice and pays the
    // aggregate's exchange on top of the join's. Bit-identical (the
    // window partial-sums the same exact decimals).
    // Long-micros partials for both the window sum and the per-order
    // re-sum (see DecimalMicros: bit-identical to the dec() form while
    // the quantity totals stay under ~9.2e12 units — far past sf1000
    // for per-(partkey,suppkey) groups).
    graft.functions.CustomFunctions.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_partkey", "l_suppkey")
    table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .withColumn("tot", sum(decMicros(col("l_quantity"))).over(w))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"), microsDouble(sum(col("tot"))).as("sum_group_qty"))
      .orderBy("l_orderkey")
  }

  /** The q07 array round-trip shape (collect_list(struct) → explode →
    * composite-key join), kept for the J2 operator demonstration:
    * OperatorsSpec pins that this plan produces exactly q07's output.
    * Not the measured query — the round-trip adds a collect_list shuffle
    * plus an explode for a provably identical result.
    */
  def q07ArrayRoundTrip(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val li = table(spark, dir, "lineitem")
    val withArray = li
      .groupBy("l_orderkey")
      .agg(collect_list(struct(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))).as("items"))
    val grp = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(dec(col("l_quantity"))).as("tot"))
    withArray
      .select(col("l_orderkey"), explode(col("items")).as("it"))
      .join(grp, col("it.pk") === col("l_partkey") && col("it.sk") === col("l_suppkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"), sum(col("tot")).cast("double").as("sum_group_qty"))
      .orderBy("l_orderkey")
  }

  // ---------------------------------------------------------------------
  // q08 — A3: grouped sorted-distinct collect, the address-set
  // canonicalization ARRAY_SORT(ARRAY_AGG(DISTINCT …))
  // (/root/reference/token_fee_analysis.py:218-226). Output as a joined
  // string so the hash compare sees a scalar.
  // ---------------------------------------------------------------------
  val q08 = Q("q08_collect_set_sorted",
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prio_set,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  ) { (spark, dir) =>
    // tableFanBy(custkey): the input is a 1-2-split scan at bench
    // scale, so the ObjectHashAggregate partial (the query's only real
    // work) would run on one core without the rebalance; hash-fanning
    // on the group key parallelizes it AND replaces the aggregation
    // exchange (same key, same partitioning). Measured solo at sf1:
    // 1.16 s → 1.00 s (round-robin fan rejected: its retry-determinism
    // local full-row sort measured 2.12 s).
    tableFanBy(spark, dir, "orders", col("o_custkey"))
      .select("o_custkey", "o_orderpriority")
      .groupBy("o_custkey")
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prio_set"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------------
  // q09 — P5+J3: left outer join then NULL-safe inequality
  // (IS DISTINCT FROM, /root/reference/token_fee_analysis.py:244-247):
  // customers whose "latest order status" differs null-safely from 'F'
  // (customers with no orders at all are kept — NULL ≠ 'F').
  // ---------------------------------------------------------------------
  val q09 = Q("q09_nullsafe_neq",
    """SELECT c.c_custkey, c.c_mktsegment,
      |  COALESCE(s.max_status, '<none>') AS max_status
      |FROM customer c
      |LEFT JOIN (SELECT o_custkey, MAX(o_orderstatus) AS max_status
      |           FROM orders GROUP BY o_custkey) s
      |  ON s.o_custkey = c.c_custkey
      |WHERE s.max_status IS DISTINCT FROM 'F'
      |ORDER BY c.c_custkey""".stripMargin
  ) { (spark, dir) =>
    val st = table(spark, dir, "orders")
      .groupBy("o_custkey").agg(max(col("o_orderstatus")).as("max_status"))
    table(spark, dir, "customer")
      .join(st, col("c_custkey") === col("o_custkey"), "left")
      .filter(!(col("max_status") <=> lit("F")))
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("max_status"), lit("<none>")).as("max_status"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------------
  // q10 — THE FLAGSHIP: the full token-transfer CTE pipeline
  // (/root/reference/token_fee_analysis.py:204-249) re-expressed on
  // orders/lineitem. Mapping: lineitem rows = outputs (outpoint =
  // (l_orderkey, l_linenumber), address = supplier); "token-holding" =
  // returnflag R & qty > 45; a tx's inputs = the outpoints of the same
  // customer's previous order. Pipeline: token-output filter → semi join
  // (J1) → build+explode inputs array and composite-key join (J2) →
  // sorted-distinct address sets (A3) → double left join (J3) → null-safe
  // set inequality (P5) → total order (O2).
  // ---------------------------------------------------------------------
  val q10 = Q("q10_transfer_pipeline",
    """WITH tu AS (
      |  SELECT l_orderkey AS tx_id, l_linenumber AS output_index,
      |         'S' || CAST(l_suppkey AS VARCHAR) AS address
      |  FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
      |), relevant AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderkey IN (SELECT DISTINCT tx_id FROM tu)
      |), prev AS (
      |  SELECT o_orderkey,
      |         lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_ok
      |  FROM orders
      |), inp AS (
      |  SELECT p.o_orderkey, p.prev_ok AS tx_id, l.l_linenumber AS output_index
      |  FROM prev p JOIN lineitem l ON l.l_orderkey = p.prev_ok
      |  WHERE p.o_orderkey IN (SELECT o_orderkey FROM relevant)
      |), input_addresses AS (
      |  SELECT i.o_orderkey,
      |         array_to_string(list_sort(list(DISTINCT t.address)), ',') AS in_addrs
      |  FROM inp i JOIN tu t
      |    ON t.tx_id = i.tx_id AND t.output_index = i.output_index
      |  GROUP BY i.o_orderkey
      |), output_addresses AS (
      |  SELECT tx_id AS o_orderkey,
      |         array_to_string(list_sort(list(DISTINCT address)), ',') AS out_addrs
      |  FROM tu GROUP BY tx_id
      |)
      |SELECT r.o_orderkey, r.o_totalprice,
      |       COALESCE(i.in_addrs, '') AS in_addrs,
      |       COALESCE(o.out_addrs, '') AS out_addrs
      |FROM relevant r
      |LEFT JOIN input_addresses i ON r.o_orderkey = i.o_orderkey
      |LEFT JOIN output_addresses o ON r.o_orderkey = o.o_orderkey
      |WHERE i.in_addrs IS DISTINCT FROM o.out_addrs
      |ORDER BY r.o_orderkey""".stripMargin
  ) { (spark, dir) =>
    transferPipelinePreAgg(table(spark, dir, "lineitem"), table(spark, dir, "orders"))
  }

  /** The union-groupBy q10 body over the plain parquet tables — reused
    * by SparkEntry.entry and kept as the measured A/B counterpart of
    * the shipped [[transferPipelinePreAgg]] form (Round10Spec pins
    * their hash equality, so a semantic drift in either turns red).
    *
    * Measured, rejected (round 8): a "deferred-relevance" form that
    * drops all three pruning joins (tu.distinct semi-join, relevantCust
    * distinct + semi-join) and recovers the relevant set after the one
    * groupBy via `out_addrs != ''` — fewer shuffles on paper, but 4.3 s
    * vs this form's 2.8 s solo at sf1 (adjacent quiet windows, best-of-5
    * each, equivalence spec-verified before benching): the unpruned lag
    * window over ALL orders plus the unpruned consumed-side join fan-out
    * cost more than the three narrow semi-join shuffles they replace.
    * Eager pruning stands — the relevant set is selective enough that
    * shrinking every later stage dominates.
    */
  def transferPipeline(spark: SparkSession, dir: String): DataFrame =
    transferPipelineOn(table(spark, dir, "lineitem"), table(spark, dir, "orders"))

  /** q10 body over arbitrary lineitem/orders relations — the plain
    * parquet path above and the bucketed-catalog path
    * ([[graft.BucketedBench]]) share this verbatim, so the storage
    * layout is the ONLY variable in the bucketed A/B.
    */
  def transferPipelineOn(li: DataFrame, orders: DataFrame): DataFrame = {
    // token-holding outputs (P2 filter; projection pruned at the scan)
    val tu = li
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45d)
      .select(col("l_orderkey").as("tx_id"), col("l_linenumber").as("output_index"),
        concat(lit("S"), col("l_suppkey").cast("string")).as("address"))

    // J1: txs that created token outputs (semi join — small distinct key
    // set). o_custkey rides along so the window-input pruning below needs
    // no second orders scan+join to recover it.
    val relevant = orders
      .join(tu.select("tx_id").distinct(), col("o_orderkey") === col("tx_id"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")

    // each order's "inputs": outpoints of the same customer's previous
    // order. The lag window only needs customers that have at least one
    // relevant order — pruning its input before the window shuffle (the
    // orders of everyone else can never produce a surviving row).
    val relevantCust = relevant.select("o_custkey").distinct()
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val prev = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(relevantCust, Seq("o_custkey"), "left_semi")
      .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
      .select("o_orderkey", "prev_ok")

    // J2 + A3: resolve the previous order's outpoints against token
    // outputs on the composite key, canonicalize the consumed-address
    // set. tu's outpoints are a subset of the previous order's lineitem
    // rows, and collect_set is multiplicity-blind, so joining tu
    // directly ≡ the oracle's explicit lineitem outpoint enumeration —
    // minus one groupBy and one explode-join (two shuffles).
    //
    // The consumed and produced sides aggregate over the SAME key domain
    // (o_orderkey), so instead of two groupBys + two left joins, a
    // side-tagged union feeds ONE groupBy whose conditional collect_sets
    // compute both address sets in a single shuffle. collect_set drops
    // the NULLs the off-side rows contribute. Equivalence to the
    // two-join form: out_addrs is never NULL or '' for a relevant order
    // (every relevant o_orderkey has ≥1 tu row by construction), so
    // in_addrs='' (empty set) filters and renders identically to the
    // old NULL — the IS DISTINCT FROM and the final coalesce('') agree
    // on every row.
    val inRows = prev
      .join(relevant.select("o_orderkey"), Seq("o_orderkey"), "left_semi")
      .join(tu, tu("tx_id") === col("prev_ok"))
      .select(col("o_orderkey"), col("address"), lit(true).as("is_in"))
    val outRows = tu.select(col("tx_id").as("o_orderkey"), col("address"),
      lit(false).as("is_in"))
    val addrs = inRows.union(outRows)
      .groupBy("o_orderkey")
      .agg(
        array_join(sort_array(collect_set(when(col("is_in"), col("address")))), ",")
          .as("in_addrs"),
        array_join(sort_array(collect_set(when(!col("is_in"), col("address")))), ",")
          .as("out_addrs"))

    // J3 + P5 + O2 (single join: both address sets arrive together)
    relevant
      .join(addrs, Seq("o_orderkey"), "left")
      .filter(!(col("in_addrs") <=> col("out_addrs")))
      .select(col("o_orderkey"), col("o_totalprice"),
        coalesce(col("in_addrs"), lit("")).as("in_addrs"),
        coalesce(col("out_addrs"), lit("")).as("out_addrs"))
      .orderBy("o_orderkey")
  }

  /** The SHIPPED q10 body since round 10 (A/B winner over
    * [[transferPipelineOn]], graft.Q10Profile, adjacent quiet windows,
    * outputs hash-equal at every SF measured): sf10 5.48 vs 7.52 s
    * (−27%), sf0.1 0.85 vs 0.99 s (−14%), sf1 2.10 vs 1.79 s (+15%, the
    * one regime where the union form's exploded rows still broadcast
    * cheaply). The sf10 stage table puts the union form's marginal cost
    * in its final stage (+4.1 s of 8.8 s cumulative — the union-groupBy
    * shuffle of per-address rows plus the two joins against it); this
    * form aggregates each tx's address set ONCE and joins one string
    * per order, which is why its lead GROWS with scale — the 100 TB
    * regime the engine targets. Aggregate
    * each tx's token-output address set ONCE (`tuAgg`, one groupBy over
    * tu), then resolve both sides by join — `out_addrs` is
    * `tuAgg[o_orderkey]`, and because the lag window yields exactly ONE
    * previous order per order, `in_addrs` is just `tuAgg[prev_ok]` (the
    * oracle's inp⋈tu aggregation collapses to a lookup: tu's outpoints
    * are a subset of the previous order's lineitem rows and collect_set
    * is multiplicity-blind). This replaces the exploded per-address
    * union → groupBy shuffle with joins that move one aggregated string
    * per order, and tuAgg's groupBy exchange (hash(tx_id)) is reusable
    * by both probes. Equivalence: prev ⊇ relevant (every relevant
    * order's customer is in relevantCust), the out join is inner-safe
    * (every relevant order has ≥1 tu row by construction), and a
    * missing/NULL prev_ok or a token-free previous order yields NULL
    * in_addrs → coalesce('') — identical to the union form's empty set.
    * Q10PipelineSpec pins hash equality; graft.Q10Profile measures it.
    */
  def transferPipelinePreAgg(li: DataFrame, orders: DataFrame): DataFrame = {
    val tu = li
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45d)
      .select(col("l_orderkey").as("tx_id"), col("l_linenumber").as("output_index"),
        concat(lit("S"), col("l_suppkey").cast("string")).as("address"))

    val tuAgg = tu.groupBy("tx_id")
      .agg(array_join(sort_array(collect_set(col("address"))), ",").as("addrs"))

    val relevant = orders
      .join(tuAgg.select("tx_id"), col("o_orderkey") === col("tx_id"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")

    // Round 12: the relevantCust pruning that used to gate this window's
    // input is GONE. The sf10 executed plan showed its real price — a
    // full second exchange of orders (343 MiB) + a sort-merge semi join
    // + the distinct's own agg exchange — to remove only ~13% of window
    // rows: tu's filter keeps ~2.5% of lineitems, but those touch ~87%
    // of customers, and filter selectivity (hence retention) is
    // scale-invariant, so the trade never inverts at larger SFs. The lag
    // values the output reads are identical because the pruning removed
    // whole customers only — every kept customer's order sequence was
    // already intact. Measured (R12Profile q10np, equality-checked both
    // directions): sf0.1 0.93 → 0.67 s (−28%), sf10 5.00 → 4.28 s
    // (−14%). The tuAgg relevance semi join and the in/out lookups stay
    // — round 8 measured THOSE as load-bearing (they gate the join
    // fan-out); only the window-input pruning was net-negative.
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val prev = orders.select(col("o_orderkey"), col("o_custkey"))
      .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
      .select("o_orderkey", "prev_ok")

    relevant
      .join(tuAgg.select(col("tx_id").as("o_orderkey"), col("addrs").as("out_addrs")),
        Seq("o_orderkey"))
      .join(prev, Seq("o_orderkey"), "left")
      .join(tuAgg.select(col("tx_id").as("prev_ok"), col("addrs").as("in_addrs")),
        Seq("prev_ok"), "left")
      .filter(!(col("in_addrs") <=> col("out_addrs")))
      .select(col("o_orderkey"), col("o_totalprice"),
        coalesce(col("in_addrs"), lit("")).as("in_addrs"),
        coalesce(col("out_addrs"), lit("")).as("out_addrs"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------------
  // q11 — J3 standalone: left outer join + grouped agg with NULL-correct
  // count/sum over empty groups.
  // ---------------------------------------------------------------------
  val q11 = Q("q11_left_join_agg",
    s"""SELECT n.n_nationkey, n.n_name, COUNT(c.c_custkey) AS n_cust,
       |  CAST(CAST(SUM(${decSql("c.c_acctbal")}) AS VARCHAR) AS DOUBLE) AS sum_bal
       |FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
       |GROUP BY n.n_nationkey, n.n_name ORDER BY n.n_nationkey""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    // Aggregate BELOW the join (round-11 floor-tail profile): the naive
    // nation-LEFT-JOIN-customer-then-groupBy shape shuffles every
    // customer row into |nation| = 25 hot keys before aggregating —
    // measured at sf10: 1.01 s for join+agg vs 0.21 s for the same
    // aggregate alone (scan floor 0.12 s; the decimal sum is NOT the
    // cost, the raw-row join shuffle is). Pre-aggregating per
    // c_nationkey is map-side partial → one ~25-row exchange, and the
    // left join then touches 25×25 rows. Semantics are identical
    // because nation's group keys are unique per nationkey: COUNT over
    // a customer-less nation becomes a missing key → coalesce to 0;
    // SUM stays NULL — exactly the outer-join aggregate's values.
    // At 100 TB this is the only shape that works at all: the naive
    // plan's per-key row count grows linearly while the key space
    // stays 25 — guaranteed executor-OOM skew.
    val perNation = table(spark, dir, "customer")
      .groupBy("c_nationkey")
      .agg(count(col("c_custkey")).as("cnt"),
        microsDouble(sum(decMicros(col("c_acctbal")))).as("bal"))
    table(spark, dir, "nation")
      .join(perNation, col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("n_cust"), col("bal").as("sum_bal"))
      .orderBy("n_nationkey")
  }

  // ---------------------------------------------------------------------
  // q12 — F4: era-aware slot → POSIX ms (piecewise linear over the
  // Byron/Shelley boundary, /root/reference/token_fee_analysis.py:8-16).
  // event_id + 4.4M straddles the 4,492,800 boundary, exercising both arms.
  // ---------------------------------------------------------------------
  val q12 = Q("q12_slot_time",
    s"""SELECT event_id, event_id + 4400000 AS slot,
       |  ${slotToPosixMsSql("(event_id + 4400000)")} AS posix_ms
       |FROM events ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    events(spark, dir)
      .select(col("event_id"), (col("event_id") + 4400000L).as("slot"))
      .withColumn("posix_ms", slotToPosixMs(col("slot")))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------------
  // q13 — F7: string split + element access (pool margin "n/d" parse,
  // /root/reference/ogmios_parquet.py:432-435).
  // ---------------------------------------------------------------------
  val q13 = Q("q13_string_split",
    """SELECT p_partkey, p_type,
      |  string_split(p_type, ' ')[1] AS first_word,
      |  string_split(p_type, ' ')[-1] AS last_word,
      |  len(string_split(p_type, ' ')) AS n_words
      |FROM part ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    table(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"),
        element_at(split(col("p_type"), " "), 1).as("first_word"),
        element_at(split(col("p_type"), " "), -1).as("last_word"),
        size(split(col("p_type"), " ")).cast("long").as("n_words"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------------
  // q14 — windowed running aggregate (the as-of family behind the
  // reference's README community asks, /root/reference/README.md:130-145;
  // not in the reference's own surface — SURVEY.md §2.5). Exact DECIMAL
  // running sum. NB: (l_orderkey, l_linenumber) is NOT unique in the
  // testdata — the frame order needs l_partkey too to be total.
  // ---------------------------------------------------------------------
  val q14 = Q("q14_window_running",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
       |  CAST(CAST(SUM(${decSql("l_quantity")}) OVER (
       |    PARTITION BY l_suppkey
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_qty
       |FROM lineitem
       |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin
  ) { (spark, dir) =>
    graft.functions.CustomFunctions.register(spark)
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        microsDouble(sum(decMicros(col("l_quantity"))).over(w)).as("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
  }

  // ---------------------------------------------------------------------
  // q15 — as-of point lookup ("stake at a specific slot",
  // /root/reference/README.md:130): per user, the last event at or before
  // a cutoff. row_number over (ts desc, event_id desc) — deterministic.
  // ---------------------------------------------------------------------
  private val cutoffNs = 1705276800000000000L // 2024-01-15T00:00:00Z
  val q15 = Q("q15_asof_last",
    s"""SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       |  value AS last_value, epoch_ns(ts) AS ts_ns
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM events WHERE epoch_ns(ts) <= $cutoffNs) t
       |WHERE rn = 1 ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    // filter/order/output all on the µs-truncated axis (see tsUs): an
    // event 999 ns above the cutoff is IN for the µs-reading oracle, and
    // two events in the same µs must tie-break on event_id identically.
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("ts_us", tsUs(col("ts")))
      .filter(col("ts_us") <= cutoffNs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("ts_us").as("ts_ns"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q16 — event-time bucketing: the slot-group bucketing of the ingest
  // pipeline (/root/reference/ogmios_parquet.py:212-215) as a relational
  // hourly rollup; batch twin of the streaming windowed agg (§2.9).
  // ---------------------------------------------------------------------
  private val hourNs = 3600L * 1000000000L
  val q16 = Q("q16_time_bucket",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $hourNs AS bucket_ns, event_type,
       |  COUNT(*) AS cnt, CAST(CAST(SUM(${decSql("value")}) AS VARCHAR) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (spark, dir) =>
    // bucket on the µs-truncated axis (tsUs): a timestamp within 1 µs
    // above an hour boundary must land in the same bucket as the oracle's
    // µs-read value at any scale factor.
    graft.functions.CustomFunctions.register(spark)
    events(spark, dir)
      .groupBy((tsUs(col("ts")) - tsUs(col("ts")) % hourNs).as("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), microsDouble(sum(decMicros(col("value")))).as("sum_value"))
      .orderBy("bucket_ns", "event_type")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16)
}
