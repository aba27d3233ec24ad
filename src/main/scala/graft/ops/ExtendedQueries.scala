package graft.ops

import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Tables.table

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
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rflag, lstatus""".stripMargin
  ) { (spark, dir) =>
    table(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"))
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
    // anti join: customers who never placed a >400k order
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
  // DISTINCT): HyperLogLog++ sketch vs exact. Sketch values are
  // engine-specific → rows-only; ExtendedQueriesSpec pins the relative
  // error bound against the exact count. At 100 TB this is the only
  // count-distinct that avoids a full shuffle of the key set.
  // ---------------------------------------------------------------------
  val q20 = Q.noOracle("q20_approx_distinct") { (spark, dir) =>
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        count_distinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(q17, q18, q19, q20)
}
