package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.CustomFunctions
import graft.ops.{DedupQueries, TextQueries}

/** Round-12 rewrite A/B harness: candidate exchange-elimination forms of
  * d11 (span-pair attribution) and t07 (unigram scoring) measured
  * against the shipped forms under Bench's exact session configuration.
  * Each candidate is equality-checked against the shipped query (both
  * directions of exceptAll) before any timing, so a variant that drifts
  * semantically is rejected before it can post a number.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_PASSES=5]
  *        runMain graft.R12Profile [d11|t07|all]
  */
object R12Profile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_PASSES").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CustomFunctions.register(spark)

    // ---- d11 variants -------------------------------------------------
    def d11Shipped: DataFrame = DedupQueries.d11.fn(spark, sfDir)

    /** distinct → window-min over h (join eliminated; the srcs relation
      * never exists — each row learns its key's min doc in place). */
    def d11Window: DataFrame = {
      val wd = DedupQueries.sharedWins(spark, sfDir)
        .select("h", "doc_id").distinct()
      wd.withColumn("src", min("doc_id").over(Window.partitionBy("h")))
        .filter(col("doc_id") =!= col("src"))
        .groupBy(col("src").as("src_doc"), col("doc_id").as("dup_doc"))
        .agg(count(lit(1)).as("n_windows"))
        .orderBy("src_doc", "dup_doc")
    }

    /** repartition(h) BEFORE the distinct so the dedup aggregate, the
      * window, and the min all ride ONE h-keyed exchange (the distinct's
      * (h, doc_id) clustering requirement is satisfied by h alone). */
    def d11OneExchange: DataFrame = {
      val wd = DedupQueries.sharedWins(spark, sfDir)
        .select("h", "doc_id").repartition(col("h"))
        .dropDuplicates("h", "doc_id")
      wd.withColumn("src", min("doc_id").over(Window.partitionBy("h")))
        .filter(col("doc_id") =!= col("src"))
        .groupBy(col("src").as("src_doc"), col("doc_id").as("dup_doc"))
        .agg(count(lit(1)).as("n_windows"))
        .orderBy("src_doc", "dup_doc")
    }

    // ---- t07 variants -------------------------------------------------
    def t07Shipped: DataFrame = TextQueries.t07.fn(spark, sfDir)

    /** corpus freq via window-sum over tok (vocab relation + join
      * eliminated; one tok exchange instead of agg-exchange + probe
      * re-exchange). */
    def t07Window: DataFrame = {
      val tc = TextQueries.sharedTokCounts(spark, sfDir)
      tc.withColumn("freq", sum("cnt").over(Window.partitionBy("tok")))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_toks"),
          sum(col("cnt") * col("freq")).cast("double").as("sum_tok_freq"),
          sum(when(col("freq") <= TextQueries.rareFreqMax, col("cnt"))
            .otherwise(0L)).as("n_rare"))
        .orderBy("doc_id")
    }

    /** t07 with ONE tok-keyed exchange (the d11 pattern, minus the sort
      * the rejected window variant paid): repartition the term-count
      * stream by tok once; the vocab aggregate's clustering requirement
      * rides it (no agg exchange), and the scoring join of two
      * co-partitioned children plans as SHJ build=vocab — the stream
      * never crosses the wire a second time. */
    def t07OneExchange: DataFrame = {
      val tcp = TextQueries.sharedTokCounts(spark, sfDir).repartition(col("tok"))
      val vocab = tcp.groupBy("tok").agg(sum(col("cnt")).as("freq"))
      tcp.join(vocab.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_toks"),
          sum(col("cnt") * col("freq")).cast("double").as("sum_tok_freq"),
          sum(when(col("freq") <= TextQueries.rareFreqMax, col("cnt"))
            .otherwise(0L)).as("n_rare"))
        .orderBy("doc_id")
    }

    // ---- t11 variant ----------------------------------------------------
    def t11Shipped: DataFrame = TextQueries.t11.fn(spark, sfDir)

    /** Same one-exchange rewrite for t11's tf⋈df scoring join. */
    def t11OneExchange: DataFrame = {
      import graft.io.Tables.tableFan
      val tfp = TextQueries.sharedTokCounts(spark, sfDir)
        .select(col("doc_id"), col("tok"), col("cnt").as("tf"))
        .repartition(col("tok"))
      val dfRel = tfp.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = tableFan(spark, sfDir, "documents").groupBy().count()
        .select(col("count").as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
      tfp.join(dfRel.hint("shuffle_hash"), "tok")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok"),
          ((col("tf") * col("n")).cast("double") / col("df").cast("double")).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TextQueries.keywordK)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("tok").as("term"), col("score"))
        .orderBy("doc_id", "rank")
    }

    if (which == "t11" || which == "all") {
      check("t11_one_exchange", t11Shipped, t11OneExchange)
      time("t11_shipped", t11Shipped)
      time("t11_one_exchange", t11OneExchange)
    }

    def check(name: String, a: => DataFrame, b: => DataFrame): Unit = {
      val da = a; val db = b
      val onlyA = da.exceptAll(db).count()
      val onlyB = db.exceptAll(da).count()
      require(onlyA == 0 && onlyB == 0,
        s"$name variant drifted: $onlyA rows only in shipped, $onlyB only in variant")
      println(s"[equal] $name")
    }

    def time(name: String, df: => DataFrame): Unit = {
      val d = df
      var best = Double.MaxValue
      (1 to passes).foreach { _ =>
        val t0 = System.nanoTime()
        d.write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[best] $name%-22s $best%8.3f s")
    }

    // ---- q10 variant ----------------------------------------------------
    def q10Shipped: DataFrame = ops.CoreQueries.q10.fn(spark, sfDir)

    /** Fuse the relevance semi join and the out_addrs join: tx_id is
      * tuAgg's group key (unique), so orders INNER JOIN tuAgg is
      * row-for-row the semi join AND delivers out_addrs in the same
      * pass — the separate distinct-tx_id scan+agg+broadcast and one
      * whole join drop out, and the in_addrs probe can reuse tuAgg's
      * exchange (same aggregate subtree). */
    def q10Fused: DataFrame = {
      import graft.io.Tables.table
      val li = table(spark, sfDir, "lineitem")
      val orders = table(spark, sfDir, "orders")
      val tu = li
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45d)
        .select(col("l_orderkey").as("tx_id"),
          concat(lit("S"), col("l_suppkey").cast("string")).as("address"))
      val tuAgg = tu.groupBy("tx_id")
        .agg(array_join(sort_array(collect_set(col("address"))), ",").as("addrs"))
      val relevant = orders
        .join(tuAgg, col("o_orderkey") === col("tx_id"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("addrs").as("out_addrs"))
      val relevantCust = relevant.select("o_custkey").distinct()
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val prev = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(relevantCust, Seq("o_custkey"), "left_semi")
        .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
        .select("o_orderkey", "prev_ok")
      relevant
        .join(prev, Seq("o_orderkey"), "left")
        .join(tuAgg.select(col("tx_id").as("prev_ok"), col("addrs").as("in_addrs")),
          Seq("prev_ok"), "left")
        .filter(!(col("in_addrs") <=> col("out_addrs")))
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("in_addrs"), lit("")).as("in_addrs"),
          coalesce(col("out_addrs"), lit("")).as("out_addrs"))
        .orderBy("o_orderkey")
    }

    // ---- q07 variant ----------------------------------------------------
    def q07Shipped: DataFrame = ops.CoreQueries.q07.fn(spark, sfDir)

    /** Replace the window's per-partition SORT with a hash aggregate +
      * shuffled-hash join riding the SAME exchange: repartition by
      * (pk, sk) once; the groupBy's clustering requirement is already
      * satisfied (no agg exchange), and the join of two co-partitioned
      * children plans as SHJ (threshold conf) with zero additional
      * exchanges — the repartition exchange is reused for both join
      * inputs. Total: 1 exchange, 0 sorts before the presentation
      * orderBy, where the window form pays 1 exchange + 1 full sort of
      * the fact stream. The bet: hashing 60M rows (build ≈ row count —
      * 98% of groups are singletons) beats comparison-sorting them. */
    def q07ReusedShj: DataFrame = {
      import graft.io.Tables.table
      import graft.functions.Functions.{decMicros, microsDouble}
      val base = table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .repartition(col("l_partkey"), col("l_suppkey"))
      val g = base.groupBy("l_partkey", "l_suppkey")
        .agg(sum(decMicros(col("l_quantity"))).as("tot"))
      base.join(g.hint("shuffle_hash"), Seq("l_partkey", "l_suppkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          microsDouble(sum(col("tot"))).as("sum_group_qty"))
        .orderBy("l_orderkey")
    }

    if (which == "q07" || which == "all") {
      check("q07_reused_shj", q07Shipped, q07ReusedShj)
      time("q07_shipped", q07Shipped)
      time("q07_reused_shj", q07ReusedShj)
    }

    /** Shipped q10 minus ONLY the relevantCust pruning of the lag
      * window's input. The sf10 executed plan shows that pruning costs a
      * full second exchange of orders (343 MiB) + an SMJ + the distinct
      * chain (28 MiB agg exchange) to remove ~13% of window rows — tu's
      * filter keeps ~2.5% of lineitems, which still touch ~87% of
      * customers, and that retention is scale-invariant (same filter
      * selectivity at every SF). The tu-distinct relevance semi join and
      * the inRows pruning stay (those gate the join fan-out, the part
      * round 8 measured as load-bearing). */
    def q10NoCustPrune: DataFrame = {
      import graft.io.Tables.table
      val li = table(spark, sfDir, "lineitem")
      val orders = table(spark, sfDir, "orders")
      val tu = li
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45d)
        .select(col("l_orderkey").as("tx_id"),
          col("l_linenumber").as("output_index"),
          concat(lit("S"), col("l_suppkey").cast("string")).as("address"))
      val tuAgg = tu.groupBy("tx_id")
        .agg(array_join(sort_array(collect_set(col("address"))), ",").as("addrs"))
      val relevant = orders
        .join(tuAgg.select("tx_id"), col("o_orderkey") === col("tx_id"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // lag equivalence: the pruning removed whole CUSTOMERS only, so
      // every kept customer's order sequence — and with it every lag
      // value the output reads — is identical without it.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val prev = orders.select(col("o_orderkey"), col("o_custkey"))
        .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
        .select("o_orderkey", "prev_ok")
      relevant
        .join(tuAgg.select(col("tx_id").as("o_orderkey"),
          col("addrs").as("out_addrs")), Seq("o_orderkey"))
        .join(prev, Seq("o_orderkey"), "left")
        .join(tuAgg.select(col("tx_id").as("prev_ok"), col("addrs").as("in_addrs")),
          Seq("prev_ok"), "left")
        .filter(!(col("in_addrs") <=> col("out_addrs")))
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("in_addrs"), lit("")).as("in_addrs"),
          coalesce(col("out_addrs"), lit("")).as("out_addrs"))
        .orderBy("o_orderkey")
    }

    if (which == "q10np" || which == "all") {
      check("q10_no_cust_prune", q10Shipped, q10NoCustPrune)
      time("q10_shipped", q10Shipped)
      time("q10_no_cust_prune", q10NoCustPrune)
    }

    // ---- q23 variant ----------------------------------------------------
    def q23Shipped: DataFrame = ops.ExtendedQueries.q23.fn(spark, sfDir)

    /** The shipped gate + bloom sizing pay `co.count()` — a full
      * execution of the customer⋈orders join — before the main query
      * runs the same join again (and the bloom build scans it a third
      * time). Estimate |co| instead from two single-column pushed-filter
      * scan counts (segment-filtered customers / all customers ×
      * date-filtered orders): the estimate only sizes the bloom (false
      * positives just add pre-agg groups the exact join drops) and
      * drives the on/off gate — output is identical either way. */
    def q23Estimate: DataFrame = {
      import graft.io.Tables.table
      import graft.functions.Functions.{decMicros, microsDouble}
      CustomFunctions.register(spark)
      val cutoff = to_timestamp(lit("1995-03-15 00:00:00"))
      val c = table(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = table(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = table(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val co = c.join(o, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
      val nSegCust = table(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").count()
      val nCust = table(spark, sfDir, "customer").count()
      val nDateOrders = o.count()
      val nOrders = table(spark, sfDir, "orders").count()
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

    if (which == "q23" || which == "all") {
      check("q23_estimate", q23Shipped, q23Estimate)
      time("q23_shipped", q23Shipped)
      time("q23_estimate", q23Estimate)
    }
    if (which == "q10" || which == "all") {
      check("q10_fused", q10Shipped, q10Fused)
      time("q10_shipped", q10Shipped)
      time("q10_fused", q10Fused)
    }
    if (which == "d11" || which == "all") {
      check("d11_window", d11Shipped, d11Window)
      check("d11_one_exchange", d11Shipped, d11OneExchange)
      time("d11_shipped", d11Shipped)
      time("d11_window", d11Window)
      time("d11_one_exchange", d11OneExchange)
    }
    if (which == "t07" || which == "all") {
      check("t07_window", t07Shipped, t07Window)
      check("t07_one_exchange", t07Shipped, t07OneExchange)
      time("t07_shipped", t07Shipped)
      time("t07_window", t07Window)
      time("t07_one_exchange", t07OneExchange)
    }
    spark.stop()
  }
}
