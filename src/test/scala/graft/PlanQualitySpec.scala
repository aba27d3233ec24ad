package graft

import graft.ops.{CoreQueries, ExtendedQueries}

/** Pins PLAN quality, not just results: scan pushdown, broadcast
  * choices, and the absence of accidental cartesian products are the
  * properties that keep these queries alive at 100 TB, and nothing but
  * a test stops a refactor from silently regressing them.
  */
class PlanQualitySpec extends SparkSpec {

  private val planCache = scala.collection.mutable.Map.empty[String, String]

  private def executedPlan(name: String): String =
    planCache.getOrElseUpdate(name, {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // AQE: the final plan only exists after execution
      df.queryExecution.executedPlan.toString
    })

  test("no query plans a cartesian product; nested-loop joins only where intended") {
    // s01 broadcasts a bounded query batch against the corpus and d04
    // carries its broadcast brute-force self-check column — the only
    // sanctioned nested-loop shapes
    val allowedNestedLoop = Set("s01_ann_brute_topk", "d04_dedup_simhash",
      "s04_ann_pq_adc", // ADC scan: broadcast bounded query batch, like s01
      "s05_mmr_diversify", // pool stage reuses s01's broadcast shortlist shape
      "p10_embed_decontaminate", // broadcast bounded benchmark batch, s01 shape
      "q41_gapfill", // grid = users × broadcast 1-row (minHour, maxHour) bounds
      "t11_keywords_tfidf") // scalar N = broadcast 1-row cross join
    SparkEntry.queries.keys.foreach { name =>
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!allowedNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended nested-loop join")
    }
  }

  test("filters reach the parquet scan (PushedFilters) on filter-shaped queries") {
    Seq("q01_topk_filter", "q04_binary_unhex_filter", "q05_range_filter",
      "q06_semi_join", "q23_top_revenue").foreach { name =>
      val plan = executedPlan(name)
      assert(plan.contains("PushedFilters: ["), s"$name: no pushdown section")
      assert(!plan.contains("PushedFilters: []"),
        s"$name: empty pushed filters — predicate not reaching the scan")
    }
  }

  test("small dimension sides broadcast on the reporting joins") {
    Seq("q06_semi_join", "q23_top_revenue", CoreQueries.q10.name).foreach { name =>
      assert(executedPlan(name).contains("BroadcastHashJoin"),
        s"$name: expected a broadcast hash join")
    }
  }

  test("global top-k plans TakeOrderedAndProject, grouped top-k plans partial aggregation") {
    assert(executedPlan("q01_topk_filter").contains("TakeOrderedAndProject"))
    // TopKAgg must partial-aggregate (map-side combine before the
    // shuffle): the plan carries two ObjectHashAggregate phases
    val q26 = executedPlan(ExtendedQueries.q26.name)
    assert(q26.contains("ObjectHashAggregate"), "q26: TopKAgg not object-agg planned")
    assert("ObjectHashAggregate".r.findAllIn(q26).length >= 2,
      "q26: no partial aggregation phase before the shuffle")
    // p08's source cap runs on the same aggregate and must keep the
    // map-side phase — the property that bounds its shuffle to K·sources
    val p08 = executedPlan("p08_source_cap")
    assert("ObjectHashAggregate".r.findAllIn(p08).length >= 2,
      "p08: TopKAgg lost its partial aggregation phase")
    // t10's corpus top-20 must be an ordered take, not a global sort
    assert(executedPlan("t10_bigram_colloc").contains("TakeOrderedAndProject"),
      "t10: top-20 planned as a full sort")
  }

  test("q39 funnel: all three chained windows and the aggregate share one hash exchange") {
    // count only the executed section — adaptive plans append an
    // "== Initial Plan ==" echo that would double-count operators
    val plan = executedPlan("q39_funnel").split("== Initial Plan ==")(0)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"q39: expected exactly 1 hash exchange (shared user_id partitioning), got $hashExchanges")
  }
}
