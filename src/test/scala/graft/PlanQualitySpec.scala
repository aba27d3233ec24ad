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
      "t11_keywords_tfidf", // scalar N = broadcast 1-row cross join
      // round 11: the COUNT(DISTINCT) split runs as its own aggregate
      // over the pruned doc_id scan, recombined with the flag aggregate
      // by a 1-row × 1-row cross — both sides scalar by construction
      "p09_data_quality")
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

  test("static broadcast hints only on bounded-by-construction relations") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    // The round-9/10 lesson (d09, then q31/d02/d13/q06/q23/q33 and the
    // TokenAnalytics surface): a static broadcast() hint on a
    // DATA-DEPENDENT relation removes AQE's option to degrade to a
    // shuffled join when the relation outgrows the driver — the 100 TB
    // OOM mode. Hints are sanctioned only where the relation is bounded
    // BY CONSTRUCTION (a fixed query batch, a held-out benchmark set, a
    // |sources|- or 1-row-scalar relation, a capped sample), each
    // documented at its site.
    val allowedBroadcastHints = Set(
      "s01_ann_brute_topk",   // 10-query batch (numQueries constant)
      "s02_ann_lsh_bucketed", // same bounded query batch
      "s03_ann_ivf_probed",   // query batch × 2 probe cells
      "s07_ann_ivf_hier",     // same shape as s03
      "s04_ann_pq_adc",       // query batch; shortlist = topK×10 per query
      "s05_mmr_diversify",    // shortlist pool, mmrPool rows per query
      // p06 was REMOVED from this list in round 11: its "held-out set"
      // is the md5 split of the corpus itself — linear in the corpus,
      // not bounded; the sf30 octave measured the broadcast going
      // super-linear (5.12× for 3× data). shuffle_hash now.
      "p10_embed_decontaminate", // held-out benchmark embedding set (numBench=20 rows)
      "p07_domain_mixture",   // |sources|-row quota relation
      "p12_temperature_mixture", // same quota shape
      "t11_keywords_tfidf",   // 1-row scalar N
      "d04_dedup_simhash",    // 8192-doc capped brute-force witness
      "q24_group_quantiles")  // G·P-row rank locator
    SparkEntry.queries.keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val hinted = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      if (!allowedBroadcastHints(name))
        assert(hinted.isEmpty,
          s"$name carries a static broadcast hint on a data-dependent relation")
    }
  }

  test("p06's decontamination join is shuffled-hash, build = test-shingle side") {
    // Round-11 ADVICE: the broadcast-hint removal was pinned (allowlist
    // above) but the REPLACEMENT shape wasn't — a refactor dropping the
    // shuffle_hash hint would let the planner fall back to sort-merge,
    // silently reintroducing a sort of the corpus-sized probe side.
    // Pin the physical join on the shingle key: ShuffledHashJoin with
    // the test-shingle (right) side as build. Other p06 joins (the
    // doc_id split join, the final left join) are free to pick their
    // own shapes, so the assertion is scoped to the [g#…] key.
    val plan = executedPlan("p06_decontaminate").split("== Initial Plan ==")(0)
    val gramJoin = plan.linesIterator
      .filter(l => l.contains("ShuffledHashJoin") && l.contains("[g#")).toSeq
    assert(gramJoin.nonEmpty,
      s"p06: shingle join not planned as ShuffledHashJoin:\n$plan")
    assert(gramJoin.exists(_.contains("BuildRight")),
      "p06: build side moved off the test-shingle (right) side")
    val smjGram = plan.linesIterator
      .filter(l => l.contains("SortMergeJoin") && l.contains("[g#")).toSeq
    assert(smjGram.isEmpty,
      "p06: shingle join degraded to sort-merge — probe side gets sorted")
  }

  test("s03/s07 cell routing stays inside whole-stage codegen") {
    // TopCells' fallback regression mode: if the expression (either
    // regime — s03 runs flat, s07 runs the two-level path) drops to
    // CodegenFallback, the per-row routing projection leaves
    // whole-stage codegen — the measured 2.3× s03 regression the custom
    // expression exists to prevent. Codegen'd operators print with a
    // "*(n)" stage prefix; interpreted ones don't.
    Seq("s03_ann_ivf_probed", "s07_ann_ivf_hier").foreach { name =>
      val plan = executedPlan(name).split("== Initial Plan ==")(0)
      // FileScan lines echo the expression inside DataFilters — only
      // OPERATOR lines (Project/Filter/Generate) execute it per row
      val routingLines = plan.linesIterator
        .filter(l => l.contains("top_cells") && !l.contains("FileScan")).toSeq
      assert(routingLines.nonEmpty, s"$name: no top_cells stage in plan:\n$plan")
      routingLines.foreach { l =>
        assert(l.contains("*("),
          s"$name: top_cells outside whole-stage codegen: $l")
      }
    }
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
