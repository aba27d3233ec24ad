package graft

import org.apache.spark.sql.functions._

import graft.functions.TopCells
import graft.ops.{ExtendedQueries, VectorQueries}

/** Round-10 pins: q31's unhinted broadcast degrades instead of OOMing,
  * and the s07 hier-regime IVF query matches an independent plain-Scala
  * recomputation of the two-level routing + probe at a cell count at or
  * above TopCells.hierMin (the regime no driver-gate SF reaches through
  * s03's grown index).
  */
class Round10Spec extends SparkSpec {

  test("q31 output is broadcast-independent and degrades to shuffled joins") {
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    val normal = canon(ExtendedQueries.q31.fn(spark, sf).collect())
    assert(normal.nonEmpty)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // With broadcast disabled entirely, a static broadcast() hint
      // would still force a driver-side build — the oversized-relation
      // OOM d09 had in round 8. No hint → AQE degrades the
      // bucket-expanded window side to a shuffled join, output
      // unchanged.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = ExtendedQueries.q31.fn(spark, sf)
      assert(canon(df.collect()) === normal)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastExchange"),
        s"q31 degrade plan still broadcasts:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q41 gap-fills each series' own extent, not the global span") {
    // per-user extent: output rows = Σ_user (h1_u − h0_u + 1) — LINEAR
    // in the corpus; the global-span form (users × corpus history) is
    // quadratic once history grows with the corpus (the sf10 octave
    // catch this round: output ×10,000 for ×100 data, write never
    // finished)
    import spark.implicits._
    val out = ExtendedQueries.q41.fn(spark, sf)
      .select("user_id", "hour", "filled").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = out.groupBy(_._1)
    val hourNs = 60L * 60L * 1000000000L
    val obs = graft.io.Tables.table(spark, sf, "events")
      .select(col("user_id"),
        graft.functions.Functions.tsUs(col("ts")).as("ts_ns"))
      .select(col("user_id"), expr(s"ts_ns div $hourNs").as("hour"))
      .groupBy("user_id").agg(min("hour").as("h0"), max("hour").as("h1"),
        countDistinct("hour").as("nObs"))
      .as[(Long, Long, Long, Long)].collect()
    assert(obs.nonEmpty)
    obs.foreach { case (u, h0, h1, nObs) =>
      val rows = byUser(u).sortBy(_._2)
      // exact per-user extent, dense, no global extension
      assert(rows.head._2 === h0 && rows.last._2 === h1)
      assert(rows.length === (h1 - h0 + 1))
      // every non-observation hour is marked filled
      assert(rows.count(_._3 == 0L) <= nObs)
    }
    assert(out.length === obs.map { case (_, h0, h1, _) => h1 - h0 + 1 }.sum)
  }

  // -- s07: independent recomputation of the full hier-regime pipeline --

  /** Strict ascending left fold, the ArrayDot contract. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Two-level routing rule (TopCells.Hier semantics): rank groups by
    * (coarse dot, groupId) descending, visit min(max(2,k), groups)
    * groups, pick top-k member cells by (dot, cellId) descending.
    */
  private def route(v: Array[Double], cs: Array[Array[Double]],
      h: TopCells.Hier, k: Int): Seq[Int] = {
    val dim = cs(0).length
    val groups = (0 until h.numGroups).map { gi =>
      val mu = Array.tabulate(dim)(d => h.coarseFlat(gi * dim + d))
      (dot(v, mu), gi)
    }.sortBy { case (d, gi) => (-d, -gi) }
    val probeGroups = groups.take(math.min(math.max(2, k), h.numGroups)).map(_._2)
    val members = probeGroups.flatMap(gi =>
      (h.groupStart(gi) until h.groupStart(gi + 1)).map(h.memberIds))
    members.map(c => (dot(v, cs(c)), c)).sortBy { case (d, c) => (-d, -c) }
      .take(k).map(_._2)
  }

  test("s07 equals the plain-Scala two-level model at >= hierMin cells") {
    val cs = VectorQueries.trainedHierCentroids(spark, sf)
    assert(cs.length >= TopCells.hierMin,
      s"s07 index has ${cs.length} cells — not in the hier regime")
    val h = TopCells.buildHier(cs)
    assert(h.numGroups >= 2, "degenerate index: two-level routing inactive")

    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val nrm = e.map { case (_, v) => math.sqrt(dot(v, v)) }.toArray
    val cell = e.map { case (_, v) => route(v, cs, h, 1).head }

    val expected = e.zipWithIndex.filter(_._1._1 < 10).flatMap { case ((qid, qv), qi) =>
      val probes = route(qv, cs, h, 2).toSet
      val cands = e.indices.filter(t =>
        e(t)._1 != qid && probes.contains(cell(t)))
      cands.map { t =>
        (qid, e(t)._1, dot(qv, e(t)._2) / (nrm(qi) * nrm(t)))
      }.sortBy { case (_, id, cos) => (-cos, id) }
        .take(3).zipWithIndex
        .map { case ((q, id, cos), i) => (q, (i + 1).toLong, id, cos) }
    }.toSeq

    val got = VectorQueries.s07.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("ngrams_distinct generator ≡ the composed distinct-trigram form") {
    // wordTrigrams' old body — the O(W²)-under-CollapseProject
    // composition the generator replaces (see NGramDistinctExplode
    // scaladoc); must emit the IDENTICAL (doc_id, sz, g) rows,
    // including first-occurrence order within a doc and nothing for
    // docs under 3 words.
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b c"), // dup trigram "a b c" → distinct keeps first
      (2L, "x y"),           // < 3 words → no rows
      (3L, "s s s s"),       // all-identical tokens → one distinct trigram
      (4L, "one two three")  // exactly one window
    ).toDF("doc_id", "text")
    val w = split(col("text"), " ")
    val composed = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ",
            element_at(col("w"), i + 1),
            element_at(col("w"), i + 2),
            element_at(col("w"), i + 3)))).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("g"))
      .collect().map(_.toSeq).toSeq
    val viaGen = graft.ops.DedupQueries.wordTrigrams(docs)
      .collect().map(_.toSeq).toSeq
    assert(viaGen === composed)
    // and on real corpus data, same multiset + same per-doc sz
    val real = graft.io.Tables.table(spark, sf, "documents").limit(200)
    val a = graft.ops.DedupQueries.wordTrigrams(real)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = real
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ",
            element_at(col("w"), i + 1),
            element_at(col("w"), i + 2),
            element_at(col("w"), i + 3)))).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("g"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.nonEmpty && a === b)
  }

  test("q10 pre-aggregated form ≡ shipped union-groupBy form (both SFs)") {
    // the round-10 A/B lever: tuAgg computed once, in_addrs a lookup of
    // the single previous order — must be row-identical to the shipped
    // form (graft.Q10Profile measures the wall-clock at sf1/sf10)
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val li = graft.io.Tables.table(spark, dir, "lineitem")
      val orders = graft.io.Tables.table(spark, dir, "orders")
      val a = graft.ops.CoreQueries.transferPipelineOn(li, orders)
        .collect().map(_.toString).sorted.toSeq
      val b = graft.ops.CoreQueries.transferPipelinePreAgg(li, orders)
        .collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a === b, s"diverged at $dir")
    }
  }
}
