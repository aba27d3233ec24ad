package graft

import org.apache.spark.sql.functions._

import graft.functions.CustomFunctions
import graft.io.Tables.table
import graft.ops.ExtendedQueries

/** Bloom-filter semi-join reduction (q32): the probe never drops a true
  * match (no false negatives), it actually prunes, and the final result
  * is identical to the plain exact semi join.
  */
class BloomSemiJoinSpec extends SparkSpec {

  private def bloomFor(keysDir: String): Array[Byte] = {
    CustomFunctions.register(spark)
    table(spark, keysDir, "orders")
      .filter(col("o_totalprice") > ExtendedQueries.bloomPriceMin)
      .agg(call_function("bloom_agg", xxhash64(col("o_orderkey")), lit(100000L)))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("bloom probe has no false negatives and prunes the fact side") {
    val bloom = bloomFor(sf)
    val keys = table(spark, sf, "orders")
      .filter(col("o_totalprice") > ExtendedQueries.bloomPriceMin)
      .select("o_orderkey")
    val li = table(spark, sf, "lineitem")
    val prunedIds = li.filter(call_function("bloom_might_contain",
        lit(bloom), xxhash64(col("l_orderkey"))))
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val trueIds = li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    assert(trueIds.subsetOf(prunedIds), "bloom dropped a true match")
    val total = li.count()
    assert(prunedIds.size < total,
      s"bloom pruned nothing (${prunedIds.size} of $total rows survive)")
  }

  test("q32 equals the plain exact semi join (bloom is pruning-only)") {
    import graft.functions.Functions.dec
    val keys = table(spark, sf, "orders")
      .filter(col("o_totalprice") > ExtendedQueries.bloomPriceMin)
      .select("o_orderkey")
    val expect = table(spark, sf, "lineitem")
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().toSeq
    val got = ExtendedQueries.q33.fn(spark, sf).collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // The round-11 repayment gate: both forced paths produce the same
    // rows (the bloom is pruning-only), the BLOOM path's plan carries
    // the probe on the selective fixture, and the gated-off path's
    // doesn't (locally the bloom is pure overhead — measured at sf10).
    val viaBloom = ExtendedQueries.q33Pipeline(spark, sf,
      forceBloom = Some(true))
    val noBloom = ExtendedQueries.q33Pipeline(spark, sf,
      forceBloom = Some(false))
    assert(viaBloom.collect().toSeq == expect)
    assert(noBloom.collect().toSeq == expect)
    assert(viaBloom.queryExecution.executedPlan.toString
      .contains("might_contain"), "bloom path lost its probe")
    assert(!noBloom.queryExecution.executedPlan.toString
      .contains("might_contain"), "gated-off path still probes")
    // on a local master the gate itself picks the no-bloom plan
    assert(spark.sparkContext.isLocal)
    assert(!ExtendedQueries.q33.fn(spark, sf).queryExecution.executedPlan
      .toString.contains("might_contain"),
      "gate failed to skip the bloom on a local master")
  }
}
