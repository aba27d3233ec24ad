package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Pins the bucketed co-located join: two tables written with the same
  * bucketing on the join key must join with NO shuffle exchange on
  * either side — the write-once-join-many layout for recurring fact
  * joins at scale.
  */
class BucketedJoinSpec extends SparkSpec {

  test("equi join of two same-bucketed tables plans with zero Exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    Tables.writeBucketed(orders, s"$base/orders_b", "orders_b", "o_orderkey", 4)
    Tables.writeBucketed(lineitem, s"$base/lineitem_b", "lineitem_b", "l_orderkey", 4)
    // force the sort-merge path: at this sf the optimizer would broadcast
    // the small side, which also avoids shuffles and would make the
    // assertion vacuous
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // same join over the plain parquet DOES shuffle — the layout, not
      // the optimizer, is what removed the exchanges
      val unbucketed = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))

      // and the bucketed result is the same relation
      val a = joined.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = unbucketed.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
