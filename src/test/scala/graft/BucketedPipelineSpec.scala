package graft

import graft.io.Tables
import graft.ops.CoreQueries

/** Pins the q10 storage-layout A/B (graft.BucketedBench): running the
  * SAME transferPipelineOn body over orderkey-bucketed orders/lineitem
  * must (a) produce the identical relation and (b) plan with strictly
  * fewer hash-partitioning Exchanges than the plain-parquet layout —
  * the write-once shuffle amortization a recurring 100 TB pipeline run
  * would rely on. Broadcast is disabled for the probe so the elision is
  * attributable to the layout, not to AQE happening to broadcast the
  * small sides at this sf.
  */
class BucketedPipelineSpec extends SparkSpec {

  test("bucketed q10 is hash-identical and elides exchanges") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucket-q10").toString
    Tables.writeBucketed(Tables.table(spark, sf, "orders"),
      s"$base/orders_q10b", "orders_q10b", "o_orderkey", 4)
    Tables.writeBucketed(Tables.table(spark, sf, "lineitem"),
      s"$base/lineitem_q10b", "lineitem_q10b", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = CoreQueries.transferPipeline(spark, sf)
      val bucketed = CoreQueries.transferPipelineOn(
        spark.table("lineitem_q10b"), spark.table("orders_q10b"))

      val a = plain.collect().map(_.toString).toSeq
      val b = bucketed.collect().map(_.toString).toSeq
      assert(a.nonEmpty && a === b)

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val (ep, eb) = (exchanges(plain), exchanges(bucketed))
      assert(eb < ep, s"bucketed layout should elide exchanges: plain=$ep bucketed=$eb")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_q10b")
      spark.sql("DROP TABLE IF EXISTS lineitem_q10b")
    }
  }
}
