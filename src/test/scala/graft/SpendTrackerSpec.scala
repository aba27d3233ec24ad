package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{SessionEvent, SpendTracker}

/** transformWithState (Spark 4 arbitrary-state API): running per-user
  * totals accumulate across micro-batches in the RocksDB state store,
  * and each batch emits the updated totals for the touched keys only.
  */
class SpendTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, t: Long, ty: String) =
    SessionEvent(u, new Timestamp(t), ty)

  test("running totals accumulate across micro-batches under TTL'd state") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope it to this query and restore the session default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[SessionEvent]
      val q = SpendTracker.track(source.toDS())
        .writeStream.format("memory").queryName("spend")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(250))
        .start()
      // the processing-time TTL keeps the query triggering (empty
      // maintenance batches), so processAllAvailable never quiesces —
      // poll the sink for the expected rows instead
      def rows(): Set[(Long, Long, Long)] =
        spark.table("spend").as[(Long, Long, Long)].collect().toSet
      def awaitSink(pred: Set[(Long, Long, Long)] => Boolean): Unit = {
        val t0 = System.currentTimeMillis()
        while (!pred(rows()) && System.currentTimeMillis() - t0 < 90000)
          Thread.sleep(200)
        assert(pred(rows()), s"sink never reached expectation; got ${rows()}")
      }
      try {
        // batch 1: user 1 browses twice and buys once; user 2 browses
        source.addData(ev(1, 1000, "view"), ev(1, 2000, "purchase"), ev(1, 3000, "view"),
          ev(2, 1500, "view"))
        awaitSink(r => r.contains((1L, 3L, 1L)) && r.contains((2L, 1L, 0L)))

        // batch 2: only user 1 returns — state carries the old totals
        // forward and only user 1 re-emits
        source.addData(ev(1, 4000, "purchase"))
        awaitSink(_.contains((1L, 4L, 2L)))
        // user 2 was not re-emitted in batch 2 (update mode, untouched key)
        assert(rows().count(_._1 == 2L) === 1)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
