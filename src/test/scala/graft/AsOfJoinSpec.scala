package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.ops.ExtendedQueries
import graft.plans.{AsOf, AsOfJoinExec}

/** The native as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * result equivalence against the window-idiom q21 and against the
  * driver's oracle semantics, plan shape (custom exec planned, one
  * shuffle per side), and the edge semantics a streaming merge can get
  * wrong (null keys, empty build side, ties, key runs with no match).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("q30 native as-of equals q21 window-idiom as-of row-for-row") {
    val viaExec = ExtendedQueries.q30.fn(spark, sf).collect()
    val viaWindow = ExtendedQueries.q21.fn(spark, sf).collect()
    assert(viaExec.length == viaWindow.length)
    viaExec.zip(viaWindow).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("plan uses AsOfJoinExec with exactly one shuffle per side") {
    val df = ExtendedQueries.q30.fn(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    // under AQE the adaptive node is a leaf — unwrap to the real plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }
    val execs = plan.collect { case e: AsOfJoinExec => e }
    assert(execs.length == 1, s"expected one AsOfJoinExec in:\n$plan")
    // the join adds exactly one exchange per side: each child is the
    // required (key, ts) sort sitting DIRECTLY on a shuffle (live
    // exchange, or its post-AQE query-stage/read forms) — nothing wide
    // in between
    execs.head.children.foreach { c =>
      assert(c.isInstanceOf[SortExec], s"expected per-side sort, got:\n$c")
      val below = c.children.head
      val isShuffle = below match {
        case _: ShuffleExchangeLike | _: ShuffleQueryStageExec | _: AQEShuffleReadExec => true
        case _ => false
      }
      assert(isShuffle,
        s"expected a shuffle directly under the per-side sort, got ${below.getClass.getSimpleName} in:\n$plan")
    }
  }

  test("merge semantics: ties inclusive, no-match keys null, null keys never match") {
    AsOf.ensureRegistered(spark)
    val probe = Seq(
      (Some("u1"), 1L, 10L), // before any build row -> null
      (Some("u1"), 2L, 20L), // tie with build ts=20 -> inclusive match
      (Some("u1"), 3L, 35L), // between 30 and 40 -> 30
      (Some("u2"), 4L, 99L), // key with no build rows -> null
      (None, 5L, 50L),       // null key -> null, never matches null build key
      (Some("u3"), 6L, 7L)   // key after u2 in sort order, match present
    ).toDF("k", "id", "ts")
    val build = Seq(
      (Some("u1"), 20L, 100L),
      (Some("u1"), 30L, 101L),
      (Some("u1"), 40L, 102L),
      (None, 1L, 103L),      // null build key: consumed, never matched
      (Some("u3"), 5L, 104L)
    ).toDF("bk", "bts", "payload")
    val got = AsOf.join(probe, build, Seq("k"), Seq("bk"), "ts", "bts")
      .select(col("id"), col("payload")).orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(100L), 3L -> Some(101L),
      4L -> None, 5L -> None, 6L -> Some(104L)))
  }

  test("empty build side leaves every probe unmatched") {
    val probe = Seq(("a", 1L, 5L)).toDF("k", "id", "ts")
    val build = Seq.empty[(String, Long, Long)].toDF("bk", "bts", "payload")
    val got = AsOf.join(probe, build, Seq("k"), Seq("bk"), "ts", "bts").collect()
    assert(got.length == 1 && got.head.isNullAt(3))
  }

  test("key type mismatch and missing columns are clear plan-time errors") {
    val probe = Seq(("a", 1L)).toDF("k", "ts")
    val build = Seq((1, 2L)).toDF("bk", "bts")
    val e1 = intercept[IllegalArgumentException](
      AsOf.join(probe, build, Seq("k"), Seq("bk"), "ts", "bts"))
    assert(e1.getMessage.contains("type mismatch"))
    val e2 = intercept[IllegalArgumentException](
      AsOf.join(probe, build, Seq("nope"), Seq("bk"), "ts", "bts"))
    assert(e2.getMessage.contains("no column"))
  }
}
