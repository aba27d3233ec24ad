package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.CoreQueries

/** q10 stage decomposition + union-groupBy vs pre-aggregated A/B — the
  * round-10 probe VERDICT asked for (the one unmeasured lever was
  * "pre-aggregate the input-address explode before the final join").
  *
  * Stage table: each stage is materialized cumulatively to the noop
  * sink (later stages re-execute earlier ones — the reported increment
  * is the stage's marginal cost in a cold plan, the number a stage-level
  * optimizer would see). Stages mirror the scaladoc pipeline: tu scan →
  * relevance semi join → lag window → outpoint-resolution join → union
  * group-by → final join+sort.
  *
  * A/B protocol mirrors [[BucketedBench]]: in-run hash equality first,
  * then interleaved best-of-N on the noop sink after an untimed warmup
  * pass. One JSON line to stdout after spark.stop().
  */
object Q10Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_PASSES").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfName = new java.io.File(sfDir).getName

    def li = Tables.table(spark, sfDir, "lineitem")
    def orders = Tables.table(spark, sfDir, "orders")

    def save(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- stage decomposition (cumulative prefixes of the shipped form)
    val tu = li
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45d)
      .select(col("l_orderkey").as("tx_id"),
        col("l_linenumber").as("output_index"),
        concat(lit("S"), col("l_suppkey").cast("string")).as("address"))
    val relevant = orders
      .join(tu.select("tx_id").distinct(),
        col("o_orderkey") === col("tx_id"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val relevantCust = relevant.select("o_custkey").distinct()
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val prev = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(relevantCust, Seq("o_custkey"), "left_semi")
      .withColumn("prev_ok", lag(col("o_orderkey"), 1).over(w))
      .select("o_orderkey", "prev_ok")
    val inRows = prev
      .join(relevant.select("o_orderkey"), Seq("o_orderkey"), "left_semi")
      .join(tu, tu("tx_id") === col("prev_ok"))
      .select(col("o_orderkey"), col("address"), lit(true).as("is_in"))
    val outRows = tu.select(col("tx_id").as("o_orderkey"), col("address"),
      lit(false).as("is_in"))
    val addrs = inRows.union(outRows)
      .groupBy("o_orderkey")
      .agg(
        array_join(sort_array(collect_set(when(col("is_in"), col("address")))), ",")
          .as("in_addrs"),
        array_join(sort_array(collect_set(when(!col("is_in"), col("address")))), ",")
          .as("out_addrs"))
    val full = CoreQueries.transferPipelineOn(li, orders)

    val stages: Seq[(String, DataFrame)] = Seq(
      "1_tu_scan" -> tu, "2_relevant_semi" -> relevant,
      "3_prev_window" -> prev, "4_resolve_join" -> inRows,
      "5_union_groupby" -> addrs, "6_final" -> full)
    stages.foreach { case (_, df) => save(df) } // warm
    val stageBest = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to math.max(2, passes - 2)).foreach { _ =>
      stages.foreach { case (name, df) =>
        val t = time(save(df))
        if (!stageBest.contains(name) || t < stageBest(name)) stageBest(name) = t
      }
    }

    // ---- A/B: shipped union-groupBy form vs pre-aggregated form
    def current(): DataFrame = CoreQueries.transferPipelineOn(li, orders)
    def preAgg(): DataFrame = CoreQueries.transferPipelinePreAgg(li, orders)
    val a = current().collect().map(_.toString).sorted
    val b = preAgg().collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"preAgg diverged: current ${a.length} rows, preAgg ${b.length}")

    val variants = Seq("current" -> (() => current()), "preagg" -> (() => preAgg()))
    variants.foreach { case (_, f) => save(f()) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to passes).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t = time(save(f()))
        if (!best.contains(name) || t < best(name)) best(name) = t
      }
    }
    spark.stop()
    val stageJson = stageBest.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"q10_profile","stages":$stageJson,"current":${best("current")}%.3f,"preagg":${best("preagg")}%.3f,"rows":${a.length},"sf":"$sfName"}""")
  }
}
