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

    if (which == "d11" || which == "all") {
      check("d11_window", d11Shipped, d11Window)
      check("d11_one_exchange", d11Shipped, d11OneExchange)
      time("d11_shipped", d11Shipped)
      time("d11_window", d11Window)
      time("d11_one_exchange", d11OneExchange)
    }
    if (which == "t07" || which == "all") {
      check("t07_window", t07Shipped, t07Window)
      time("t07_shipped", t07Shipped)
      time("t07_window", t07Window)
    }
    spark.stop()
  }
}
