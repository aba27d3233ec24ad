package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CustomFunctions
import graft.io.Tables
import graft.ops.ExtendedQueries

/** q33 bloom-sizing probe — the sf10 pair surfaced q33 as 12× behind
  * DuckDB (5.0 vs 0.4 s), and the suspect is the bloom's CONSTANT
  * `expectedNumItems = 100000`: the key relation is the price-filtered
  * order set, which grows with SF, so past 100k keys the bloom's fpp
  * degrades toward all-pass and the "pruned" fact side floods the semi
  * join with false positives — silently, since the exact join keeps the
  * output correct. At 100 TB a constant-sized bloom is a scale defect.
  *
  * Variants (outputs asserted equal in-run):
  *   shipped  — constant 100k bloom (the round-5 form)
  *   sized    — expectedNumItems = the measured key count (one extra
  *              count job over the pushed-filter orders scan)
  *   nobloom  — plain exact semi join, no bloom (control: is the bloom
  *              earning its scan-side probe cost at all locally?)
  * Prints key count + per-variant best-of-N one-line JSON.
  */
object Q33Profile {
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
    CustomFunctions.register(spark)
    val sfName = new java.io.File(sfDir).getName

    def orders = Tables.table(spark, sfDir, "orders")
    def li = Tables.table(spark, sfDir, "lineitem")
    def keys = orders
      .filter(col("o_totalprice") > ExtendedQueries.bloomPriceMin)
      .select("o_orderkey")

    def bloomOf(expected: Long): Array[Byte] = keys
      .agg(call_function("bloom_agg", xxhash64(col("o_orderkey")), lit(expected)))
      .collect()(0).getAs[Array[Byte]](0)

    def aggTail(df: DataFrame): DataFrame = {
      import graft.functions.Functions.{decMicros, microsDouble}
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          microsDouble(sum(decMicros(col("l_quantity")))).as("sum_qty"))
        .orderBy("l_returnflag")
    }

    val nKeys = keys.count()
    // the pre-round-10 constant-sized form (kept explicit so the A/B
    // stays meaningful now that q33.fn ships the sized bloom)
    def shipped(): DataFrame = {
      val b = bloomOf(100000L)
      aggTail(li.filter(call_function("bloom_might_contain",
          lit(b), xxhash64(col("l_orderkey"))))
        .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi"))
    }
    def sized(): DataFrame = ExtendedQueries.q33.fn(spark, sfDir)
    def nobloom(): DataFrame =
      aggTail(li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi"))

    // bloom survivor counts: how much does each bloom actually prune?
    val total = li.count()
    val survShipped = li.filter(call_function("bloom_might_contain",
      lit(bloomOf(100000L)), xxhash64(col("l_orderkey")))).count()
    val survSized = li.filter(call_function("bloom_might_contain",
      lit(bloomOf(math.max(nKeys, 4096L))), xxhash64(col("l_orderkey")))).count()

    val variants = Seq("constant" -> (() => shipped()),
      "sized" -> (() => sized()), "nobloom" -> (() => nobloom()))
    val ref = variants.head._2().collect().map(_.toString).sorted.toSeq
    variants.tail.foreach { case (name, f) =>
      val got = f().collect().map(_.toString).sorted.toSeq
      require(got == ref, s"$name diverged from shipped")
    }
    def save(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (_, f) => save(f()) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to passes).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t = time(save(f()))
        if (!best.contains(name) || t < best(name)) best(name) = t
      }
    }
    spark.stop()
    println(f"""{"metric":"q33_profile","n_keys":$nKeys,"li_rows":$total,"surv_constant":$survShipped,"surv_sized":$survSized,"constant":${best("constant")}%.3f,"sized":${best("sized")}%.3f,"nobloom":${best("nobloom")}%.3f,"sf":"$sfName"}""")
  }
}
