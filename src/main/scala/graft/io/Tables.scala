package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer — the Spark realization of the reference's
  * scan/view surface (SURVEY.md §2.1):
  *
  *  - S1 glob scan        (`read_parquet('duckdb/&#42;/tx.parquet')`,
  *                         /root/reference/main.py:31)   → [[glob]]
  *  - S2 multi-file scan  (`read_parquet([f1,f2,…])`,
  *                         /root/reference/token_fee_analysis.py:78) → [[files]]
  *  - S3/S4 views         (`CREATE OR REPLACE VIEW {t}_view …`,
  *                         /root/reference/token_fee_analysis.py:73-81)
  *                         → [[registerViews]]
  *  - S7 CSV sink         (/root/reference/token_fee_analysis.py:346-350)
  *                         → [[writeCsv]]
  *
  * All reads go through the vectorized parquet reader; filters/projections
  * applied downstream are pushed into the scan by Catalyst — the manual
  * "pre-filtered temp view" optimization of the reference
  * (token_fee_analysis.py:142-151) is automatic here.
  */
object Tables {

  /** Names of the driver-generated testdata tables (TESTDATA.md). */
  val testTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table: `<sfDir>/<name>.parquet`.
    *
    * `events.ts` has shipped under two physical encodings: parquet
    * TIMESTAMP(NANOS), which Spark 4 can only read as a raw int64
    * (`nanosAsLong` — set here, at the read site, so any access path
    * works regardless of call order), and TIMESTAMP(MICROS), which
    * reads as a timestamp. Both are normalized HERE to one engine axis
    * — long nanoseconds-since-epoch — so every downstream consumer
    * (queries, as-of join keys, window buckets) sees a single type,
    * and the DuckDB oracle's `epoch_ns(ts)` mirrors it exactly under
    * either encoding. The µs→ns widening is a cheap codegen'd
    * multiply; sessions pin UTC so the NTZ reinterpretation is
    * instant-exact.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df
        case _ =>
          df.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
            df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
            * org.apache.spark.sql.functions.lit(1000L))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** CPU-dense scan fan-out. Parquet scan parallelism is capped by
    * row-group granularity: a single-row-group file is ONE task no
    * matter how many cores the cluster has, and the testdata tables are
    * written as one row group per file — so every operator between the
    * scan and its first exchange (tokenization, regex redaction,
    * hashing, media decode, per-vector arithmetic) would run
    * single-threaded. This helper rebalances such scans to the
    * session's full parallelism with one narrow-row round-robin
    * shuffle, and only when the input is too small for the scan to
    * reach full width on its own (bytes < parallelism ×
    * maxPartitionBytes): at 100 TB the condition is false, the call is
    * an identity, and no corpus-wide shuffle is ever added — the
    * production scan already yields thousands of splits.
    */
  def tableFan(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = table(spark, sfDir, name)
    val par = spark.sparkContext.defaultParallelism
    val bytes =
      try new java.io.File(s"$sfDir/$name.parquet").length()
      catch { case _: Throwable => Long.MaxValue }
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    // Lower bound: under a few compressed MB the whole table is one
    // task-cache-resident block and the rebalance's extra stage costs
    // more than the map work it parallelizes (measured at sf0.1:
    // +0.1-0.5 s per query for zero win). Between the bounds the input
    // is big enough for single-task decode+compute to dominate but too
    // small for the scan to split — exactly the regime the rebalance
    // exists for.
    val minFan = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.graft.fanout.minBytes", "4MB"))
    if (bytes >= minFan && bytes < par.toLong * maxSplit) df.repartition(par)
    else df
  }

  /** Keyed variant of [[tableFan]] for scans that feed a grouped
    * aggregation: fan by HASH of the group key instead of round-robin.
    * Round-robin repartition locally sorts every full row first
    * (spark.sql.execution.sortBeforeRepartition, kept on for
    * retry-determinism) — measured 2× slower than the aggregation it
    * was parallelizing; hash partitioning needs no such sort, and the
    * downstream groupBy on the same key reuses the partitioning, so the
    * fan's shuffle REPLACES the aggregation exchange instead of adding
    * one. Same byte gating as tableFan: at production scale the call is
    * an identity and the plan keeps ordinary map-side partial
    * aggregation over thousands of natural splits.
    */
  def tableFanBy(spark: SparkSession, sfDir: String, name: String,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val df = table(spark, sfDir, name)
    val par = spark.sparkContext.defaultParallelism
    val bytes =
      try new java.io.File(s"$sfDir/$name.parquet").length()
      catch { case _: Throwable => Long.MaxValue }
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val minFan = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.graft.fanout.minBytes", "4MB"))
    if (bytes >= minFan && bytes < par.toLong * maxSplit)
      df.repartition(par, keys: _*)
    else df
  }

  /** S1 — glob scan across partition directories (Spark globs natively). */
  def glob(spark: SparkSession, pattern: String): DataFrame =
    spark.read.parquet(pattern)

  /** S2 — explicit multi-file list scan. */
  def files(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** S3 — register `<name>_view` temp views for every testdata table,
    * the query-time table abstraction of the reference.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    testTables.foreach { t =>
      table(spark, sfDir, t).createOrReplaceTempView(s"${t}_view")
    }

  /** S7 — CSV export of a (small, final) result. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Bucketed table write — the co-located-join layout for 100 TB fact
    * tables: both sides of a recurring equi join written with
    * `bucketBy(n, key)` hash-place their rows identically, so the join
    * plans with ZERO Exchange on either side (the shuffle is paid once
    * at write time, amortized over every subsequent join/aggregation on
    * the key). Registered in the session catalog with an explicit path;
    * `BucketedJoinSpec` asserts the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, path: String, tableName: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Clustered (range-sorted) table write — the data-SKIPPING layout
    * for selective scans at 100 TB: `repartitionByRange` gives every
    * output file a disjoint key range and the within-partition sort
    * tightens per-row-group min/max stats, so a pushed predicate on the
    * cluster key lets the parquet reader skip whole row groups (and
    * effectively whole files) without decoding them. The complement of
    * [[writeBucketed]]: bucketing kills the JOIN shuffle, clustering
    * kills the selective-SCAN read cost; both pay one shuffle at write
    * time. `ClusteredWriteSpec` pins the effect by comparing the scan
    * operator's output-row metric (rows actually decoded) against an
    * unclustered copy of the same data.
    */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)
}
