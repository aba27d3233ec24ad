package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slot-group-partitioned storage layout — the Spark realization of the
  * reference's `slot_<lo>_<hi>/` directory scheme
  * (/root/reference/ogmios_parquet.py:212-215, 200k slots per group ≈
  * 55 h of chain, config.py:25-26).
  *
  * We use Hive-style `slot_group=<lo>/` partitions so that Catalyst
  * prunes partitions automatically from any `slot` range predicate
  * rewritten onto `slot_group` (SURVEY.md §4) — no custom pruning rule,
  * and at 100 TB a slot-bounded query touches only its ~55 h of files.
  *
  * Compression: the reference merges to brotli level 4 (:523-571).
  * Stock Spark ships no brotli codec, so we write zstd — comparable
  * ratio, faster decode, and the two-phase write-then-compact dance is
  * unnecessary because the distributed write is already final.
  *
  * Brotli parity — FINAL decision (round 12): rejected. Probed
  * empirically: `option("compression", "brotli")` throws
  * `BadConfigurationException` — parquet-java 1.16 delegates BROTLI to
  * a Hadoop `BrotliCodec` that no jar on the Spark 4.1.2 classpath
  * provides (aircompressor 2.0.3 covers lz4/lzo/snappy/zstd only; the
  * public `brotli-codec` wrapper bundles per-platform native libs and
  * is not shippable under this project's no-new-dependencies
  * constraint). Cost of the divergence is nil for interop: DuckDB —
  * the reference's own query engine — reads zstd parquet natively, so
  * every reference workflow consumes these files unchanged; only
  * byte-level file identity with a reference-produced archive is
  * unattainable, and that was never stable anyway (row-group sizing
  * and writer metadata already differ).
  */
object CardanoWriter {

  val SlotGroupSize: Long = 200000L

  /** Write one Cardano table partitioned by slot group. */
  def write(df: DataFrame, baseDir: String, table: String,
      mode: String = "overwrite"): Unit =
    df
      .withColumn("slot_group", (col("slot") / SlotGroupSize).cast("long") * SlotGroupSize)
      .repartition(col("slot_group")) // one writer wave per group, no tiny files
      .write
      .mode(mode)
      .option("compression", "zstd")
      .partitionBy("slot_group")
      .parquet(s"$baseDir/$table")

  /** Rollback/reorg remedy (the reference ignores rollbacks,
    * ogmios_parquet.py:813-814): re-extract the affected slot range and
    * overwrite ONLY the slot-group partitions present in `df`, leaving
    * every other partition untouched — Spark's dynamic partition
    * overwrite makes re-ingestion idempotent per slot group.
    */
  def overwriteSlotGroups(df: DataFrame, baseDir: String, table: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df
        .withColumn("slot_group", (col("slot") / SlotGroupSize).cast("long") * SlotGroupSize)
        .repartition(col("slot_group"))
        .write
        .mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("slot_group")
        .parquet(s"$baseDir/$table")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Chain rollback: truncate a table to `slot <= rollbackSlot` — the
    * storage-side half of handling a chain-sync RollBackward message
    * (which the reference acknowledges and ignores,
    * ogmios_parquet.py:813-814). Slot-group layout makes this cheap and
    * local: partitions strictly above the boundary group are deleted
    * whole (pure directory removal, no data read), and only the single
    * boundary group is rewritten (read → filter → swap in). Re-ingesting
    * the replacement chain afterwards is an ordinary append; replaying
    * the same rollback is a no-op — idempotent per slot group.
    */
  def rollbackTo(spark: SparkSession, baseDir: String, table: String,
      rollbackSlot: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$baseDir/$table")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val boundary = Math.floorDiv(rollbackSlot, SlotGroupSize) * SlotGroupSize
    val groups = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("slot_group="))
          n.stripPrefix("slot_group=").toLongOption.map(_ -> p)
        else None
      }
    // everything strictly above the boundary group rolls back entirely
    groups.filter(_._1 > boundary).foreach { case (_, p) => fs.delete(p, true) }
    // the boundary group keeps only rows at or before the rollback point
    groups.find(_._1 == boundary).foreach { case (_, p) =>
      val keep = spark.read.parquet(p.toString).filter(col("slot") <= rollbackSlot)
      if (keep.isEmpty) fs.delete(p, true)
      else {
        // can't overwrite a path being lazily read — write aside, swap
        val tmp = new Path(root, s".rollback_tmp_$boundary")
        keep.write.mode("overwrite").option("compression", "zstd")
          .parquet(tmp.toString)
        swapIn(fs, tmp, p)
      }
    }
  }

  /** Swap `tmp` into place at `target` without a delete-before-rename
    * window: the old directory is renamed aside first, so at every
    * crash point the data exists in full either at the target, at the
    * `.old` name, or in `tmp` (dot-prefixed dirs are invisible to
    * readers, but recoverable by hand) — never half-deleted.
    *
    * HDFS and object-store FileSystems signal rename failure by
    * returning false rather than throwing, so each rename's result is
    * checked and the swap aborts — leaving tmp and .old intact — before
    * any delete could remove the only remaining copy of the partition.
    */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, target: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(
      target.getParent, s".old_${target.getName}")
    fs.delete(old, true) // clear any leftover from a previous crash
    if (!fs.rename(target, old))
      throw new java.io.IOException(
        s"swapIn: rename $target -> $old failed; aborting before any delete")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // best-effort restore of the original
      throw new java.io.IOException(
        s"swapIn: rename $tmp -> $target failed; original restored from $old")
    }
    fs.delete(old, true)
  }

  /** Small-file compaction per slot group — the operational counterpart
    * of the reference's merge phase (ogmios_parquet.py:523-571, which
    * re-writes each slot group's incremental files into one compressed
    * file). Streaming ingest appends one file set per micro-batch, so a
    * long-running stream accumulates many small files per partition —
    * the classic 100 TB read-amplification problem (every query pays
    * per-file open/footer costs). This rewrites each slot-group
    * partition into `ceil(bytes / targetBytes)` files, idempotently via
    * the same write-aside-and-swap as rollback. Only groups with more
    * than one file are touched.
    *
    * Concurrency contract: compact a partition only when nothing is
    * appending to it — run it on slot groups older than the live ingest
    * window (their content is final), or with the stream quiesced. A
    * file appended between the read and the swap would be dropped.
    */
  def compact(spark: SparkSession, baseDir: String, table: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$baseDir/$table")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("slot_group=")).foreach { dir =>
        val files = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (files.length > 1) {
          val bytes = files.map(_.getLen).sum
          val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
          val tmp = new Path(root, s".compact_tmp_${dir.getPath.getName}")
          spark.read.parquet(dir.getPath.toString)
            .repartition(nOut)
            .write.mode("overwrite").option("compression", "zstd")
            .parquet(tmp.toString)
          swapIn(fs, tmp, dir.getPath)
        }
      }
  }

  /** Read a table back; `slot_group` returns as a partition column and
    * slot_group predicates prune directories before any I/O.
    */
  def read(spark: SparkSession, baseDir: String, table: String): DataFrame =
    spark.read.parquet(s"$baseDir/$table")

  /** Read with a slot range, pushing the equivalent slot_group bounds so
    * partition pruning kicks in (the reference's manual file-list
    * filtering, token_fee_analysis.py:53-70, for free).
    */
  def readSlotRange(spark: SparkSession, baseDir: String, table: String,
      minSlot: Option[Long], maxSlot: Option[Long]): DataFrame = {
    var df = read(spark, baseDir, table)
    minSlot.foreach { lo =>
      df = df.filter(col("slot_group") >= (lo / SlotGroupSize) * SlotGroupSize &&
        col("slot") >= lo)
    }
    maxSlot.foreach { hi =>
      df = df.filter(col("slot_group") <= (hi / SlotGroupSize) * SlotGroupSize &&
        col("slot") <= hi)
    }
    df
  }
}
