package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Clustered writes enable parquet row-group skipping: a selective
  * scan over range-sorted data decodes a fraction of the rows an
  * unclustered copy decodes, measured via the scan operator's real
  * output-row metric (rows surviving pushed row-group stats, before
  * Spark's exact filter).
  */
class ClusteredWriteSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("selective scan on the cluster key decodes far fewer rows than unclustered") {
    // write the same rows twice: range-clustered by user_id vs hashed
    // (worst case for min/max stats); force small row groups so one
    // file holds several prunable groups
    val src = Tables.table(spark, "/root/testdata/sf0.01", "events")
      .select("event_id", "user_id", "value")
    val base = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val prev = spark.conf.getOption("spark.hadoop.parquet.block.size")
    spark.conf.set("spark.hadoop.parquet.block.size", (64 * 1024).toString)
    try {
      Tables.writeClustered(src, s"$base/clustered", "user_id", 4)
      src.repartition(4, col("event_id")) // key-uncorrelated placement
        .write.mode("overwrite").parquet(s"$base/unclustered")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.hadoop.parquet.block.size", v)
      case None => spark.conf.unset("spark.hadoop.parquet.block.size")
    }

    val pred = col("user_id") === 42
    val clustered = spark.read.parquet(s"$base/clustered").filter(pred)
    val unclustered = spark.read.parquet(s"$base/unclustered").filter(pred)
    // same answer either way
    assert(clustered.count() === unclustered.count())
    val decodedClustered = scanOutputRows(clustered)
    val decodedUnclustered = scanOutputRows(unclustered)
    // unclustered: every row group's [min,max] straddles user 42 → all
    // rows decode; clustered: only the row groups covering user 42
    assert(decodedClustered * 5 <= decodedUnclustered,
      s"row-group skipping ineffective: clustered=$decodedClustered unclustered=$decodedUnclustered")
  }
}
