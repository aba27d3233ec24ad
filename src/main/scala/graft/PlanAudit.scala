package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan audit: dumps `explain("formatted")` for every
  * registered query to <outDir>/<name>.txt and prints a one-line
  * summary per query — scan pushdown (PushedFilters), read-schema
  * width, join strategies, and whole-stage-codegen span count. The
  * review loop for the scale contract: a scan reading all columns for
  * a narrow projection, or a missing pushdown, shows up here.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [outDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse("target/plans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // mirror Bench's tuned session (round 12) so the dumped plans are
      // the plans the bench actually runs — the audit previously ran
      // stock AQE, which hides the SMJ→SHJ runtime conversions and the
      // wide-then-coalesce exchange posture the bench sees
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    // capture the EXECUTED QueryExecution of each noop write — the only
    // place AQE's final physical plan (with codegen ids) is observable
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        lastPlan.set(qe.explainString(FormattedMode))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        lastPlan.set("")
        df.write.mode("overwrite").format("noop").save()
        // listener fires async; poll briefly until it lands
        var tries = 0
        while (lastPlan.get().isEmpty && tries < 100) { Thread.sleep(20); tries += 1 }
        val plan = lastPlan.get()
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        val lines = plan.split("\n")
        val pushed = lines.count(l =>
          l.contains("PushedFilters") && !l.contains("PushedFilters: []"))
        val scans = lines.count(_.contains("Scan parquet"))
        val readCols = lines.filter(_.trim.startsWith("ReadSchema"))
          .map(_.count(_ == ',') + 1).sorted.reverse.headOption.getOrElse(0)
        val bhj = lines.count(_.contains("BroadcastHashJoin"))
        val smj = lines.count(_.contains("SortMergeJoin"))
        val codegen = "codegen id : (\\d+)".r
          .findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"$name%-28s scans=$scans pushed=$pushed maxReadCols=$readCols " +
          f"bhj=$bhj smj=$smj codegenSpans=$codegen")
      } catch {
        case e: Throwable => println(s"$name AUDIT FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
