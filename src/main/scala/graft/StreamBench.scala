package graft

import org.apache.spark.sql.SparkSession

/** Streaming-path throughput measurement: drives the full
  * [[graft.streaming.StreamPipeline.shardedSink]] pipeline (quality +
  * language gate → content-hash exact dedup → seeded shard assignment →
  * partitioned parquet append) over the documents corpus replayed as a
  * file-source stream, and reports end-to-end rows/sec plus per-trigger
  * latency — the same measurement discipline the batch suite has
  * (BASELINE.md records the numbers).
  *
  * Protocol: the corpus is re-written as `--batches` parquet files (the
  * replay "topic"); the stream reads ONE file per trigger
  * (maxFilesPerTrigger=1), so a run is `batches` micro-batches whose
  * input counts and commit latencies come from the query's progress
  * events. Wall clock spans start→processAllAvailable — it includes
  * every stage of every trigger, not just the hot loop.
  *
  * Usage: runMain graft.StreamBench [sfDir] [batches]
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in graft.Bench).
  * Prints one JSON line on stdout.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("streambench").toString
    // replay topic: the corpus as `batches` files, one file per trigger
    graft.io.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
      .repartition(batches)
      .write.mode("overwrite").parquet(s"$work/in")
    val nDocs = spark.read.parquet(s"$work/in").count()

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$work/in")
      .as[graft.streaming.StreamCorpusDoc]

    val t0 = System.nanoTime()
    val q = graft.streaming.StreamPipeline.shardedSink(
      stream, s"$work/out", s"$work/ckpt")
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    val outRows = spark.read.parquet(s"$work/out").count()

    val trigMs = progress.filter(_.numInputRows > 0)
      .map(_.durationMs.getOrDefault("triggerExecution", 0L).toDouble)
    val line = Seq(
      "\"metric\":\"stream_rows_per_sec\"",
      f""""value":${nDocs / wallSec}%.1f""",
      "\"unit\":\"rows/sec\"",
      s""""in_rows":$nDocs""",
      s""""out_rows":$outRows""",
      s""""batches":${trigMs.size}""",
      f""""wall_sec":$wallSec%.2f""",
      f""""avg_trigger_ms":${if (trigMs.nonEmpty) trigMs.sum / trigMs.size else 0.0}%.0f""",
      f""""max_trigger_ms":${if (trigMs.nonEmpty) trigMs.max else 0.0}%.0f""",
      s""""sf":"${new java.io.File(sfDir).getName}"""").mkString("{", ",", "}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "target/stream_bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[streambench] dump failed: ${e.getMessage}")
    }
    spark.stop()
    println(line)
  }
}
