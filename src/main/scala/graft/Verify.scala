package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — the
    // multi-process smoke (`local-cluster[2,8,4096]`) runs the SAME
    // gate with real executor JVMs, exercising every serialization
    // boundary local[N] hides (custom-expression classes on executor
    // classpaths, broadcast of trained constants, DSv2 readers
    // re-opening files executor-side). Pair it with SPARK_GRAFT_CONF
    // (same syntax as Bench) to point spark.executor.extraClassPath at
    // the compiled classes.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // see Bench: keep ObjectHashAggregate partials hash-based
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    writeDegradedMarker(outDir)
    // After the dump (the oracles above read the memos), release all
    // session-lifetime caches — this is the documented teardown path for
    // the four module-level invalidateCaches() hooks.
    SparkEntry.invalidateCaches()
    spark.stop()
  }

  /** Trained-constant oracles (s03/s04/p05) inline session-memoized
    * constants at dump time; when the memo is empty or ambiguous they
    * silently fall back to the rows-only check — make that loud (stderr
    * warning + `oracle_degraded.json` sidecar) so oracle coverage can't
    * shrink without a trace in the run output. Returns the degraded
    * names (empty in the normal single-dir Verify run).
    */
  private[graft] def writeDegradedMarker(outDir: String): Seq[String] = {
    val degraded = graft.ops.VectorQueries.degradedOracles
    if (degraded.nonEmpty) {
      System.err.println("[verify] WARNING: oracles degraded to rows-only " +
        s"(trained-constant memo empty/ambiguous at dump time): ${degraded.mkString(", ")}")
      Files.writeString(Paths.get(s"$outDir/oracle_degraded.json"),
        degraded.map("\"" + _ + "\"").mkString("[", ",", "]"))
    }
    degraded
  }
}
