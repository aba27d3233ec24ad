package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables
import graft.ops.CoreQueries

/** Storage-layout A/B for the flagship pipeline (q10): the same
  * [[CoreQueries.transferPipelineOn]] body over (a) the plain one-file
  * parquet tables and (b) `orders`/`lineitem` written once with
  * `bucketBy(32, orderkey)` — the write-once-join-many layout a real
  * 100 TB deployment of this pipeline would use (the UTxO resolution
  * join of /root/reference/token_fee_analysis.py:204-249 recurs per
  * analysis run, so the shuffle belongs at write time).
  *
  * With both fact tables hash-placed on the order key, every q10 stage
  * keyed on it inherits the layout instead of shuffling: the
  * token-output distinct, the relevance semi join, the consumed-side
  * outpoint probe, and the final address-set join all plan without an
  * Exchange on the bucketed side (BucketedPipelineSpec pins the
  * exchange counts and hash equality; this main measures the wall-clock
  * delta). Only the customer-keyed lag window still shuffles — it is
  * keyed on o_custkey, a different axis than the storage layout.
  *
  * Protocol mirrors graft.Bench: noop sink, interleaved best-of-N,
  * sf0.001-shaped warmup via the first untimed pass. One JSON line to
  * stdout after spark.stop().
  *
  * MEASURED (round 9, sf1, local[32], interleaved best-of-5, two runs):
  * plain 2.30-2.69 s, bucketed 2.83-3.52 s — the layout is ~20% SLOWER
  * at this scale even though the executed-plan probe confirms the
  * elision is real (9 → 3 Exchanges, same 3 SMJ + 4 BHJ mix). Why the
  * inversion: at sf1 the six elided shuffles move MB-scale pruned
  * intermediates (cheap), while the bucketed layout inflates the scan
  * side — hash-scattering rows across 32 buckets breaks run-length/
  * dictionary locality (lineitem 110 MB/1 file → 118.7 MB/192 files,
  * orders 22.9 → 25.6 MB) and every one of the pipeline's 9 scans pays
  * the small-file open/decode overhead. At deployment scale the ratio
  * flips: the elided exchanges carry TB not MB, the per-file overhead
  * amortizes over thousands of natural splits either way, and the
  * write-time shuffle is paid ONCE against joins that recur per
  * analysis run. The layout ships (Tables.writeBucketed +
  * BucketedPipelineSpec's pinned exchange counts and hash equality);
  * the local bench keeps the plain path — this is a scale-regime
  * choice, not a code path to "fix".
  */
object BucketedBench {
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

    // One-time layout build (reused across invocations of this main):
    // full-width tables — a deployment buckets the table, not a query's
    // projection; column pruning still applies to bucketed scans.
    val sfName = new java.io.File(sfDir).getName
    val base = sys.env.getOrElse("SPARK_GRAFT_BUCKET_DIR",
      s"/tmp/graft_bucketed_$sfName")
    val buckets = 32
    def ensure(tbl: String, key: String): Unit = {
      val path = s"$base/${tbl}_b"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        Tables.writeBucketed(Tables.table(spark, sfDir, tbl), path,
          s"${tbl}_b", key, buckets)
      } else if (!spark.catalog.tableExists(s"${tbl}_b")) {
        // re-register the existing files in this session's catalog
        Tables.writeBucketed(Tables.table(spark, sfDir, tbl), path,
          s"${tbl}_b", key, buckets)
      }
    }
    ensure("orders", "o_orderkey")
    ensure("lineitem", "l_orderkey")

    def save(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // (label, plain body, bucketed body). q33 is the round-12 addition:
    // its semi join is keyed on the bucket axis end-to-end, so the
    // bucketed layout elides BOTH sides' exchanges — the purest probe
    // of whether write-time placement pays for the probe-throughput
    // rows (VERDICT r11 item 3b).
    val pipelines: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q10",
        () => CoreQueries.transferPipeline(spark, sfDir),
        () => CoreQueries.transferPipelineOn(
          spark.table("lineitem_b"), spark.table("orders_b"))),
      ("q33",
        () => graft.ops.ExtendedQueries.q33Pipeline(spark, sfDir),
        () => graft.ops.ExtendedQueries.q33PipelineOn(spark,
          spark.table("lineitem_b"), spark.table("orders_b"))))

    val results = pipelines.map { case (label, plain, bucketed) =>
      // correctness first: identical relation from both layouts
      val a = plain().collect().map(_.toString).sorted
      val b = bucketed().collect().map(_.toString).sorted
      require(a.sameElements(b),
        s"$label bucketed diverged: plain ${a.length} rows, bucketed ${b.length}")

      val variants = Seq("plain" -> plain, "bucketed" -> bucketed)
      variants.foreach { case (_, f) => save(f()) } // warm (JIT + codegen)
      val best = scala.collection.mutable.Map.empty[String, Double]
      (1 to passes).foreach { _ =>
        variants.foreach { case (name, f) =>
          val df = f()
          val t0 = System.nanoTime()
          save(df)
          val t = (System.nanoTime() - t0) / 1e9
          if (!best.contains(name) || t < best(name)) best(name) = t
        }
      }
      f""""$label":{"plain":${best("plain")}%.3f,"bucketed":${best("bucketed")}%.3f,"rows":${a.length}}"""
    }
    spark.stop()
    println(s"""{"metric":"bucketed_ab","sf":"$sfName",${results.mkString(",")}}""")
  }
}
