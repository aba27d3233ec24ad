package graft

import java.nio.file.Files

import graft.ops.{TextQueries, VectorQueries}

/** Exercises the session-lifetime cache contract end to end: memoize →
  * invalidate → blocks released → retrain occurs; and the
  * oracle-degradation marker that fires when a second dir trains in the
  * same session (the silent-downgrade hole from the round-6 verdict).
  */
class CacheLifecycleSpec extends SparkSpec {

  private val sf2 = "/root/testdata/sf0.01"

  test("degradedOracles tracks trained-constant memo ambiguity; marker file appears") {
    // start from a clean slate regardless of suite order
    SparkEntry.invalidateCaches()
    assert(VectorQueries.degradedOracles.toSet ===
      Set("s03_ann_ivf_probed", "s06_knn_graph", "p05_semantic_dedup",
        "s07_ann_ivf_hier", "s04_ann_pq_adc"))

    VectorQueries.trainedCentroids(spark, sf)
    // one centroid entry → centroid-backed oracles healthy; the hier
    // index and PQ memos are still empty
    assert(VectorQueries.degradedOracles ===
      Seq("s07_ann_ivf_hier", "s04_ann_pq_adc"))
    VectorQueries.trainedHierCentroids(spark, sf)
    assert(VectorQueries.degradedOracles === Seq("s04_ann_pq_adc"))

    // second dir trained in the same session → centroid oracles ambiguous
    VectorQueries.trainedCentroids(spark, sf2)
    val degraded = VectorQueries.degradedOracles
    assert(degraded.contains("s03_ann_ivf_probed"))
    assert(degraded.contains("p05_semantic_dedup"))

    // Verify's sidecar marker materializes the signal for the driver run
    val out = Files.createTempDirectory("graft-degraded").toString
    assert(Verify.writeDegradedMarker(out) === degraded)
    val marker = Files.readString(java.nio.file.Paths.get(s"$out/oracle_degraded.json"))
    assert(marker.contains("s03_ann_ivf_probed"), marker)

    // invalidate → ambiguity resolved by retraining exactly one dir
    // (both memos: centroids AND codebooks) — the healthy Verify state
    SparkEntry.invalidateCaches()
    VectorQueries.trainedCentroids(spark, sf)
    VectorQueries.trainedHierCentroids(spark, sf)
    VectorQueries.trainedCodebooks(spark, sf)
    assert(VectorQueries.degradedOracles.isEmpty)
    // no marker file written when nothing degraded
    val out2 = Files.createTempDirectory("graft-ok").toString
    assert(Verify.writeDegradedMarker(out2).isEmpty)
    assert(!Files.exists(java.nio.file.Paths.get(s"$out2/oracle_degraded.json")))
  }

  test("invalidateCaches releases cached blocks and forces retraining") {
    SparkEntry.invalidateCaches()
    // trained constants: same values (seed-pinned) but a NEW training run
    val first = VectorQueries.trainedCentroids(spark, sf)
    assert(VectorQueries.trainedCentroids(spark, sf) eq first) // memoized
    SparkEntry.invalidateCaches()
    val second = VectorQueries.trainedCentroids(spark, sf)
    assert(second ne first, "expected retraining after invalidate")
    assert(first.map(_.toSeq).toSeq === second.map(_.toSeq).toSeq, "seed-pinned")

    // cached DataFrames: materialize the memoized term-count relation
    // (the t05/t06/t07/t11 shared per-doc counts), then assert
    // invalidate drops its blocks
    TextQueries.sharedTokCounts(spark, sf).count()
    val whileCached = spark.sparkContext.getPersistentRDDs.size
    assert(whileCached >= 1)
    SparkEntry.invalidateCaches()
    assert(spark.sparkContext.getPersistentRDDs.size < whileCached)
  }
}
