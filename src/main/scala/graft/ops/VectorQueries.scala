package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Tables.{table, tableFan}
import graft.functions.CustomFunctions

/** Embedding-similarity operator family over the `embeddings` table
  * (64-dim float vectors): brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the scale path, and
  * blocked nearest-neighbor near-dup detection.
  *
  * Determinism: vectors are cast float→double element-wise (exact), and
  * every dot product is a strict left-to-right sum — the native
  * codegen'd ArrayDot expression on the Spark side, `list_reduce` in
  * the DuckDB oracles — identical IEEE operation order, so cosines
  * match bit-for-bit with no rounding. Norms are computed ONCE per
  * vector (a column, not per pair), and both engines derive the cosine
  * as dot / (norm_a * norm_b) in the same expression shape.
  *
  * 100 TB posture: brute force is O(Q·N) and only right for a bounded
  * query set (s01); the LSH variant (s02) and the coarse-block
  * restriction (d05) are the patterns that bound all-pairs work at
  * scale — candidates share a bucket/block, everything else is pruned
  * before any distance is computed. The per-pair inner loop is a
  * whole-stage-codegen dot over two primitive arrays.
  */
object VectorQueries {

  /** Codegen'd strict left fold — see graft.functions.ArrayDot. */
  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** DuckDB mirror of [[dot]]: list_reduce left fold over the zipped
    * element products (list_zip entries are structs, fields 1-indexed).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> p[1] * p[2])), (s, x) -> s + x)"

  private def normSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform($a, x -> x * x)), (s, x) -> s + x))"

  /** Vectors with their norm precomputed once — the join sides reuse it
    * so no norm is ever recomputed per candidate pair.
    */
  private def vectors(spark: SparkSession, dir: String): DataFrame = {
    CustomFunctions.register(spark)
    tableFan(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
  }

  private val vectorsCte: String =
    s"""e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |  ${normSql("CAST(embedding AS DOUBLE[])")} AS nrm FROM embeddings)""".stripMargin

  /** The query set for the ANN ops: a bounded, data-independent id range
    * (a real pipeline would broadcast its query batch the same way).
    */
  private val numQueries = 10
  val topK = 5

  // ---------------------------------------------------------------------
  // s01 — brute-force cosine top-k: the exact ANN baseline. Q bounded →
  // the query side broadcasts and the corpus streams through one
  // map-side cross join; per-query top-k via rank window (the only
  // shuffle, keyed by query).
  // ---------------------------------------------------------------------
  val s01 = Q("s01_ann_brute_topk",
    s"""WITH $vectorsCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < $numQueries),
       |pairs AS (
       |  SELECT q.qid, e.vec_id, ${dotSql("q.qv", "e.v")} / (q.qn * e.nrm) AS cos
       |  FROM q, e WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs)
       |SELECT qid, rank, vec_id AS neighbor_id, cos FROM ranked
       |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin
  ) { (spark, dir) =>
    val e = vectors(spark, dir)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------------
  // s02 — LSH-bucketed ANN: 6 fixed random hyperplanes → 64 sign-pattern
  // buckets; a query is compared only against its own bucket (≈ N/64 of
  // the corpus), then ranked. The approximate scale path for s01 — at
  // 100 TB the bucket id is the shuffle/partition key and each bucket is
  // processed independently. The planes are seeded CONSTANTS, so they
  // inline into the oracle SQL as double literals (shortest-repr
  // round-trips exactly; the dot is the same strict left fold both
  // sides) — fully oracled as of round 5 (rounds ≤ 4 treated the planes
  // as inexpressible → rows-only). OperatorsSpec additionally pins
  // bucket consistency and dominance against s01's exact answer.
  // ---------------------------------------------------------------------
  private val numPlanes = 6
  lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numPlanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  def bucketOf(v: Column): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, j)) =>
      acc + when(dot(v, typedLit(p.toSeq)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }

  private def planeSqlLit(p: Array[Double]): String =
    p.map(java.lang.Double.toString).mkString("[", ", ", "]")

  val s02 = Q("s02_ann_lsh_bucketed", {
    val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${dotSql("v", planeSqlLit(p))} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH $vectorsCte,
       |b AS (SELECT vec_id, v, nrm,
       |    $bucketExpr AS bucket FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket
       |      FROM b WHERE vec_id < $numQueries),
       |pairs AS (
       |  SELECT q.qid, t.vec_id, ${dotSql("q.qv", "t.v")} / (q.qn * t.nrm) AS cos
       |  FROM q JOIN b t USING (bucket) WHERE t.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cos, row_number() OVER (
       |  PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM pairs)
       |SELECT qid, rank, vec_id AS neighbor_id, cos FROM ranked
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }) { (spark, dir) =>
    val e = vectors(spark, dir).withColumn("bucket", bucketOf(col("v")))
    val qb = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    broadcast(qb).join(e, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------------
  // d05 — embedding-cosine near-dup: nearest neighbor per vector within
  // its coarse block (`label` stands in for the IVF/k-means cell a real
  // pipeline assigns), flagged against a near-dup threshold. Restricting
  // candidates to the block is what bounds the O(N²) at scale.
  // ---------------------------------------------------------------------
  val neardupThreshold = 0.4

  val d05 = Q("d05_embed_neardup",
    s"""WITH $vectorsCte,
       |pairs AS (
       |  SELECT a.vec_id, a.label, b.vec_id AS nn,
       |    ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT vec_id, label, nn, cos, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY cos DESC, nn) AS rn
       |  FROM pairs)
       |SELECT vec_id, label, nn AS nn_id, cos AS nn_cos,
       |  CAST(CASE WHEN cos >= $neardupThreshold THEN 1 ELSE 0 END AS BIGINT) AS is_neardup
       |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  ) { (spark, dir) =>
    blockNearestNeighbors(vectors(spark, dir)).orderBy("vec_id")
  }

  /** The all-pairs join + rank-window form of d05, kept as the
    * reference model: VectorPqSpec pins [[blockNearestNeighbors]]
    * against it bit-for-bit (including tie-breaks) on randomized
    * corpora. Not the measured query — the join materializes every
    * within-block pair and the window sorts them all.
    */
  def blockNearDupNaive(e: DataFrame): DataFrame = {
    val a = e.toDF("vec_id", "label", "v", "nrm")
    val b = e.toDF("nn", "label_b", "bv", "bnrm")
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn"))
    a.join(b, col("label") === col("label_b") && col("vec_id") =!= col("nn"))
      .select(col("vec_id"), col("label"), col("nn"),
        (dot(col("v"), col("bv")) / (col("nrm") * col("bnrm"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("nn").as("nn_id"),
        col("cos").as("nn_cos"),
        when(col("cos") >= neardupThreshold, 1L).otherwise(0L).as("is_neardup"))
  }

  /** Exact block-local nearest neighbor WITHOUT materializing the
    * within-block pair set: each label block is sorted by the first
    * normalized coordinate c1 = v[0]/‖v‖ and scanned outward per
    * vector under the projection bound — for unit vectors
    * cos(a,b) = 1 − ‖â−b̂‖²/2 and ‖â−b̂‖² ≥ (c1ₐ−c1ᵦ)², so once
    * (Δc1)² > 2 − 2·best + ε no vector further out in either
    * direction can beat the incumbent (ε = 1e-9 absorbs the ~1e-14
    * float error of the bound arithmetic — pruning is conservative,
    * never answer-changing). Worst case is still the block quadratic
    * (isolated vectors with low best-cos scan their whole block);
    * duplicate-heavy corpora — the near-dup use case — find a
    * cos≈1 incumbent within a few steps and collapse the band to
    * nothing, replacing the O(B²) pair join + rank window with an
    * O(B log B) sort and a near-linear scan.
    *
    * Bit-compatibility with the join form: the reported cosine is the
    * SAME expression (ascending ArrayDot fold ÷ (‖a‖·‖b‖), evaluated
    * here with the identical operation order), the incumbent
    * comparator is (cos DESC, id ASC) under java.lang.Double.compare
    * (NaN-largest, matching Spark's double ordering; −0.0 is
    * unreachable — the fold starts at +0.0), and singleton blocks
    * emit nothing, exactly like the inner join. The one
    * `mapPartitions` outside m01's batch decode — the bound-adaptive
    * scan has no declarative equivalent (a fixed-radius band join
    * over-scans isolated vectors; a per-row radius is not a join
    * key). 100 TB posture: label is the partition key (same as the
    * join form's shuffle); the scan consumes the sorted iterator one
    * consecutive-label block at a time (buffer, scan, emit, release),
    * so per-task memory is the LARGEST single block's vectors plus its
    * output — the same working set the join's build side held — not
    * the sum of every block hashed to the partition.
    */
  def blockNearestNeighbors(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val typed = e.select(col("vec_id").cast("long").as("_1"),
        col("label").cast("int").as("_2"),
        col("v").as("_3"), col("nrm").cast("double").as("_4"))
      .as[(Long, Int, Array[Double], Double)]
    val scanned = typed
      .repartition(col("_2"))
      .sortWithinPartitions(col("_2"),
        when(size(col("_3")) > 0 && col("_4") =!= 0.0,
          element_at(col("_3"), 1) / col("_4")).otherwise(lit(0.0)),
        col("_1"))
      .mapPartitions { rows =>
        // one consecutive-label block in memory at a time: the sorted
        // iterator delivers rows grouped by label, so buffer a block,
        // scan it, emit, and release before pulling the next — per-task
        // memory is max(block), not Σ(blocks hashed to the partition)
        val src = rows.buffered
        new Iterator[(Long, Int, Long, Double, Long)] {
          private var out =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double, Long)]
          private var idx = 0
          private def advance(): Unit =
            while (idx >= out.length && src.hasNext) {
              val label = src.head._2
              val block =
                scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Double], Double)]
              while (src.hasNext && src.head._2 == label)
                block += src.next()
              out = scala.collection.mutable.ArrayBuffer.empty
              idx = 0
              scanBlock(block.toArray, 0, block.length, out)
            }
          override def hasNext: Boolean = { advance(); idx < out.length }
          override def next(): (Long, Int, Long, Double, Long) = {
            advance()
            val r = out(idx); idx += 1; r
          }
        }
      }
    scanned.toDF("vec_id", "label", "nn_id", "nn_cos", "is_neardup")
  }

  /** Outward two-pointer scan of one sorted block [start, end). */
  private def scanBlock(block: Array[(Long, Int, Array[Double], Double)],
      start: Int, end: Int,
      out: scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double, Long)]): Unit = {
    val n = end - start
    if (n < 2) return // singleton blocks emit nothing (inner-join parity)
    val eps = 1e-9
    val c1 = new Array[Double](n)
    var i = 0
    while (i < n) {
      val (_, _, v, nrm) = block(start + i)
      // same guard as the sort key: degenerate rows pin to 0.0 (their
      // cosines are NaN either way — outside the engine contract under
      // ANSI, where the declarative form's division would throw)
      c1(i) = if (v.length > 0 && nrm != 0.0) v(0) / nrm else 0.0
      i += 1
    }
    def cosOf(i: Int, j: Int): Double = {
      val a = block(start + i); val b = block(start + j)
      val (va, vb) = (a._3, b._3)
      val len = math.min(va.length, vb.length)
      var s = 0.0
      var k = 0
      while (k < len) { s += va(k) * vb(k); k += 1 }
      s / (a._4 * b._4)
    }
    i = 0
    while (i < n) {
      var bestCos = Double.NaN
      var bestId = Long.MaxValue
      var seen = false
      // candidates in ascending |Δc1| order; a direction dies once its
      // Δ² exceeds the (monotonically tightening) bound
      var lo = i - 1
      var hi = i + 1
      while (lo >= 0 || hi < n) {
        val dLo = if (lo >= 0) c1(i) - c1(lo) else Double.PositiveInfinity
        val dHi = if (hi < n) c1(hi) - c1(i) else Double.PositiveInfinity
        val takeLo = dLo <= dHi
        val d = if (takeLo) dLo else dHi
        if (seen && !java.lang.Double.isNaN(bestCos) &&
            d * d > 2.0 - 2.0 * bestCos + eps) {
          // nothing further out can win in EITHER direction (d is the
          // smaller of the two fronts)
          lo = -1; hi = n
        } else {
          val j = if (takeLo) lo else hi
          val cos = cosOf(i, j)
          val id = block(start + j)._1
          val cmp = java.lang.Double.compare(cos, bestCos)
          if (!seen || cmp > 0 || (cmp == 0 && id < bestId)) {
            bestCos = cos; bestId = id; seen = true
          }
          if (takeLo) lo -= 1 else hi += 1
        }
      }
      val me = block(start + i)
      out += ((me._1, me._2, bestId, bestCos,
        if (bestCos >= neardupThreshold) 1L else 0L))
      i += 1
    }
  }

  // ---------------------------------------------------------------------
  // s03 — IVF ANN with TRAINED centroids: k-means (spark.ml, fixed seed)
  // learns 16 cell centers from the corpus — the index-build step of a
  // production vector index — then the corpus partitions into inverted
  // lists (cell = argmax centroid dot); a query probes its two nearest
  // cells and ranks only their members. At 100 TB the cell id is the
  // partition key, each inverted list is scanned independently, probe
  // count trades recall for work, and training cost amortizes across
  // every query (memoized per session here, persisted in a real
  // deployment). Centroids are data-derived → rows-only;
  // ExtendedSpec pins cell consistency and dominance vs s01, and a
  // recall floor vs the exact answer.
  // ---------------------------------------------------------------------
  /** Cell-count floor — and the exact count at every tested SF ≤ 0.1
    * (≤ 4000 vectors), so growing the index never disturbs those
    * fixtures or their specs.
    */
  private val numCells = 16

  /** Target members per cell. The within-cell consumers (p05's edge
    * set, s06's kNN graph) do O(Σ|cell|²) work, so a FIXED cell count
    * makes 10× data cost 100× — measured: s06 at sf1 spent 52 s on
    * 43.6M pairs under 16 cells. Growing cells ∝ N/cellTargetSize keeps
    * per-cell membership bounded and the total pair count LINEAR in the
    * corpus (N · cellTargetSize) — the published SemDeDup/IVF scaling,
    * where cluster count tracks corpus size. Same measurement after the
    * growth (80 cells at sf1): 5.9M pairs, s06 7.5 s.
    */
  private val cellTargetSize = 250L

  /** K-means training-input floor: above this, training runs on a
    * seeded sample (standard IVF practice — FAISS trains on a bounded
    * sample too). Keeps index-build cost O(sample · cells) instead of
    * O(N · cells), which matters once cells also grows with N. Below
    * the bound (every driver-tested SF) training sees every vector, so
    * tested behavior is unchanged. Because k itself grows as
    * N/cellTargetSize, the ACTUAL sample target scales with k
    * (`trainPerCell` points per centroid, FAISS's ~39-minimum
    * neighborhood): a fixed 100k sample would drop below k around
    * N ≈ 25M vectors and produce degenerate duplicate centroids.
    */
  private val trainSampleCap = 100000L

  /** Training points per centroid once the k-derived target exceeds
    * [[trainSampleCap]] (k·40 > 100k ⇔ N > 25M vectors).
    */
  private val trainPerCell = 40L

  private val centroidsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Array[Double]]]

  /** K-means-trained IVF centroids, trained once per (session, dir):
    * k = max(16, N / cellTargetSize) cells on (a bounded sample of) the
    * corpus. Assumes the dir's embeddings are immutable for the
    * session's lifetime; [[invalidateCaches]] forces retraining.
    */
  def trainedCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    centroidsMemo.getOrElseUpdate((spark, dir), {
      // footer-only row count — no column scan
      val n = table(spark, dir, "embeddings").count()
      val k = math.max(numCells.toLong, n / cellTargetSize).toInt
      val all = vectors(spark, dir)
        .select(org.apache.spark.ml.functions.array_to_vector(col("v")).as("features"))
      // sample scales with k so the training set never drops below the
      // centroid count (see trainSampleCap / trainPerCell)
      val sampleTarget = math.max(trainSampleCap, trainPerCell * k)
      val feats = if (n > sampleTarget)
        all.sample(withReplacement = false, sampleTarget.toDouble / n, 7L)
      else all
      new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(7L).setMaxIter(5)
        .fit(feats).clusterCenters.map(_.toArray)
    })

  private val hierCentroidsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Array[Double]]]

  /** Training-input bound for the hier-regime index: a deterministic
    * id-prefix subset, not a random sample, so the trained constants
    * are reproducible for the oracle inlining without seed plumbing.
    */
  private val hierTrainCap = 8192L

  /** A fixed `TopCells.hierMin`-cell index trained once per (session,
    * dir) on the bounded id-prefix subset — exists solely to force the
    * two-level routing regime under the driver gate (s07); the cell
    * count deliberately does NOT grow with N (that is s03's job), so
    * training cost is bounded at hierTrainCap · hierMin regardless of
    * corpus size.
    */
  def trainedHierCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    hierCentroidsMemo.getOrElseUpdate((spark, dir), {
      val feats = vectors(spark, dir)
        .filter(col("vec_id") < hierTrainCap)
        .select(org.apache.spark.ml.functions.array_to_vector(col("v")).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(graft.functions.TopCells.hierMin).setSeed(7L).setMaxIter(5)
        .fit(feats).clusterCenters.map(_.toArray)
    })

  private def soleHierCentroids: Option[Array[Array[Double]]] =
    if (hierCentroidsMemo.size == 1) Some(hierCentroidsMemo.values.head) else None

  /** Drop the trained-index memos (see DedupQueries.invalidateCaches). */
  def invalidateCaches(): Unit = {
    centroidsMemo.clear()
    hierCentroidsMemo.clear()
    pqMemo.clear()
    semanticEdgesMemo.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    semanticEdgesMemo.clear()
  }

  /** (dot, cellId) structs for every centroid, descending-sorted so
    * element 1 is the best cell, element 2 the second probe. The
    * COMPOSED form — SortArray is CodegenFallback, so this drops the
    * per-row projection out of whole-stage codegen; kept as the
    * spec-pinned reference model for [[topCells]], which is the
    * codegen'd route every query uses (same PqEncode-vs-composed
    * story as s04's encoder).
    */
  def cellRanking(v: Column, cs: Array[Array[Double]]): Column =
    sort_array(array(cs.zipWithIndex.map { case (c, i) =>
      struct(dot(v, typedLit(c.toSeq)).as("d"), lit(i).as("i"))
    }: _*), asc = false)

  /** Codegen'd top-k cells by centroid dot. Below `TopCells.hierMin`
    * cells this is bit-identical in selection order to [[cellRanking]]
    * (VectorPqSpec pins it — every driver-gate index is in this
    * regime); AT OR ABOVE hierMin, TopCells routes through the
    * deterministic two-level coarse quantizer and the equivalence with
    * the exact-flat [[cellRanking]] no longer holds — the hier regime's
    * reference is TopCellsSafetySpec's independent rule model and the
    * two-level oracle SQL ([[cellsRankedCte]]), gate-exercised by
    * s07_ann_ivf_hier.
    */
  def topCells(v: Column, cs: Array[Array[Double]], k: Int): Column =
    call_function("top_cells", v, typedLit(cs.map(_.toSeq).toSeq), lit(k))

  def cellOf(v: Column, cs: Array[Array[Double]]): Column =
    element_at(topCells(v, cs, 1), 1)

  /** The session's trained centroids, available at ORACLE-DUMP time:
    * Q.oracle is a thunk and graft.Verify dumps oracle SQL AFTER
    * running every query, so the constants k-means trained during the
    * run can inline into the oracle text as literals — the oracle then
    * verifies everything downstream of training (training itself is
    * seed-pinned by ExtendedSpec). Defined only when exactly one
    * (session, dir) trained — the Verify scenario; ambiguous sessions
    * degrade to the rows-only check.
    */
  private def soleCentroids: Option[Array[Array[Double]]] =
    if (centroidsMemo.size == 1) Some(centroidsMemo.values.head) else None

  /** Query names whose oracle thunk would degrade to the rows-only check
    * at dump time because the trained-constant memo isn't a single
    * unambiguous (session, dir) entry. Verify surfaces this (stderr
    * warning + `oracle_degraded.json` sidecar) so oracle coverage can't
    * shrink silently when a second dir trains in the same session.
    */
  def degradedOracles: Seq[String] = {
    val c = if (soleCentroids.isEmpty)
      Seq("s03_ann_ivf_probed", "s06_knn_graph", "p05_semantic_dedup") else Nil
    val h = if (soleHierCentroids.isEmpty) Seq("s07_ann_ivf_hier") else Nil
    val p = if (solePq.isEmpty) Seq("s04_ann_pq_adc") else Nil
    c ++ h ++ p
  }

  /** DuckDB CTE stage(s) computing `r(vec_id, v, nrm, cells)` from `e`:
    * `cells` is the struct list sorted ascending then reversed, so
    * `cells[1]` is the best cell (max dot, ties to the LARGER id —
    * TopCells' exact order) and `cells[2]` the second probe.
    *
    * Regime-aware, matching TopCells' execution exactly: below
    * `TopCells.hierMin` cells the list ranks ALL cells (the flat
    * exact-nearest loop); at or above it, the list ranks only the
    * members of the top-2 coarse groups of the deterministic two-level
    * index ([[graft.functions.TopCells.Hier]], rebuilt here as the same
    * pure function of the centroid array). Every consumer reads at most
    * `cells[2]`, and TopCells' probe count is min(max(2,k), groups) —
    * so for k ∈ {1,2} the two-group candidate list reproduces the
    * engine's selection bit-for-bit.
    *
    * Emitted as a CTE CHAIN rather than a scalar fragment so the hier
    * form binds the coarse ranking `cr` ONCE in a prior stage (a real
    * column — no string substitution into generated SQL, no reliance
    * on DuckDB CSE) and each group's member-struct list appears ONCE,
    * inside a lazily-evaluated CASE under `list_transform` — only the
    * two selected groups' dots are computed per row, the same
    * O(√k·d + members(2 groups)·d) per-row cost the engine pays.
    */
  private def cellsRankedCte(cs: Array[Array[Double]]): String = {
    def ranked(entries: Seq[String]) =
      "list_reverse(list_sort(" + entries.mkString("[", ",\n      ", "]") + "))"
    def memberStructs(cells: Seq[Int]) = cells.map { i =>
      s"struct_pack(d := ${dotSql("v", planeSqlLit(cs(i)))}, i := $i)"
    }
    val h0 = if (cs.length < graft.functions.TopCells.hierMin) null
      else graft.functions.TopCells.buildHier(cs)
    // degenerate single-group index probes every cell — flat form
    if (h0 == null || h0.numGroups < 2)
      s"r AS (SELECT vec_id, v, nrm, ${ranked(memberStructs(cs.indices))} AS cells FROM e)"
    else {
      val h = h0
      val coarse = (0 until h.numGroups).map { gi =>
        val mu = Array.tabulate(cs(0).length)(d => h.coarseFlat(gi * cs(0).length + d))
        s"struct_pack(d := ${dotSql("v", planeSqlLit(mu))}, i := $gi)"
      }
      val cases = (0 until h.numGroups).map { gi =>
        val members = (h.groupStart(gi) until h.groupStart(gi + 1)).map(h.memberIds)
        s"WHEN $gi THEN ${memberStructs(members).mkString("[", ",\n        ", "]")}"
      }
      s"""r0 AS (SELECT vec_id, v, nrm, ${ranked(coarse)} AS cr FROM e),
         |r AS (SELECT vec_id, v, nrm, list_reverse(list_sort(flatten(list_transform(
         |    [cr[1].i, cr[2].i],
         |    gid -> CASE gid ${cases.mkString("\n      ", "\n      ", "")} END)))) AS cells
         |  FROM r0)""".stripMargin
    }
  }

  /** The 2-probe IVF oracle SQL for a given trained centroid set —
    * shared by s03 (grown flat-regime index) and s07 (fixed hier-regime
    * index): the routing CTE ([[cellsRankedCte]]) is regime-aware, so
    * the same chain verifies both execution paths.
    */
  private def ivfProbeSql(cs: Array[Array[Double]]): String =
    s"""WITH $vectorsCte,
       |${cellsRankedCte(cs)},
       |b AS (SELECT vec_id, v, nrm, CAST(cells[1].i AS BIGINT) AS cell FROM r),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn,
       |    unnest([CAST(cells[1].i AS BIGINT), CAST(cells[2].i AS BIGINT)]) AS cell
       |  FROM r WHERE vec_id < $numQueries),
       |pairs AS (
       |  SELECT q.qid, t.vec_id, ${dotSql("q.qv", "t.v")} / (q.qn * t.nrm) AS cos
       |  FROM q JOIN b t USING (cell) WHERE t.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cos, row_number() OVER (
       |  PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM pairs)
       |SELECT qid, rank, vec_id AS neighbor_id, cos FROM ranked
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  val s03: Q = Q("s03_ann_ivf_probed",
    (spark, dir) => s03Body(spark, dir, trainedCentroids(spark, dir)),
    () => soleCentroids.map(ivfProbeSql))

  // ---------------------------------------------------------------------
  // s07 — IVF probe through the TWO-LEVEL routing regime: identical
  // query shape to s03, but the index is a fixed hierMin-cell (128)
  // index, so TopCells takes the coarse-quantizer path and the oracle
  // emits the two-level SQL — putting the hier code path AND its
  // cellsRankedCte twin under the standing driver gate at every SF
  // (s03's grown index reaches hierMin only around N ≈ 32k vectors,
  // far above the gate SFs; before this query the hier regime was
  // pinned only by specs and manual factor-20 runs). The fixed cell
  // count is NOT a scaling posture — it exists to force the regime;
  // s03 keeps the N/cellTargetSize growth rule that holds at 100 TB.
  // ---------------------------------------------------------------------
  val s07: Q = Q("s07_ann_ivf_hier",
    (spark, dir) => s03Body(spark, dir, trainedHierCentroids(spark, dir)),
    () => soleHierCentroids.map(ivfProbeSql))

  private def s03Body(spark: SparkSession, dir: String,
      cs: Array[Array[Double]]): DataFrame = {
    val e = vectors(spark, dir).withColumn("cell", cellOf(col("v"), cs))
    // one probe ROW per (query, probed cell): the OR-condition join
    // (cell = cell1 OR cell = cell2) would plan a nested loop; exploding
    // the probe list turns it into a plain hash join on the cell id —
    // the shape that scales to any probe count and corpus size
    // (PlanQualitySpec pins the absence of nested-loop joins here)
    val q = vectors(spark, dir).filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(topCells(col("v"), cs, 2)).as("cell"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    broadcast(q)
      .join(e, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------------
  // s04 — PRODUCT-QUANTIZED ANN (the memory-scale rung of the ladder:
  // brute s01 → LSH s02 → IVF s03 → PQ s04): the 64-dim corpus is
  // stored as 8 four-bit-sized codes (one per 8-dim subspace, 16
  // centroids each, k-means-trained per subspace on the NORMALIZED
  // vectors so inner product ≈ cosine), and queries scan codes with a
  // precomputed per-(query, subspace, code) lookup table — the ADC
  // (asymmetric distance computation) scan of Jégou et al.'s PQ. The
  // per-row work is 8 array lookups + adds (pure codegen arithmetic, no
  // vector math at scan time); the ADC shortlist (native TopKAgg
  // bounded-heap aggregate — map-side partial, only shortlist-size rows
  // per partition reach the shuffle) is then exact-re-ranked against
  // the full vectors, so the emitted scores are true cosines and
  // quantization error only affects shortlist membership.
  //
  // 100 TB posture: this is the shape that makes a 100 TB corpus
  // scannable — 8 bytes/vector instead of 256, LUTs are O(Q·8·16)
  // broadcast constants, the scan is embarrassingly parallel, and the
  // codebook training amortizes (memoized per session here, persisted
  // in a real deployment; train on a sample at scale). Codebooks are
  // data-derived → rows-only; VectorPqSpec pins encode determinism,
  // exactness of the re-ranked scores, and a recall floor vs s01.
  // ---------------------------------------------------------------------
  private val pqSubs = 8
  private val pqSubDim = 8
  private val pqCodes = 16
  private val pqShortlistFactor = 10

  private val pqMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Array[Array[Double]]]]

  /** Per-subspace k-means codebooks, [sub][code][dim], trained once per
    * (session, dir) on the unit-normalized vectors.
    */
  def trainedCodebooks(spark: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqMemo.getOrElseUpdate((spark, dir), {
      val vn = vectors(spark, dir)
        .select(transform(col("v"), x => x / col("nrm")).as("vn"))
      (0 until pqSubs).toArray.map { s =>
        val feats = vn.select(org.apache.spark.ml.functions.array_to_vector(
          slice(col("vn"), s * pqSubDim + 1, pqSubDim)).as("features"))
        new org.apache.spark.ml.clustering.KMeans()
          .setK(pqCodes).setSeed(7L + s).setMaxIter(5)
          .fit(feats).clusterCenters.map(_.toArray)
      }
    })

  /** Nearest-centroid code for one subspace slice: argmin L2 ⇔ argmin
    * (‖c‖²/2 − x·c), ties to the lowest code (ascending struct sort).
    * The composed-expression reference form — VectorPqSpec pins
    * [[pqEncode]] bit-identical to this shape.
    */
  private def pqCodeOf(sub: Column, cb: Array[Array[Double]]): Column =
    element_at(sort_array(array(cb.zipWithIndex.map { case (c, i) =>
      struct((lit(c.map(x => x * x).sum / 2) - dot(sub, typedLit(c.toSeq))).as("nd"),
        lit(i).as("i"))
    }: _*)), 1).getField("i")

  /** The composed slice/sort_array encoding — reference semantics for
    * the spec; not the hot path (the per-row expression forest is
    * numSubs × numCodes slices + dots plus a struct sort).
    */
  def pqEncodeComposed(vn: Column, cbs: Array[Array[Array[Double]]]): Column =
    array((0 until pqSubs).map(s =>
      pqCodeOf(slice(vn, s * pqSubDim + 1, pqSubDim), cbs(s)).cast("int")): _*)

  /** The full 8-code PQ encoding of a normalized vector column — one
    * codegen'd triple loop (graft.functions.PqEncode); the codebooks
    * travel as a foldable literal evaluated at plan time.
    */
  def pqEncode(vn: Column, cbs: Array[Array[Array[Double]]]): Column =
    call_function("pq_encode", vn,
      typedLit(cbs.map(_.map(_.toSeq).toSeq).toSeq))

  private def solePq: Option[Array[Array[Array[Double]]]] =
    if (pqMemo.size == 1) Some(pqMemo.values.head) else None

  /** Per-subspace argmin-code fragment over a normalized list column
    * `vn` — mirrors PqEncode exactly: nd = ‖c‖²/2 − dot (half embedded
    * as the SAME Scala-computed literal), ascending dot fold, ties to
    * the lowest code (ascending struct sort).
    */
  private def pqCodeSql(cbs: Array[Array[Array[Double]]], s: Int): String = {
    val lo = s * pqSubDim + 1
    val hi = s * pqSubDim + pqSubDim
    val entries = cbs(s).zipWithIndex.map { case (c, code) =>
      val half = java.lang.Double.toString(c.map(x => x * x).sum / 2)
      s"struct_pack(d := $half - ${dotSql(s"vn[$lo:$hi]", planeSqlLit(c))}, i := $code)"
    }.mkString(",\n      ")
    s"list_sort([$entries])[1].i"
  }

  /** ADC fragment: Σ_s lut[s][codes[s]] with the LUT dot recomputed
    * per (query subvector, selected centroid literal) — explicit
    * left-associative `+` chain preserving the Spark reduce order.
    */
  private def pqAdcSql(cbs: Array[Array[Array[Double]]]): String =
    (0 until pqSubs).map { s =>
      val lo = s * pqSubDim + 1
      val hi = s * pqSubDim + pqSubDim
      val cases = (0 until pqCodes).map { code =>
        s"WHEN $code THEN ${dotSql(s"q.qvn[$lo:$hi]", planeSqlLit(cbs(s)(code)))}"
      }.mkString("\n      ")
      s"(CASE t.codes[${s + 1}] $cases END)"
    }.mkString("\n    + ")

  val s04: Q = Q("s04_ann_pq_adc",
    (spark, dir) => s04Body(spark, dir),
    // trained-codebook inlining at dump time (see soleCentroids): the
    // oracle recomputes normalization, per-subspace argmin codes, the
    // ADC LUT scan, the topK×factor shortlist, and the exact re-rank
    () => solePq.map { cbs =>
      s"""WITH $vectorsCte,
         |enc AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e),
         |codes AS (SELECT vec_id,
         |    [${(0 until pqSubs).map(pqCodeSql(cbs, _)).mkString(",\n     ")}] AS codes
         |  FROM enc),
         |q AS (SELECT vec_id AS qid, list_transform(v, x -> x / nrm) AS qvn
         |      FROM e WHERE vec_id < $numQueries),
         |adc AS (
         |  SELECT q.qid, t.vec_id,
         |    ${pqAdcSql(cbs)} AS adc
         |  FROM q, codes t WHERE t.vec_id <> q.qid),
         |short AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY adc DESC, vec_id) AS rn FROM adc)
         |  WHERE rn <= ${topK * pqShortlistFactor}),
         |rerank AS (
         |  SELECT s.qid, s.vec_id,
         |    ${dotSql("qe.v", "te.v")} / (qe.nrm * te.nrm) AS cos
         |  FROM short s JOIN e te ON te.vec_id = s.vec_id
         |  JOIN e qe ON qe.vec_id = s.qid),
         |ranked AS (SELECT qid, vec_id, cos, row_number() OVER (
         |  PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM rerank)
         |SELECT qid, rank, vec_id AS neighbor_id, cos FROM ranked
         |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin
    })

  private def s04Body(spark: SparkSession, dir: String): DataFrame = {
    val cbs = trainedCodebooks(spark, dir)
    val e = vectors(spark, dir)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      .select(col("vec_id"), pqEncode(col("vn"), cbs).as("codes"))
    // bounded query set → LUTs built driver-side from 10 rows (the
    // sanctioned scalar/bounded collect, same contract as s01's
    // broadcast query batch): lut[sub][code] = q_sub · centroid
    val qRows = vectors(spark, dir).filter(col("vec_id") < numQueries)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
      .collect()
      .map { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1).toArray
        val lut = (0 until pqSubs).map { s =>
          cbs(s).map(c =>
            c.indices.foldLeft(0.0)((acc, d) => acc + qv(s * pqSubDim + d) * c(d))).toSeq
        }
        (qid, lut)
      }.toSeq
    import spark.implicits._
    val q = qRows.toDF("qid", "lut")
    // ADC scan: 8 LUT lookups + adds per (query, vector) — no vector
    // arithmetic at scan time
    val adc = (0 until pqSubs)
      .map(s => element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    // production PQ is two-stage: a WIDE approximate shortlist from the
    // code scan (topK × pqShortlistFactor per query, bounded-heap agg),
    // then EXACT re-rank of only those candidates against the full
    // vectors — quantization error decides membership of a 50-set, not
    // the final ranking, which is why coarse 4-bit codes still answer
    // top-5 well. The re-rank join touches shortlist·Q rows, not N.
    val shortlist = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), adc.as("adc"))
      .groupBy("qid")
      .agg(call_function("topk_agg",
        struct(col("adc").as("ord"), col("vec_id").as("id")),
        lit(topK * pqShortlistFactor)).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    val full = vectors(spark, dir)
    val qFull = full.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(full, "vec_id")
      .join(broadcast(qFull), "qid")
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------------
  // p05 — SEMANTIC DEDUP (the SemDeDup shape, Abbas et al. 2023): embed
  // → k-means cluster → near-dup edges WITHIN each cluster only →
  // connected components → keep one representative per component. The
  // k-means cells (reusing s03's trained index) bound candidate
  // generation to O(Σ |cell|²) instead of O(N²) — with cell count grown
  // ∝ corpus size, per-cell membership stays bounded and the pair join
  // is a plain hash join keyed by the cell id. Cross-cell near-dups are
  // the sanctioned recall loss (quantization boundary), exactly as in
  // the published pipeline; component assignment and representative
  // choice reuse d07's min-label machinery.
  //
  // k-means is data-derived → rows-only; SemanticDedupSpec pins that
  // the components match a brute-force recomputation of the same edge
  // set, representatives are component minima, and the keep flag
  // partitions the corpus.
  // ---------------------------------------------------------------------
  val semanticThreshold = 0.4

  /** Session memo of the cached p05 edge relation — same pattern (and
    * same 100 TB analogue: write the pair set once, read it per
    * consumer) as DedupQueries.edgesMemo for d07; released by
    * [[invalidateCaches]].
    */
  private val semanticEdgesMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** The within-cell near-dup edge set: (a, b) with a < b, cosine ≥
    * threshold, both in the same trained cell. Memoized+cached per
    * (session, dir): every label-propagation round of p05's connected
    * components re-reads this relation, so it must not be recomputed
    * per round or per invocation.
    */
  def semanticEdges(spark: SparkSession, dir: String): DataFrame =
    semanticEdgesMemo.getOrElseUpdate((spark, dir),
      semanticEdgesUncached(spark, dir).cache())

  /** The un-memoized edge computation: a cell-block scan (the s06/d05
    * pattern — one shuffle of N vectors keyed by cell, per-block dot
    * loop over in-memory primitive arrays), replacing the within-cell
    * self-join that copied both 64-double arrays through the exchange
    * for every candidate pair before the one dot that consumed them.
    * Emits exactly the join form's edge set — (a, b) with a < b, same
    * cell, cosine ≥ threshold, identical strict-fold dots —
    * SemanticDedupSpec pins the set equality. Per-task memory is the
    * largest cell's vectors plus its (threshold-sparse) edge output.
    */
  def semanticEdgesUncached(spark: SparkSession, dir: String): DataFrame = {
    val cs = trainedCentroids(spark, dir)
    import spark.implicits._
    val thr = semanticThreshold
    val typed = vectors(spark, dir)
      .withColumn("cell", cellOf(col("v"), cs))
      .select(col("vec_id").cast("long").as("_1"),
        col("cell").cast("int").as("_2"),
        col("v").as("_3"), col("nrm").cast("double").as("_4"))
      .as[(Long, Int, Array[Double], Double)]
    typed
      .repartition(col("_2"))
      .sortWithinPartitions(col("_2"), col("_1"))
      .mapPartitions { rows =>
        // Per-task memory = one cell block (vectors) + ONE OUTER ROW's
        // edges: edges stream per outer row instead of buffering the
        // whole block's O(|cell|²)-worst-case edge list (the ADVICE
        // straggler/OOM risk). Block residency itself is bounded by the
        // largest cell — k-means cells are skew-unbounded in principle,
        // but cell counts grow ∝ N (cellTargetSize) and a cell would
        // need ~10⁶× its 250-member target before vectors alone
        // threatened executor memory; the per-row edge buffer removes
        // the edge-list term, which was the part that grew with
        // within-cell similarity, not just cell size.
        val src = rows.buffered
        new Iterator[(Long, Long)] {
          private var block: Array[(Long, Int, Array[Double], Double)] = Array.empty
          private var i = 0 // outer-row cursor within block
          private val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          private var idx = 0
          private def advance(): Unit =
            while (idx >= out.length && (i < block.length || src.hasNext)) {
              if (i >= block.length) {
                val cell = src.head._2
                val buf =
                  scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Double], Double)]
                while (src.hasNext && src.head._2 == cell)
                  buf += src.next()
                block = buf.toArray
                i = 0
              } else {
                out.clear(); idx = 0
                edgeRow(block, i, thr, out)
                i += 1
              }
            }
          override def hasNext: Boolean = { advance(); idx < out.length }
          override def next(): (Long, Long) = {
            advance()
            val r = out(idx); idx += 1; r
          }
        }
      }
      .toDF("a", "b")
  }

  /** Threshold edges of ONE outer row `i` against the rest of its cell
    * block: every (a, b), a = id_i < b, with cosine ≥ thr — the same
    * ascending-fold dot ÷ norms the join form evaluates. Rows arrive
    * sorted by vec_id, so i < j implies id_i < id_j and the half loop
    * emits each pair once, a < b, in the same (i, j) order the old
    * whole-block form produced.
    */
  private def edgeRow(block: Array[(Long, Int, Array[Double], Double)],
      i: Int,
      thr: Double,
      out: scala.collection.mutable.ArrayBuffer[(Long, Long)]): Unit = {
    val n = block.length
    val (ida, _, va, na) = block(i)
    var j = i + 1
    while (j < n) {
      val (idb, _, vb, nb) = block(j)
      val len = math.min(va.length, vb.length)
      var s = 0.0
      var t = 0
      while (t < len) { s += va(t) * vb(t); t += 1 }
      if (s / (na * nb) >= thr) out += ((ida, idb))
      j += 1
    }
  }

  /** The superseded self-join edge form — kept as the declarative
    * reference SemanticDedupSpec pins the block scan against.
    */
  def semanticEdgesJoinForm(spark: SparkSession, dir: String): DataFrame = {
    val cs = trainedCentroids(spark, dir)
    val e = vectors(spark, dir).withColumn("cell", cellOf(col("v"), cs))
    val a = e.select(col("vec_id").as("a"), col("cell"),
      col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("vec_id").as("b"), col("cell"),
      col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, Seq("cell"))
      .filter(col("a") < col("b"))
      .filter(dot(col("av"), col("bv")) / (col("an") * col("bn"))
        >= semanticThreshold)
      .select("a", "b")
  }

  val p05: Q = Q("p05_semantic_dedup",
    (spark, dir) => {
      val cs = trainedCentroids(spark, dir)
      val e = vectors(spark, dir).withColumn("cell", cellOf(col("v"), cs))
      val comps = DedupQueries.connectedComponents(
        e.select(col("vec_id").as("doc_id")), semanticEdges(spark, dir))
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
      e.select(col("vec_id"), col("cell").cast("long").as("cell"))
        .join(comps, "vec_id")
        .select(col("vec_id"), col("cell"), col("cluster_id"),
          when(col("cluster_id") === col("vec_id"), 1L).otherwise(0L).as("keep"))
        .orderBy("vec_id")
    },
    // trained-constant inlining at dump time — see soleCentroids: the
    // oracle recomputes cell assignment, the within-cell edge set, the
    // transitive closure (d07's recursive-CTE pattern) and the
    // representative choice end to end
    () => soleCentroids.map { cs =>
      s"""WITH RECURSIVE $vectorsCte,
         |${cellsRankedCte(cs)},
         |b AS (SELECT vec_id, v, nrm, CAST(cells[1].i AS BIGINT) AS cell FROM r),
         |sim AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  WHERE ${dotSql("x.v", "y.v")} / (x.nrm * y.nrm) >= $semanticThreshold),
         |edges AS (SELECT a, b FROM sim UNION ALL SELECT b AS a, a AS b FROM sim),
         |reach(src, dst) AS (
         |  SELECT vec_id AS src, vec_id AS dst FROM embeddings
         |  UNION
         |  SELECT r2.src, e2.b AS dst FROM reach r2 JOIN edges e2 ON r2.dst = e2.a)
         |SELECT b.vec_id, b.cell, c.cluster_id,
         |  CAST(CASE WHEN c.cluster_id = b.vec_id THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM b JOIN (
         |  SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY 1) c
         |  USING (vec_id)
         |ORDER BY vec_id""".stripMargin
    })

  // ---------------------------------------------------------------------
  // s05 — MMR-diversified retrieval (Carbonell & Goldstein 1998): from
  // each query's EXACT cosine top-`mmrPool` candidates, greedily select
  // `mmrK` results maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
  // the diversified re-rank stage between ANN shortlist and consumer.
  // Two stages: (1) the s01 shortlist shape (broadcast query batch ×
  // corpus, rank window) bounds each query's pool to mmrPool rows;
  // (2) the greedy runs per query over its COLLECTED pool — a genuine
  // per-group sequential loop (each pick depends on all previous picks),
  // O(k·pool·dim) on ≤ mmrPool rows, so a Scala UDF over
  // collect_list is the honest realization (this is not a per-row hot
  // path; the per-row work all happened in stage 1's codegen'd dots).
  // At 100 TB the pool bound is what matters: state per query is
  // mmrPool·dim doubles, grouped and distributed by qid — never a
  // driver collect.
  //
  // The greedy IS SQL-expressible — as a recursive CTE whose recursive
  // term carries the selected (ids, unit-vectors) lists and picks the
  // per-step argmax via a LATERAL ORDER BY/LIMIT 1 — so s05 is fully
  // DuckDB-oracled (round-5 upgrade from rows-only): same strict-fold
  // dots, the same (1−λ) double constant Scala computes, ties to the
  // smaller id, empty-set similarity 0. Round5Spec additionally pins
  // first-pick = exact NN and a plain-Scala greedy recomputation.
  // ---------------------------------------------------------------------
  val mmrPool = 20
  val mmrK = 5
  val mmrLambda = 0.7

  /** One MMR selection: rank (1-based), the picked neighbor, its MMR
    * objective value at pick time, and its plain relevance cosine.
    */
  final case class MmrPick(rank: Long, neighbor_id: Long, mmr: Double, cos: Double)

  /** Greedy MMR over (cos, id, unitVec) candidates — deterministic:
    * Double total order, ties to the smaller id.
    */
  def mmrSelect(cands: Seq[(Double, Long, Array[Double])], k: Int,
      lambda: Double): Seq[MmrPick] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (out.length < k && remaining.nonEmpty) {
      var bestI = -1
      var bestScore = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val (cos, id, vu) = remaining(i)
        // true max similarity to the selected set (may be negative);
        // empty-S convention: 0, so the first pick is pure relevance
        var maxSim = if (picked.isEmpty) 0.0 else Double.NegativeInfinity
        picked.foreach { case (_, su) =>
          var d = 0.0
          var j = 0
          while (j < vu.length) { d += vu(j) * su(j); j += 1 }
          if (d > maxSim) maxSim = d
        }
        val score = lambda * cos - (1 - lambda) * maxSim
        val c = java.lang.Double.compare(score, bestScore)
        if (c > 0 || (c == 0 && id < bestId)) {
          bestScore = score; bestI = i; bestId = id
        }
        i += 1
      }
      val (cos, id, vu) = remaining.remove(bestI)
      picked += ((id, vu))
      out += MmrPick(out.length + 1L, id, bestScore, cos)
    }
    out.toSeq
  }

  val s05 = Q("s05_mmr_diversify", {
    val lam = java.lang.Double.toString(mmrLambda)
    val oneMinus = java.lang.Double.toString(1 - mmrLambda)
    s"""WITH RECURSIVE $vectorsCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.qid, e.vec_id, ${dotSql("q.qv", "e.v")} / (q.qn * e.nrm) AS cos,
       |    list_transform(e.v, x -> x / e.nrm) AS vu
       |  FROM q, e WHERE e.vec_id <> q.qid),
       |pool AS (SELECT qid, vec_id, cos, vu FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) WHERE rn <= $mmrPool),
       |sel(qid, step, ids, vus, picked_id, picked_mmr, picked_cos) AS (
       |  SELECT DISTINCT qid, 0, CAST([] AS BIGINT[]), CAST([] AS DOUBLE[][]),
       |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM pool
       |  UNION ALL
       |  SELECT s.qid, s.step + 1, list_append(s.ids, w.vec_id),
       |    list_append(s.vus, w.vu), w.vec_id, w.score, w.cos
       |  FROM sel s JOIN LATERAL (
       |    SELECT cand.vec_id, cand.cos, cand.vu,
       |      $lam * cand.cos - $oneMinus * COALESCE(list_max(
       |        list_transform(s.vus, sv -> ${dotSql("cand.vu", "sv")})), CAST(0 AS DOUBLE)) AS score
       |    FROM pool cand WHERE cand.qid = s.qid AND NOT list_contains(s.ids, cand.vec_id)
       |    ORDER BY score DESC, cand.vec_id LIMIT 1) w ON true
       |  WHERE s.step < $mmrK)
       |SELECT qid, CAST(step AS BIGINT) AS rank, picked_id AS neighbor_id,
       |  picked_mmr AS mmr, picked_cos AS cos
       |FROM sel WHERE step >= 1 ORDER BY qid, rank""".stripMargin
  }) { (spark, dir) =>
    import spark.implicits._
    val e = vectors(spark, dir)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    // rank on the scalar cosine ONLY — the Q×N rank shuffle carries
    // (qid, vec_id, cos); unit vectors attach AFTER the mmrPool filter
    // (Q×mmrPool rows) via a broadcast join back to the corpus, so no
    // 64-double array ever rides the wide shuffle or is normalized per
    // (query, vector) pair
    val shortlist = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= mmrPool)
    val pool = e
      .join(broadcast(shortlist), "vec_id")
      .select(col("qid"), col("vec_id"), col("cos"),
        transform(col("v"), x => x / col("nrm")).as("vu"))
    val greedy = udf { cands: Seq[org.apache.spark.sql.Row] =>
      mmrSelect(cands.map(r => (r.getDouble(0), r.getLong(1),
        r.getSeq[Double](2).toArray)), mmrK, mmrLambda)
    }
    pool
      .groupBy("qid")
      .agg(collect_list(struct(col("cos"), col("vec_id"), col("vu"))).as("cands"))
      .select(col("qid"), explode(greedy(col("cands"))).as("pick"))
      .select(col("qid"), col("pick.rank").as("rank"),
        col("pick.neighbor_id").as("neighbor_id"),
        col("pick.mmr").as("mmr"), col("pick.cos").as("cos"))
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------------
  // p10 — SEMANTIC decontamination: flag every corpus vector whose best
  // cosine against a held-out benchmark/eval embedding set reaches the
  // near-dup threshold — the embedding-space twin of p06's n-gram
  // decontamination (catches paraphrased eval leakage that shares no
  // shingle). The benchmark set is bounded (the first `numBench` ids
  // stand in for an eval suite's embeddings), so it BROADCASTS and the
  // corpus streams through one map-side scan — O(N·|bench|) with no
  // shuffle except the per-vector top-1 aggregation, which the
  // bounded-heap topk_agg partial-combines map-side (k=1: each
  // partition forwards exactly one candidate per vector). The exact
  // linear-scan shape (s01's) is right here because |bench| is small;
  // at larger eval suites the s02/s03 bucketed variants apply
  // unchanged. Ties (equal cosine) resolve to the smaller benchmark id
  // — topk_agg's total order, mirrored by the oracle's rank window.
  // ---------------------------------------------------------------------
  private val numBench = 20
  val decontThreshold = 0.4

  val p10 = Q("p10_embed_decontaminate",
    s"""WITH $vectorsCte,
       |bm AS (SELECT vec_id AS bid, v AS bv, nrm AS bn FROM e
       |       WHERE vec_id < $numBench),
       |pairs AS (
       |  SELECT e.vec_id, bm.bid, ${dotSql("e.v", "bm.bv")} / (e.nrm * bm.bn) AS cos
       |  FROM e, bm WHERE e.vec_id >= $numBench),
       |ranked AS (SELECT vec_id, bid, cos, row_number() OVER (
       |  PARTITION BY vec_id ORDER BY cos DESC, bid) AS rn FROM pairs)
       |SELECT vec_id, bid AS contaminated_by, cos AS max_cos,
       |  CAST(CASE WHEN cos >= $decontThreshold THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
       |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  ) { (spark, dir) =>
    val e = vectors(spark, dir)
    val bm = e.filter(col("vec_id") < numBench)
      .select(col("vec_id").as("bid"), col("v").as("bv"), col("nrm").as("bn"))
    e.filter(col("vec_id") >= numBench)
      .join(broadcast(bm), col("vec_id") =!= col("bid"))
      .select(col("vec_id"), col("bid"),
        (dot(col("v"), col("bv")) / (col("nrm") * col("bn"))).as("cos"))
      .groupBy("vec_id")
      .agg(call_function("topk_agg",
        struct(col("cos").as("ord"), col("bid").as("id")), lit(1)).as("top"))
      .select(col("vec_id"), element_at(col("top"), 1).as("t"))
      .select(col("vec_id"), col("t.id").as("contaminated_by"),
        col("t.ord").as("max_cos"),
        when(col("t.ord") >= decontThreshold, 1L).otherwise(0L).as("is_contaminated"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // s06 — k-NN GRAPH build: every vector's exact top-k neighbors WITHIN
  // its trained IVF cell (s03's k-means index bounds the candidate set,
  // exactly as in SemDeDup/graph-based filtering pipelines that consume
  // a kNN graph rather than ad-hoc queries). Output is the ranked
  // adjacency list (vec_id, rank, neighbor_id, cos).
  //
  // Realized as a CELL-BLOCK SCAN (the d05 pattern): ONE shuffle of the
  // N vectors keyed by cell, a within-partition sort, and a streaming
  // per-block top-k scan. The earlier salted self-join form was
  // measured memcpy-bound at sf1 — every one of its 12.5M joined rows
  // copied two 64-double arrays through the exchange+SMJ before the
  // one dot that consumed them (52 s under 16 cells, 10.6 s under 80)
  // — while the block scan reads each vector into task memory ONCE and
  // runs the O(|cell|²·dim) dot loop in place: 1.3 s at sf1, output
  // bit-identical (Round8Spec pins it against the plain window form).
  //
  // 100 TB posture: cell is the partition key and the cell count grows
  // ∝ corpus (cellTargetSize), so parallelism scales with the data and
  // per-task memory is the largest single cell's vectors (blocks
  // buffer one at a time off the sorted iterator, like d05). Per-cell
  // work is the same Σ|cell|² the within-cell semantics define —
  // bounded per cell by the index growth, linear in N overall.
  //
  // Bit-compatibility with the join/window form: cosines are the same
  // strict ascending fold ÷ (‖a‖·‖b‖) ArrayDot computes, the top-k
  // comparator is (cos DESC, id ASC) under java.lang.Double.compare
  // (NaN-largest, Spark's double ordering), and singleton cells emit
  // nothing, exactly like the self-join. Centroids are data-derived →
  // oracle inlines the trained constants at dump time (soleCentroids),
  // like s03/p05.
  // ---------------------------------------------------------------------
  val knnK = 3

  val s06: Q = Q("s06_knn_graph",
    (spark, dir) => s06Body(spark, dir),
    () => soleCentroids.map { cs =>
      s"""WITH $vectorsCte,
         |${cellsRankedCte(cs)},
         |b AS (SELECT vec_id, v, nrm, CAST(cells[1].i AS BIGINT) AS cell FROM r),
         |pairs AS (
         |  SELECT a.vec_id, t.vec_id AS nb, ${dotSql("a.v", "t.v")} / (a.nrm * t.nrm) AS cos
         |  FROM b a JOIN b t USING (cell) WHERE t.vec_id <> a.vec_id),
         |ranked AS (SELECT vec_id, nb, cos, row_number() OVER (
         |  PARTITION BY vec_id ORDER BY cos DESC, nb) AS rank FROM pairs)
         |SELECT vec_id, rank, nb AS neighbor_id, cos FROM ranked
         |WHERE rank <= $knnK ORDER BY vec_id, rank""".stripMargin
    })

  private def s06Body(spark: SparkSession, dir: String): DataFrame = {
    val cs = trainedCentroids(spark, dir)
    import spark.implicits._
    val typed = vectors(spark, dir)
      .withColumn("cell", cellOf(col("v"), cs))
      .select(col("vec_id").cast("long").as("_1"),
        col("cell").cast("int").as("_2"),
        col("v").as("_3"), col("nrm").cast("double").as("_4"))
      .as[(Long, Int, Array[Double], Double)]
    val scanned = typed
      .repartition(col("_2"))
      .sortWithinPartitions(col("_2"), col("_1"))
      .mapPartitions { rows =>
        // one consecutive-cell block in memory at a time (d05's
        // streaming discipline): per-task memory is max(cell), not
        // Σ(cells hashed to the partition)
        val src = rows.buffered
        new Iterator[(Long, Long, Long, Double)] {
          private var out =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
          private var idx = 0
          private def advance(): Unit =
            while (idx >= out.length && src.hasNext) {
              val cell = src.head._2
              val block =
                scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Double], Double)]
              while (src.hasNext && src.head._2 == cell)
                block += src.next()
              out = scala.collection.mutable.ArrayBuffer.empty
              idx = 0
              knnBlock(block.toArray, knnK, out)
            }
          override def hasNext: Boolean = { advance(); idx < out.length }
          override def next(): (Long, Long, Long, Double) = {
            advance()
            val r = out(idx); idx += 1; r
          }
        }
      }
    scanned.toDF("vec_id", "rank", "neighbor_id", "cos")
      .orderBy("vec_id", "rank")
  }

  /** Exact top-k neighbors for every vector of one cell block: the
    * O(n²·dim) dot loop over in-memory primitive arrays, selection by
    * (cos DESC, id ASC) via a k-slot insertion (k is small). Emits
    * (vec_id, rank, neighbor_id, cos) rows, rank 1-based, ≤ k per
    * vector (fewer in cells smaller than k+1; singletons emit nothing —
    * self-join parity).
    */
  private def knnBlock(block: Array[(Long, Int, Array[Double], Double)], k: Int,
      out: scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]): Unit = {
    val n = block.length
    if (n < 2) return
    var i = 0
    while (i < n) {
      val (id, _, v, nrm) = block(i)
      val topCos = new Array[Double](k)
      val topId = new Array[Long](k)
      var filled = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          val (jid, _, jv, jn) = block(j)
          val len = math.min(v.length, jv.length)
          var s = 0.0
          var t = 0
          while (t < len) { s += v(t) * jv(t); t += 1 }
          val cos = s / (nrm * jn)
          // insertion position under (cos DESC, id ASC); NaN-largest
          // via java.lang.Double.compare, matching Spark's ordering
          var p = filled
          while (p > 0 && {
            val c = java.lang.Double.compare(cos, topCos(p - 1))
            c > 0 || (c == 0 && jid < topId(p - 1))
          }) p -= 1
          if (p < k) {
            val last = math.min(filled, k - 1)
            var q = last
            while (q > p) { topCos(q) = topCos(q - 1); topId(q) = topId(q - 1); q -= 1 }
            topCos(p) = cos
            topId(p) = jid
            if (filled < k) filled += 1
          }
        }
        j += 1
      }
      var r = 0
      while (r < filled) {
        out += ((id, (r + 1).toLong, topId(r), topCos(r)))
        r += 1
      }
      i += 1
    }
  }

  val all: Seq[Q] = Seq(s01, s02, s03, s04, s05, s06, s07, d05, p05, p10)
}
