package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorQueries

/** Semantic dedup (p05, the SemDeDup shape): the trained-cell edge set
  * matches a brute-force recomputation, components are exact connected
  * components of that edge set, representatives are component minima,
  * and the keep flag partitions the corpus into one keeper per
  * component.
  */
class SemanticDedupSpec extends SparkSpec {

  private lazy val rows =
    VectorQueries.p05.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** Brute-force recomputation of the within-cell edge set on the
    * driver: same cells (trained centroids), same cosine threshold.
    */
  private lazy val bruteEdges: Set[(Long, Long)] = {
    val cs = VectorQueries.trainedCentroids(spark, sf)
    val vs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cellOf(v: Array[Double]): Int = {
      // mirror of VectorQueries.cellOf: descending (dot, idx) struct
      // sort → max dot, ties to the LARGER cell index
      val ds = cs.map(c => dotd(v, c))
      ds.zipWithIndex.maxBy { case (d, i) => (d, i) }._2
    }
    val byCell = vs.groupBy { case (_, v) => cellOf(v) }
    byCell.values.flatMap { ms =>
      val members = ms.toSeq
      for {
        (a, av) <- members; (b, bv) <- members if a < b
        cos = dotd(av, bv) / (math.sqrt(dotd(av, av)) * math.sqrt(dotd(bv, bv)))
        if cos >= VectorQueries.semanticThreshold
      } yield (a, b)
    }.toSet
  }

  private def bruteComponents(ids: Seq[Long], edges: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("p05 edge set matches the brute-force within-cell recomputation") {
    val sparkEdges = VectorQueries.semanticEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sparkEdges == bruteEdges)
    assert(sparkEdges.nonEmpty, "fixture produced no semantic near-dup edges")
  }

  test("p05 block-scan edges equal the superseded self-join form") {
    val scan = VectorQueries.semanticEdgesUncached(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val join = VectorQueries.semanticEdgesJoinForm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scan == join)
  }

  test("p05 cluster ids are the exact connected components of the edge set") {
    val expect = bruteComponents(rows.map(_._1).toSeq, bruteEdges)
    rows.foreach { case (id, _, cid, _) =>
      assert(cid == expect(id), s"vec $id: component $cid, expected ${expect(id)}")
    }
  }

  test("p05 keep flag marks exactly the component minima") {
    val byComp = rows.groupBy(_._3)
    byComp.foreach { case (cid, members) =>
      val keepers = members.filter(_._4 == 1L).map(_._1).toSeq
      assert(keepers == Seq(cid),
        s"component $cid keeps ${keepers.mkString(",")} (representative must be the min id = cid)")
      assert(members.map(_._1).min == cid)
    }
    // covers the whole corpus, one row per vector
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length.toLong == n)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("p05 dedup actually removes something on the fixture") {
    val kept = rows.count(_._4 == 1L)
    assert(kept < rows.length, "no vector was deduplicated — threshold fixture broken")
  }
}
