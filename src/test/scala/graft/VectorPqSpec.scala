package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorQueries

/** Product-quantized ANN (s04): encoding determinism, ADC fidelity to
  * the true cosine, and recall against the exact brute-force answer.
  */
class VectorPqSpec extends SparkSpec {

  private def exactTop(dir: String): Map[Long, Seq[Long]] =
    VectorQueries.s01.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }

  test("top_cells codegen expression equals the composed sort_array ranking") {
    graft.functions.CustomFunctions.register(spark)
    val cs = VectorQueries.trainedCentroids(spark, sf)
    val e = graft.io.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Seq(1, 2, 5).foreach { k =>
      val got = e.select(col("vec_id"),
          VectorQueries.topCells(col("v"), cs, k).as("cells"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
      val want = e.select(col("vec_id"),
          slice(transform(VectorQueries.cellRanking(col("v"), cs),
            _.getField("i")), 1, k).as("cells"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
      assert(got.toSeq === want.toSeq, s"k=$k")
    }
  }

  test("s04 PQ output is deterministic across invocations") {
    val a = VectorQueries.s04.fn(spark, sf).collect().toSeq
    val b = VectorQueries.s04.fn(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("blockNearestNeighbors equals the all-pairs join + rank window bit-for-bit") {
    import spark.implicits._
    graft.functions.CustomFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val base = (0L until 240L).map { i =>
      (i, rnd.nextInt(6), Array.fill(8)(rnd.nextGaussian()))
    }
    val rows = base.map { case (i, l, v) =>
      if (i % 10 == 3) (i, l, base((i - 1).toInt)._3) // exact duplicate → cos 1.0 tie
      else (i, l, v)
    } :+ ((999L, 99, Array.fill(8)(rnd.nextGaussian()))) // singleton block
    val e = rows.toDF("vec_id", "label", "v")
      .withColumn("nrm", VectorQueries.norm(col("v")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)), r.getLong(4))
      }.toSeq
    val fast = canon(VectorQueries.blockNearestNeighbors(e))
    val naive = canon(VectorQueries.blockNearDupNaive(e))
    assert(fast.nonEmpty)
    assert(!fast.map(_._1).contains(999L)) // singleton emits nothing
    assert(fast === naive)
  }

  test("blockNearestNeighbors streams partitions holding MANY label blocks correctly") {
    import spark.implicits._
    // 40 labels over 4 shuffle partitions → every partition holds
    // several consecutive-label blocks; the block-at-a-time scan must
    // segment them exactly (no cross-block candidates, none skipped)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map(i => (i, (i % 40).toInt,
      Array.fill(6)(rnd.nextGaussian())))
    val e = rows.toDF("vec_id", "label", "v")
      .withColumn("nrm", VectorQueries.norm(col("v")))
    // confirm the premise: some task really does see multiple blocks
    val blocksPerPartition = e
      .repartition(col("label")).select("label")
      .mapPartitions(it => Iterator.single(it.map(_.getInt(0)).toSet.size))
      .collect()
    assert(blocksPerPartition.exists(_ > 1),
      s"premise broken: one block per partition (${blocksPerPartition.toSeq})")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)), r.getLong(4))
      }.toSeq
    val fast = canon(VectorQueries.blockNearestNeighbors(e))
    assert(fast.size === 400)
    assert(fast === canon(VectorQueries.blockNearDupNaive(e)))
  }

  test("s04 re-ranked scores are the true cosines (quantization only picks the shortlist)") {
    val rows = VectorQueries.s04.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    rows.foreach { case (q, n, c) =>
      assert(math.abs(c - cos(e(q), e(n))) < 1e-9, s"($q,$n): $c not the true cosine")
    }
  }

  test("s04 recall@5 vs exact s01 clears the floor") {
    val exact = exactTop(sf)
    val pq = VectorQueries.s04.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = exact.map { case (q, top) =>
      top.count(pq(q)).toDouble / top.length
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean (${recalls.mkString(", ")})")
  }

  test("pq codes are within range and codebooks have the declared shape") {
    val cbs = VectorQueries.trainedCodebooks(spark, sf)
    assert(cbs.length == 8 && cbs.forall(_.length == 16) &&
      cbs.forall(_.forall(_.length == 8)))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.ops.VectorQueries.dot(col("v"), col("v"))))
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
      .select(VectorQueries.pqEncode(col("vn"), cbs).as("codes"))
    val bad = e.filter(exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("codegen'd pq_encode is bit-identical to the composed sort_array argmin") {
    val cbs = VectorQueries.trainedCodebooks(spark, sf)
    val vn = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.ops.VectorQueries.dot(col("v"), col("v"))))
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
    val diff = vn
      .select(col("vec_id"),
        VectorQueries.pqEncode(col("vn"), cbs).as("fast"),
        VectorQueries.pqEncodeComposed(col("vn"), cbs).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0)
  }
}
