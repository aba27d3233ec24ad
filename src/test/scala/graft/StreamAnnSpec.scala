package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.VectorQueries
import graft.streaming.{QueryVec, StreamAnn}

/** Streaming ANN twin: queries streamed over two micro-batches against
  * the static embedding corpus reproduce batch s01's exact ranks and
  * cosines.
  */
class StreamAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streamed query top-k equals batch s01 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = StreamAnn.corpusOf(emb).cache()
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("v"))
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) => QueryVec(id, v) }.sortBy(_.qid)
    val (first, second) = queries.splitAt(5)

    val source = MemoryStream[QueryVec]
    val q = StreamAnn.topNeighbors(source.toDS(), corpus, VectorQueries.topK)
      .writeStream.format("memory").queryName("sann")
      .outputMode("update")
      .start()
    try {
      source.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(spark.table("sann").select("qid").distinct().count() === 5)
      source.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()

      // latest row per qid, flattened to (qid, rank, neighbor, cos)
      val got = spark.table("sann")
        .groupBy("qid").agg(last("top").as("top"))
        .select(col("qid"), posexplode(arrays_zip(col("top.ord"), col("top.id"))))
        .select(col("qid"), (col("pos") + 1).as("rank"),
          col("col.id").as("neighbor_id"), col("col.ord").as("cos"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val expected = VectorQueries.s01.fn(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }
}
