package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.CustomFunctions
import graft.ops.VectorQueries.{dot, norm}

/** Streaming twin of the s01 brute-force ANN baseline: a STREAM of
  * query vectors ranked against a static embedding corpus — the online
  * retrieval shape (each arriving query is answered once, in its
  * micro-batch) of the batch query-set join.
  *
  * Plan shape: stream-static join (the static corpus side is a plain
  * relation — Catalyst broadcasts it when it fits, exactly as in the
  * batch plan), cosine via the same codegen'd `array_dot` expression as
  * s01, then the single-pass bounded-heap `topk_agg` per query — the
  * grouped-top-k shape that keeps ≤ k candidates per query per
  * partition BEFORE the shuffle (row_number windows are unsupported on
  * streams, and would sort every candidate anyway). Each query's state
  * is one k-entry heap; with an event-time watermark on the query
  * stream the state is dropped after emission (append mode), without
  * one it lives in update-mode state — at unbounded query volume,
  * attach the watermark. Scale: corpus size bounds the per-batch scan
  * (distribute the corpus side by any partitioning when it outgrows a
  * broadcast — the agg shape is unchanged); query volume only grows
  * state by k rows per query.
  *
  * StreamAnnSpec pins the streamed answer bit-for-bit (ranks AND
  * cosines) against the batch s01 output for the same query set.
  */
object StreamAnn {

  /** Normalize a raw embeddings relation to the corpus side's shape:
    * (vec_id, v: array<double>, nrm).
    */
  def corpusOf(embeddings: DataFrame): DataFrame = {
    CustomFunctions.register(embeddings.sparkSession)
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
  }

  /** Top-k cosine neighbors per streamed query: one row per query with
    * rank-ordered `top.ord` (cosines) / `top.id` (neighbor ids), ties
    * broken by ascending id — the exact ordering contract of batch s01.
    */
  def topNeighbors(queries: Dataset[QueryVec], corpus: DataFrame,
      k: Int): DataFrame = {
    CustomFunctions.register(queries.sparkSession)
    queries.toDF()
      .withColumn("qn", norm(col("qv")))
      .join(corpus, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .groupBy("qid")
      .agg(call_function("topk_agg",
        struct(col("cos").as("ord"), col("vec_id").as("id")),
        lit(k)).as("top"))
  }
}

/** One streamed query vector. */
case class QueryVec(qid: Long, qv: Array[Double])
