package graft.streaming

import java.time.Duration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.ops.TextQueries

/** Online corpus intake: the batch training-data pipeline's front half
  * (p01 corpus clean → d01 exact dedup → d03 near-dup candidates)
  * composed over a document STREAM — what continuous crawl/ingest
  * feeds before anything reaches a training mix.
  *
  * Stage reuse is literal, not parallel-maintained: the quality gate
  * applies the batch [[TextQueries.qualityExpr]] column expression and
  * threshold unchanged (stateless transforms bind to a streaming
  * DataFrame as-is), exact dedup is streaming `dropDuplicates` on the
  * same md5 content hash the batch d01/p01 group on, and near-dup
  * candidates come from [[StreamDedup]] (banding bit-identical to batch
  * d03). StreamPipelineSpec pins each stage against its batch
  * counterpart on the same corpus.
  *
  * Scale shape: gate is map-only; exact dedup is one shuffle on the
  * content hash with per-key state of one marker row (swap in
  * `dropDuplicatesWithinWatermark` to bound that state when the stream
  * carries event time); candidate generation is [[StreamDedup]]'s
  * TTL'd band-bucket state. Nothing collects, nothing is all-pairs.
  */
object StreamPipeline {

  /** Quality + language gate, then first-arrival exact dedup: emits
    * each surviving document once, with its quality score and content
    * hash. Survivor hash-set equals the batch p01 `kept`-distinct
    * relation; WHICH duplicate survives is arrival order (batch keeps
    * min doc_id — feed ordered streams to make them coincide).
    */
  def intake(docs: Dataset[StreamCorpusDoc],
      langs: Seq[String] = Seq("en", "es"),
      threshold: Double = TextQueries.qualityThreshold): Dataset[CleanDoc] = {
    import docs.sparkSession.implicits._
    graft.functions.CustomFunctions.register(docs.sparkSession)
    docs.toDF()
      .withColumn("w", split(col("text"), " "))
      .filter(col("lang").isin(langs: _*) &&
        TextQueries.qualityExpr(col("w")) >= threshold)
      .select(col("doc_id"), col("text"), col("lang"),
        TextQueries.qualityExpr(col("w")).as("quality"),
        md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
      .as[CleanDoc]
  }

  /** Full intake → near-dup candidate pairs among the gated, exact-
    * deduped survivors (the batch-ladder order: cheap exact dedup
    * first, so LSH state never holds byte-identical copies).
    */
  def nearDupCandidates(docs: Dataset[StreamCorpusDoc],
      ttl: Duration = Duration.ofHours(24),
      maxBucket: Int = 10000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    StreamDedup.candidates(
      intake(docs).map(d => StreamDoc(d.doc_id, d.text)), ttl, maxBucket)
  }

  /** The production tail: intake survivors land as SHARDED PARQUET —
    * the continuous-corpus write shape a training pipeline consumes
    * (one reader per shard). Shard = the batch p11 seeded assignment
    * ([[TextQueries.shardOf]] — same seed ⇒ a doc lands in the same
    * shard whether it arrived by stream or batch), written per
    * micro-batch via `foreachBatch` + `partitionBy(shard)` so each
    * trigger appends only the shard directories it touched and the
    * batch writer's layout/compaction features apply unchanged.
    *
    * Scale shape: the sink adds NO new shuffle — intake's content-hash
    * dedup is the stage boundary, and the partitioned append fans each
    * task's rows into its shard files (at most numShards files per
    * task per trigger; a real deployment sizes triggers so shard files
    * land at compaction-friendly sizes, or runs the same `compact`
    * merge the Cardano path uses). Exactly-once: parquet appends are
    * tracked per batchId in the checkpoint — a replayed batch
    * re-appends, so the sink inherits foreachBatch's at-least-once
    * contract; readers dedup on doc_id or the pipeline runs with the
    * default parquet streaming sink when strict exactly-once matters
    * more than writer features.
    */
  def shardedSink(docs: Dataset[StreamCorpusDoc],
      outDir: String,
      checkpointDir: String,
      numShards: Int = TextQueries.numShards,
      seed: String = "s42",
      langs: Seq[String] = Seq("en", "es"),
      threshold: Double = TextQueries.qualityThreshold)
      : org.apache.spark.sql.streaming.StreamingQuery =
    intake(docs, langs, threshold)
      .toDF()
      .withColumn("shard", TextQueries.shardOf(col("doc_id"), seed, numShards))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("shard").parquet(outDir)
      }
      .start()
}

/** One streamed corpus document (pre-gate). */
case class StreamCorpusDoc(doc_id: Long, text: String, lang: String)

/** One gated, exact-deduped survivor. */
case class CleanDoc(doc_id: Long, text: String, lang: String,
    quality: Double, content_hash: String)
