package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Tables.table

/** Typed `Dataset[T]` API surface over the `documents` table — the
  * compile-time-checked face of the engine (the other query families
  * use the dynamic `DataFrame` face).
  *
  * Design rules for the typed surface at 100 TB:
  *   - Row-shape is a case class ([[Document]]) with a derived encoder:
  *     Tungsten keeps rows serialized; `.as[Document]` is free (no
  *     conversion — it only binds the schema).
  *   - Filters and projections stay COLUMN EXPRESSIONS even on a typed
  *     Dataset: a typed lambda (`.filter(_.nChars > x)`) deserializes
  *     every row and blinds Catalyst (no parquet pushdown, no codegen
  *     fusion). The spec pins that q32's scan keeps its PushedFilters.
  *   - Custom aggregation logic is an [[Aggregator]][IN, BUF, OUT]
  *     (here [[DocStatsAgg]]): it participates in partial aggregation
  *     (map-side combine before the shuffle), unlike any RDD-style
  *     `groupByKey(...).mapValues` which would shuffle raw rows.
  */
object TypedDocs {

  /** Typed row of the `documents` table (TESTDATA.md schema). */
  final case class Document(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long)

  /** Per-source corpus statistics (all integral — exact cross-engine). */
  final case class DocStats(n_docs: Long, total_chars: Long, max_chars: Long)

  /** Typed custom aggregate: per-group document statistics in one pass.
    * Buffer and output are the same case class; merge is associative and
    * commutative, so Spark plans partial aggregation (map-side combine)
    * exactly as it would for a builtin — the shuffle carries one
    * 3-long buffer per (partition, key), not rows.
    */
  object DocStatsAgg extends Aggregator[Document, DocStats, DocStats] {
    override def zero: DocStats = DocStats(0L, 0L, Long.MinValue)
    override def reduce(b: DocStats, d: Document): DocStats =
      DocStats(b.n_docs + 1, b.total_chars + d.n_chars,
        math.max(b.max_chars, d.n_chars))
    override def merge(a: DocStats, b: DocStats): DocStats =
      DocStats(a.n_docs + b.n_docs, a.total_chars + b.total_chars,
        math.max(a.max_chars, b.max_chars))
    override def finish(b: DocStats): DocStats = b
    override def bufferEncoder: Encoder[DocStats] = Encoders.product[DocStats]
    override def outputEncoder: Encoder[DocStats] = Encoders.product[DocStats]
  }

  /** The typed documents relation. The `.as[Document]` bind is plan-free:
    * the scan, filters, and pruning below it are untouched.
    */
  def docs(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    table(spark, dir, "documents").as[Document]
  }

  val minChars = 200L

  /** Typed pipeline: expression filter (pushdown kept) → groupByKey on a
    * typed key → custom Aggregator → flatten to the output schema.
    */
  def sourceStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .filter(col("n_chars") >= minChars) // expression, NOT a lambda: pushdown survives
      .groupByKey(_.source)
      .agg(DocStatsAgg.toColumn.name("stats"))
      .select(col("key").as("source"),
        col("stats.n_docs").as("n_docs"),
        col("stats.total_chars").as("total_chars"),
        col("stats.max_chars").as("max_chars"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q32 — typed Dataset + custom Aggregator per-source statistics.
  // All-integral outputs (count/sum/max of BIGINT) are exact in both
  // engines; DuckDB's SUM over BIGINT is HUGEINT, so the oracle casts.
  //
  // 100 TB posture: one shuffle on `source`, map-side combined to one
  // 3-field buffer per (task, source) before it — the same physical
  // profile as the untyped groupBy.agg twin (TypedApiSpec pins both the
  // pushed filter and the partial-aggregation phase in the plan).
  // ---------------------------------------------------------------------
  val q32 = Q("q32_typed_stats",
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  max(n_chars) AS max_chars
       |FROM documents WHERE n_chars >= $minChars
       |GROUP BY source ORDER BY source""".stripMargin
  )(sourceStats)

  val all: Seq[Q] = Seq(q32)
}
