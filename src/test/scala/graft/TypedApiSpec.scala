package graft

import org.apache.spark.sql.functions._

import graft.api.TypedDocs

/** Pins the typed Dataset[T] surface (q32): the `.as[Document]` bind
  * must not cost anything at the plan level (filter pushdown survives),
  * the custom Aggregator must participate in partial aggregation, and
  * the typed result must equal the untyped DataFrame twin.
  */
class TypedApiSpec extends SparkSpec {

  test("typed pipeline equals the untyped groupBy.agg twin") {
    val typed = TypedDocs.sourceStats(spark, sf).collect().toSeq
    val untyped = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") >= TypedDocs.minChars)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        max("n_chars").as("max_chars"))
      .orderBy("source")
      .collect().toSeq
    assert(typed.map(_.toSeq) === untyped.map(_.toSeq))
    assert(typed.nonEmpty)
  }

  test("filter pushdown survives the typed bind") {
    val df = TypedDocs.sourceStats(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(n_chars,200)"),
      s"expected pushed n_chars filter in:\n$scan")
  }

  test("Aggregator plans a partial (map-side) phase before the shuffle") {
    val plan = TypedDocs.sourceStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_docstatsagg"),
      s"expected partial typed aggregate in:\n$plan")
  }

  test("Aggregator algebra: merge is associative/commutative with zero") {
    import TypedDocs.{DocStats, DocStatsAgg, Document}
    val docs = Seq(
      Document(1, "a", "en", "s0", 10),
      Document(2, "b", "en", "s0", 30),
      Document(3, "c", "en", "s0", 20))
    val sequential = docs.foldLeft(DocStatsAgg.zero)(DocStatsAgg.reduce)
    val split = DocStatsAgg.merge(
      DocStatsAgg.reduce(DocStatsAgg.zero, docs.head),
      docs.tail.foldLeft(DocStatsAgg.zero)(DocStatsAgg.reduce))
    assert(sequential === split)
    assert(DocStatsAgg.merge(sequential, DocStatsAgg.zero) === sequential)
    assert(sequential === DocStats(3, 60, 30))
  }

  test("typed encoder round-trips the documents schema") {
    val ds = TypedDocs.docs(spark, sf)
    val first = ds.orderBy("doc_id").head()
    assert(first.doc_id === 0L)
    assert(first.n_chars === first.text.length.toLong)
  }
}
