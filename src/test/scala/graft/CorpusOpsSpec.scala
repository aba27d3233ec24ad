package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupQueries, TextQueries}

/** Semantic pins for the round-4 corpus operators (d08 passage dedup,
  * t08 repetition metrics, t09 PII redaction) on purpose-built tiny
  * corpora, where the expected output is checkable by hand.
  */
class CorpusOpsSpec extends SparkSpec {

  /** Writes a documents.parquet with the given (doc_id, text) rows into
    * a fresh temp dir shaped like a testdata sf dir.
    */
  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("d08 removes a repeated passage from the later document only") {
    val shared = words("dup", DedupQueries.passageLen) // exactly one passage
    val dir = corpus(Seq(
      0L -> (shared + " " + words("a", DedupQueries.passageLen)),
      1L -> (shared + " " + words("b", DedupQueries.passageLen))))
    val out = DedupQueries.d08.fn(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 0 (first occurrence) keeps both passages
    assert(byId(0L)._1 === 2L && byId(0L)._2 === 2L)
    assert(byId(0L)._3 === shared + " " + words("a", DedupQueries.passageLen))
    // doc 1 loses the shared passage, keeps its unique one
    assert(byId(1L)._1 === 2L && byId(1L)._2 === 1L)
    assert(byId(1L)._3 === words("b", DedupQueries.passageLen))
  }

  test("d08 reassembles surviving passages in original order") {
    val dir = corpus(Seq(0L -> words("w", 50))) // 3 passages: 20+20+10
    val out = DedupQueries.d08.fn(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)
    assert(out.head.getLong(2) === 3L)
    assert(out.head.getString(3) === words("w", 50))
  }

  test("d08 invariants on the real corpus: kept counts sum to distinct passages") {
    val df = DedupQueries.d08.fn(spark, sf)
    val bad = df.filter(col("n_kept") > col("n_passages")).count()
    assert(bad === 0)
    val sums = df.agg(sum("n_kept"), sum("n_passages")).head()
    assert(sums.getLong(0) <= sums.getLong(1))
    assert(sums.getLong(0) > 0)
  }

  test("t08 flags a one-phrase document and passes a diverse one") {
    val repetitive = ("spam ham " * 30).trim // top bigram dominates
    val diverse = words("u", 40) // every bigram unique
    val dir = corpus(Seq(0L -> repetitive, 1L -> diverse))
    val out = TextQueries.t08.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(4) === 1L, "repeated phrase must be flagged")
    assert(out(1L).getLong(4) === 0L, "diverse doc must pass")
    // diverse doc: 39 bigrams, all distinct, top fraction 1/39
    assert(out(1L).getLong(1) === 39L)
    assert(out(1L).getLong(2) === 39L)
    assert(out(1L).getDouble(3) === 1.0 / 39.0)
  }

  test("t09 redacts registry patterns with per-type counts, respecting word boundaries") {
    val dir = corpus(Seq(
      0L -> "customer sent key to customer via hash",
      1L -> "customers keep keys hashed")) // no whole-word matches
    val out = TextQueries.t09.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) === 2L) // n_name
    assert(out(0L).getLong(2) === 2L) // n_id: key + hash
    assert(out(0L).getString(3) ===
      "[NAME] sent [ID] to [NAME] via [ID]")
    assert(out(1L).getLong(1) === 0L)
    assert(out(1L).getLong(2) === 0L)
    assert(out(1L).getString(3) === "customers keep keys hashed")
  }
}
