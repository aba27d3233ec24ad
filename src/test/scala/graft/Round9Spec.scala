package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupQueries

/** Semantic pins for the round-9 additions: d11 cross-document span
  * attribution.
  */
class Round9Spec extends SparkSpec {

  /** Temp dir shaped like a testdata sf dir with one documents table. */
  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9").toString
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

  test("d11 attributes shared spans to the first-occurring document") {
    val ten = words("w", 10) // windows (k=8) at i = 1..3
    val dir = corpus(Seq(
      0L -> ten,
      1L -> ten,                                    // all 3 windows shared → (0,1,3)
      2L -> ((3 to 10).map(i => s"w$i").mkString(" ") + " q1 q2"),
      // only the w3..w10 window matches doc 0's i=3 window → (0,2,1)
      3L -> words("n", 10),                         // novel → no row
      4L -> (words("r", 8) + " " + words("r", 8)))) // within-doc repeat only → no pair
    // sharedWins memoizes per (session, dir) — the temp dir gets its own
    // cached relation, so no cross-suite invalidation is needed.
    val out = DedupQueries.d11.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 1L, 3L), (0L, 2L, 1L)))
  }
}
