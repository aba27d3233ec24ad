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

  test("d13 containment catches the embedded-document pair Jaccard misses") {
    // doc 0 ⊂ doc 1: 8 shared trigrams of doc 0's 8, doc 1 has 28 →
    // C = 1.0 but J = 8/28 ≈ 0.29 (below d02's 0.8 bar). doc 2 novel.
    val dir = corpus(Seq(
      0L -> words("w", 10),
      1L -> words("w", 30),
      2L -> words("z", 10)))
    val out = DedupQueries.d13.fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === (0L, 1L))
    assert(r.getDouble(2) === 1.0) // containment
    assert(r.getDouble(3) === 8.0 / 28.0) // jaccard — sub-threshold for d02
    // and d02 indeed does NOT emit the pair
    assert(DedupQueries.d02.fn(spark, dir).collect().isEmpty)
  }

  test("d04 wide blocking keys find exactly the 4x16-chunk verified pairs") {
    graft.functions.CustomFunctions.register(spark)
    val sigs = DedupQueries
      .wordTrigrams(spark.read.parquet(s"$sf/documents.parquet"))
      .groupBy("doc_id")
      .agg(call_function("simhash64",
        call_function("md5_lower64", col("g"))).as("sig"))
    def verified(wide: Boolean): Set[(Long, Long, Long)] = {
      val ch = DedupQueries.chunkKeys(sigs, wide)
      ch.toDF("a", "sig_a", "chunk_id", "chunk")
        .join(ch.toDF("b", "sig_b", "chunk_id2", "chunk2"),
          col("chunk_id") === col("chunk_id2") && col("chunk") === col("chunk2") &&
            col("a") < col("b"))
        .select(col("a"), col("b"),
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("h"))
        .distinct()
        .filter(col("h") <= DedupQueries.hammingMax)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val legacy = verified(wide = false)
    val wide = verified(wide = true)
    assert(wide === legacy)
    assert(legacy.nonEmpty)
    // the wide index carries 10 keys per doc (C(5,2) two-block combos)
    val perDoc = DedupQueries.chunkKeys(sigs, wide = true)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).select("n")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(perDoc === Set(10L))
  }

  test("p12 temperature quotas up-sample rare sources by sqrt supply") {
    import spark.implicits._
    // supplies 16/4/1 → sqrt weights 4/2/1 (W=7); T = min(16·7/4,
    // 4·7/2, 1·7/1) = 7; quotas 4/2/1 — the rare source keeps 100%
    // while the head keeps 25%, proportional(T=1) would keep C at 1/21.
    val dir = java.nio.file.Files.createTempDirectory("graft-r9p12").toString
    val rows = (1 to 16).map(i => (i.toLong, s"alpha text $i", "srcA")) ++
      (1 to 4).map(i => (100L + i, s"beta text $i", "srcB")) ++
      Seq((200L, "gamma text solo", "srcC"))
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextQueries.p12.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("srcA" -> 4, "srcB" -> 2, "srcC" -> 1))
    // deterministic: ranks are md5-ordered, no RNG — a second run is
    // identical row-for-row
    val again = graft.ops.TextQueries.p12.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === again.toSeq)
  }
}
