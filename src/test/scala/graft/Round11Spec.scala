package graft

import org.apache.spark.sql.functions._

/** Round-11 pins. First: the n-gram generators' NULL-token contract —
  * NULL tokens are SKIPPED when joining a window (ConcatWs semantics),
  * so a caller passing a nullable array<string> gets exactly what the
  * documented concat_ws-composed declarative form produces
  * ("a",NULL,"b" → "a b", not "a  b"). split() never produces nulls,
  * so the driver gate can't see this — the pin is for the public SQL
  * function surface.
  */
class Round11Spec extends SparkSpec {

  test("n-gram generators skip NULL tokens exactly like the concat_ws form") {
    import spark.implicits._
    graft.functions.CustomFunctions.register(spark)
    val docs = Seq(
      (1L, Seq("a", null, "b", "c")), // null mid-window
      (2L, Seq[String](null, null, "x")), // leading nulls
      (3L, Seq("p", "q", null)), // trailing null
      (4L, Seq("s", "s", null, "s")) // dedup across a null-bearing window
    ).toDF("doc_id", "w")

    def composedWindows(n: Int) = docs
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        transform(
          sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ",
            (1 to n).map(k => element_at(col("w"), i + k)): _*)).as("arr"))

    // ngrams ≡ explode(transform(..., concat_ws(...)))
    val gotAll = docs
      .select(col("doc_id"), call_function("ngrams", col("w"), lit(2)))
      .collect().map(_.toSeq).toSeq
    val expAll = composedWindows(2)
      .select(col("doc_id"), explode(col("arr")))
      .collect().map(_.toSeq).toSeq
    assert(gotAll === expAll)
    // the skipped-null windows: ("a",NULL)→"a" (not "a "), and doc 2's
    // all-null window (NULL,NULL)→"" (ConcatWs of zero inputs)
    assert(gotAll.exists(_ (1) == "a"))
    assert(gotAll.exists(_ (1) == ""))

    // ngrams_distinct ≡ explode(array_distinct(...)) with the arr size
    val gotD = docs
      .select(col("doc_id"), call_function("ngrams_distinct", col("w"), lit(2)))
      .select("doc_id", "sz", "g")
      .collect().map(_.toSeq).toSeq
    val expD = composedWindows(2)
      .select(col("doc_id"), array_distinct(col("arr")).as("d"))
      .select(col("doc_id"), size(col("d")).cast("long").as("sz"),
        explode(col("d")).as("g"))
      .collect().map(_.toSeq).toSeq
    assert(gotD === expD)

    // ngram_stats' counts agree with the composed windows' groupBy
    val gotS = docs
      .select(col("doc_id"),
        call_function("ngram_stats", col("w"), lit(2)).as("st"))
      .select(col("doc_id"), col("st.n_ngrams"), col("st.n_distinct"),
        col("st.top_cnt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expS = composedWindows(2)
      .select(col("doc_id"), explode(col("arr")).as("g"))
      .groupBy("doc_id", "g").agg(count("*").as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), count("*").as("d"),
        max("c").as("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs shorter than n emit zero windows → stats row is (0,0,0)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(gotS(id) === expS.getOrElse(id, (0L, 0L, 0L)), s"doc $id")
    }

    // ngram_counts ≡ composed windows groupBy multiplicity (as a multiset)
    val gotC = docs
      .select(col("doc_id"), call_function("ngram_counts", col("w"), lit(2)))
      .select("doc_id", "ngram", "cnt")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val expC = composedWindows(2)
      .select(col("doc_id"), explode(col("arr")).as("ngram"))
      .groupBy("doc_id", "ngram").agg(count("*").as("cnt"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(gotC === expC)
  }

  test("d13 containment ladder ≡ direct inverted-index join (both SFs)") {
    // The scale path (prefix-of-the-smaller candidates + exact verify)
    // must be row-identical to the direct pair aggregate — same pairs,
    // same containment/jaccard values — at every corpus it's forced on.
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val direct = graft.ops.DedupQueries.containmentDirect(spark, dir)
        .collect().map(_.toString).toSeq
      val ladder = graft.ops.DedupQueries.containmentLadder(spark, dir)
        .collect().map(_.toString).toSeq
      assert(direct.nonEmpty, s"no containment pairs at $dir")
      assert(ladder === direct, s"diverged at $dir")
    }
  }
}
