package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupQueries, TextQueries, VectorQueries}

/** Semantic pins for the round-8 additions: d09 incremental dedup,
  * p10 embedding decontamination, s06 kNN graph, p11 shard shuffle.
  */
class Round8Spec extends SparkSpec {

  /** Temp dir shaped like a testdata sf dir with one documents table. */
  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r8").toString
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

  test("d09 classifies delta docs: exact copy, near copy, novel") {
    val base3 = words("x", 30)
    val base4 = words("y", 30)
    val dir = corpus(Seq(
      0L -> words("a", 30), 1L -> words("b", 30), 2L -> words("c", 30),
      3L -> base3, 4L -> base4,
      9L -> base3,                 // delta: exact copy of base doc 3
      19L -> (base4 + " extra"),   // delta: near copy of base doc 4 (J=28/29)
      29L -> words("z", 30)))      // delta: novel
    val out = DedupQueries.d09.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet === Set(9L, 19L, 29L)) // delta rows only
    assert(out(9L) === ((3L, 3L, "exact")))  // exact dup is also a near dup
    assert(out(19L) === ((-1L, 4L, "near")))
    assert(out(29L) === ((-1L, -1L, "new")))
  }

  test("d09 matches only the base side, never other delta docs") {
    val shared = words("s", 30)
    // two identical DELTA docs with no base counterpart: neither may
    // report the other
    val dir = corpus(Seq(
      0L -> words("a", 30),
      9L -> shared, 19L -> shared))
    val out = DedupQueries.d09.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(9L -> "new", 19L -> "new"))
  }

  test("d09 output is broadcast-independent and degrades to shuffled joins") {
    val base3 = words("x", 30)
    val base4 = words("y", 30)
    val dir = corpus(Seq(
      0L -> words("a", 30), 1L -> words("b", 30), 2L -> words("c", 30),
      3L -> base3, 4L -> base4,
      9L -> base3, 19L -> (base4 + " extra"), 29L -> words("z", 30)))
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val normal = canon(DedupQueries.d09.fn(spark, dir).collect())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // With broadcast disabled entirely, an explicit broadcast() hint
      // would still force a driver-side build — the oversized-delta OOM
      // VERDICT flagged. No hint → AQE degrades to shuffled joins and
      // the output is unchanged.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = DedupQueries.d09.fn(spark, dir)
      assert(canon(df.collect()) === normal)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastExchange"),
        s"degrade plan still broadcasts:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("d09 joins hold under an inverted majority-delta split") {
    val t1 = words("x", 30)
    val t2 = words("y", 30)
    // base = doc_id % 10 == 9 (minority); delta = everything else — the
    // oversized-backfill shape where the delta side must NOT broadcast
    // unconditionally.
    val dir = corpus(Seq(
      9L -> t1, 19L -> t2,
      0L -> t1,                  // delta: exact copy of base doc 9
      1L -> (t2 + " extra"),     // delta: near copy of base doc 19
      2L -> words("z", 30)))     // delta: novel
    val out = DedupQueries.d09Core(spark, dir, deltaRem = 9, invert = true)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((9L, 9L, "exact")))
    assert(out(1L) === ((-1L, 19L, "near")))
    assert(out(2L) === ((-1L, -1L, "new")))
  }

  test("p10 equals the naive window-form max-cosine recomputation") {
    val got = VectorQueries.p10.fn(spark, sf).collect().toSeq
    // naive form: all (corpus, bench) cosines, rank window, rn = 1
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("v"), col("v"), _ * _),
        lit(0.0), _ + _)))
    val bm = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("bid"), col("v").as("bv"), col("nrm").as("bn"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))
    val naive = e.filter(col("vec_id") >= 20).crossJoin(bm)
      .select(col("vec_id"), col("bid"),
        (aggregate(zip_with(col("v"), col("bv"), _ * _), lit(0.0), _ + _)
          / (col("nrm") * col("bn"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("bid").as("contaminated_by"),
        col("cos").as("max_cos"),
        when(col("cos") >= VectorQueries.decontThreshold, 1L).otherwise(0L)
          .as("is_contaminated"))
      .orderBy("vec_id").collect().toSeq
    assert(got === naive)
  }

  test("s06 cell-block kNN scan equals the plain window form") {
    val got = VectorQueries.s06.fn(spark, sf).collect().toSeq
    // plain form: unsalted cell self-join + rank window (same cos expr)
    val cs = VectorQueries.trainedCentroids(spark, sf)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VectorQueries.dot(col("v"), col("v"))))
      .withColumn("cell", VectorQueries.cellOf(col("v"), cs))
    val b = e.select(col("vec_id").as("nb"), col("v").as("bv"),
      col("nrm").as("bn"), col("cell"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nb"))
    val naive = e.join(b, Seq("cell")).filter(col("nb") =!= col("vec_id"))
      .select(col("vec_id"), col("nb"),
        (VectorQueries.dot(col("v"), col("bv")) / (col("nrm") * col("bn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= VectorQueries.knnK)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("nb").as("neighbor_id"), col("cos"))
      .orderBy("vec_id", "rank").collect().toSeq
    assert(got === naive)
  }

  test("token_windows equals the split/transform/posexplode composition") {
    // pins the byte-scan generator against the declarative form it
    // replaces, over the real corpus (incl. multi-space/empty-token docs)
    val k = DedupQueries.spanLen
    graft.functions.CustomFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val native = docs
      .select(col("doc_id"), call_function("token_windows", col("text"), lit(k)))
      .orderBy("doc_id", "i").collect().toSeq
    val w = split(col("text"), " ")
    val composed = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("w")) - k),
        s => array_join(slice(col("w"), s + 1, lit(k)), " "))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").as("win"))
      .orderBy("doc_id", "i").collect().toSeq
    assert(native === composed)
  }

  test("d10 merges overlapping duplicated windows into maximal spans") {
    val k = DedupQueries.spanLen // 8
    val boiler = words("b", 12)
    val dir = corpus(Seq(
      0L -> (words("a", 10) + " " + boiler + " " + words("c", 5)), // B at 11..22
      1L -> (words("d", 6) + " " + boiler + " " + words("e", 4)),  // B at 7..18
      2L -> words("f", 30),                                        // no dups
      3L -> (words("g", 8) + " " + words("h", 6) + " " + words("g", 8))))
    val out = DedupQueries.d10.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // docs 0/1 share the 12-token boilerplate: window starts 11..15 /
    // 7..11 are contiguous -> ONE span covering exactly the boilerplate
    assert(out(0L) === ((27L, 1L, 12L, 12.0 / 27)))
    assert(out(1L) === ((22L, 1L, 12L, 12.0 / 22)))
    assert(out(2L) === ((30L, 0L, 0L, 0.0)))
    // doc 3 repeats its own first 8 tokens at position 15: within-doc
    // duplication, starts 1 and 15 are non-adjacent -> TWO spans
    assert(out(3L) === ((22L, 2L, 16L, 16.0 / 22)))
  }

  test("t11 ranks terms by tf·(N/df), ties to the lexicographically smaller term") {
    // 4 docs: "rare" appears only in doc 0 (df=1), "dup" in doc 0 twice
    // (tf=2, df=2), "common" everywhere (df=4)
    val dir = corpus(Seq(
      0L -> "rare dup dup common",
      1L -> "dup common x1 x2",
      2L -> "common y1 y2 y3",
      3L -> "common z1 z2 z3"))
    val out = TextQueries.t11.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val doc0 = out.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).toSeq
    // doc 0 scores: rare 1·4/1 = 4, dup 2·4/2 = 4, common 1·4/4 = 1
    // tie at 4.0 → "dup" < "rare" lexicographically
    assert(doc0 === Seq((1L, "dup", 4.0), (2L, "rare", 4.0), (3L, "common", 1.0)))
    // every doc emits exactly min(3, |vocab|) rows, ranks 1..k
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("p11 shards are dense, uniform-keyed, and deterministic") {
    val a = TextQueries.p11.fn(spark, sf).collect().toSeq
    val b = TextQueries.p11.fn(spark, sf).collect().toSeq
    assert(a === b) // reproducible permutation
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.length === n)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < TextQueries.numShards))
    // positions within each shard are exactly 1..|shard|
    a.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps === (1L to ps.length).toSeq)
    }
  }
}
