package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupQueries, VectorQueries}

/** Cross-checks the approximate dedup/ANN pipelines against brute-force
  * ground truth on the same session, and smoke-runs every registered
  * query: nonzero rows, unique lower-case column names (the driver's
  * compare sorts by name, so duplicates/case clashes would break it).
  */
class OperatorsSpec extends SparkSpec {

  test("every registered query returns rows on sf0.001 and has sane columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val cols = df.columns
      assert(cols.map(_.toLowerCase).distinct.length === cols.length, s"$name: dup columns")
      val n = df.limit(1).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("d03 MinHash-LSH output equals d02 exact n-gram Jaccard output") {
    val exact = DedupQueries.d02.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = DedupQueries.d03.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("d04 chunk-blocked SimHash equals brute-force hamming pairs") {
    graft.functions.CustomFunctions.register(spark)
    val grams = DedupQueries.wordTrigrams(spark.read.parquet(s"$sf/documents.parquet"))
    val sigs = grams.groupBy("doc_id")
      .agg(call_function("simhash64",
        call_function("md5_lower64", col("g"))).as("sig"))
    val brute = sigs.toDF("a", "sa")
      .join(sigs.toDF("b", "sb"), col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("h"))
      .filter(col("h") <= DedupQueries.hammingMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val blockedRows = DedupQueries.d04.fn(spark, sf).collect()
    val blocked = blockedRows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
    // the self-check column: every row carries the brute-force match
    // count, which must equal the number of emitted rows
    blockedRows.foreach(r => assert(r.getLong(3) === blockedRows.length.toLong))
  }

  test("s02 LSH ANN: ranked output is bucket-consistent and cosine-correct") {
    val rows = VectorQueries.s02.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // rank restarts at 1 per query and is contiguous
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length))
    }
    // each reported neighbor shares the query's hyperplane bucket
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", VectorQueries.bucketOf(col("v")))
    val buckets = e.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(buckets(r.getLong(0)) === buckets(r.getLong(2)),
        s"query ${r.getLong(0)} and neighbor ${r.getLong(2)} in different buckets")
    }
    // cosines are true cosines (within [-1, 1])
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }

  test("s01 brute-force top-k dominates s02 bucketed results per query") {
    val s1 = VectorQueries.s01.fn(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getDouble(3)).max }
    val s2 = VectorQueries.s02.fn(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getDouble(3)).max }
    s2.foreach { case (q, best2) =>
      assert(best2 <= s1(q) + 1e-12, s"bucketed beat brute force for query $q")
    }
  }

  test("m01 frame digest is the true MD5 of the payload bytes") {
    val row = graft.ops.MultimodalQueries.m01.fn(spark, sf)
      .limit(1).collect()(0)
    val docId = row.getLong(0)
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === docId).select("text").collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(5) === expected)
  }


  test("m01 resize invariant: longest side exactly 224, aspect preserved") {
    val m = graft.ops.MultimodalQueries.m01.fn(spark, sf)
    val bad = m.filter(greatest(col("resized_w"), col("resized_h")) =!= 224 ||
      least(col("resized_w"), col("resized_h")) > 224 ||
      least(col("resized_w"), col("resized_h")) <= 0).count()
    assert(bad === 0)
  }


  test("d06 prefix-filtered join output equals d02 exact join output") {
    val exact = DedupQueries.d02.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefixed = DedupQueries.d06.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefixed === exact)
    assert(exact.nonEmpty)
  }

  test("d06 df-ordered prefix index shrinks the candidate set vs the full index") {
    val grams = DedupQueries.wordTrigrams(spark.read.parquet(s"$sf/documents.parquet")).cache()
    val full = grams.select(col("doc_id").as("a"), col("g").as("ga"))
      .join(grams.select(col("doc_id").as("b"), col("g").as("gb")),
        col("ga") === col("gb") && col("a") < col("b"))
      .select("a", "b").distinct().count()
    val prefixed = DedupQueries.prefixCandidates(grams, DedupQueries.jaccardThreshold).count()
    info(s"candidates: full index $full, df-ordered prefix $prefixed")
    assert(prefixed < full)
    assert(prefixed > 0)
  }

  test("df-cut similarity join: generous cut is exact, tiny cut is a subset with true jaccards") {
    val grams = DedupQueries.wordTrigrams(spark.read.parquet(s"$sf/documents.parquet")).cache()
    val exact = DedupQueries.d02.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val generous = DedupQueries.dfCutJaccardJoin(grams, 0.8, maxDf = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(generous === exact)
    val tiny = DedupQueries.dfCutJaccardJoin(grams, 0.8, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // recall may drop, but every surviving pair carries its TRUE jaccard
    assert(tiny.subsetOf(exact))
  }

  test("d07 connected components: transitivity, symmetry, singletons") {
    import spark.implicits._
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3), pair 5-6 given reversed, 4 isolated
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("a", "b")
    val got = DedupQueries.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("d07 cluster ids are component minima consistent with d02 pairs") {
    val pairs = DedupQueries.d02.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupQueries.d07.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every similar pair shares a cluster, and each cluster id is the
    // minimum doc_id among its members (so cluster ids are stable keys)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min, s"cluster $cid is not its members' min")
    }
    // docs in no pair are singletons
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot { case (d, _) => paired(d) }
      .foreach { case (d, c) => assert(d === c, s"singleton $d got cluster $c") }
  }

  test("t06 count-min estimates bound the true frequencies (one-sided, ε·N slack)") {
    import graft.ops.TextQueries
    val rows = TextQueries.t06.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { case (tok, freq, est) =>
      assert(est >= freq, s"$tok: CMS must never underestimate ($est < $freq)")
      // the eps*N bound holds per query only with the configured
      // confidence; 3x slack makes 20 assertions deterministic in CI
      // while still pinning the estimates to the right magnitude
      assert(est <= freq + 3 * math.ceil(TextQueries.cmEps * totalTokens).toLong + 3,
        s"$tok: estimate $est far exceeds true $freq + eps*N")
    }
  }

  test("q07 array round-trip shape produces exactly the measured direct-join output") {
    val direct = graft.ops.CoreQueries.q07.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val roundTrip = graft.ops.CoreQueries.q07ArrayRoundTrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(roundTrip === direct)
    assert(direct.nonEmpty)
  }
}
