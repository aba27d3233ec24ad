package graft

import org.apache.spark.sql.functions._

import graft.functions.{CustomFunctions, MinHashAgg}

/** Pins the semantics of the native Catalyst expressions: the codegen'd
  * RollingHash against an independent Scala reference, and the
  * single-pass MinHash/SimHash aggregates against their algebraic
  * identities (single-feature groups, partition-split merge).
  */
class CustomExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def refRollingHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(7L)((acc, b) =>
      (acc * CustomFunctions.RollingHashBase + (b & 0xff)) % CustomFunctions.RollingHashMod)

  test("rolling_hash matches the reference fold, interpreted and codegen'd") {
    CustomFunctions.register(spark)
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "x" * 500)
    val df = inputs.toDF("s").select(col("s"), call_function("rolling_hash", col("s")).as("h"))
    // whole-stage codegen path
    val got = df.orderBy(length(col("s"))).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) === refRollingHash(s), s"input '$s'"))
  }

  test("hll_packed equals the composed bin()/length() register derivation") {
    // q20's oracle keeps the composed relational form (md5 → bucket →
    // (64-p+1) - length(bin(w))); the native expression must stay
    // bit-identical to it for every p and hash pattern, including the
    // w == 0 degenerate (nlz(0) = 64 folds into the same formula).
    CustomFunctions.register(spark)
    val inputs = (0 until 2000).map(i => s"key-$i") ++ Seq("", "a", "Ω∂")
    for (p <- Seq(4, 9, 14)) {
      val df = inputs.toDF("s").select(col("s"),
        call_function("hll_packed", col("s"), lit(p)).as("pk"),
        call_function("md5_lower64", col("s")).as("h"))
      // long input ≡ string input on the value's decimal form
      val viaLong = (0 until 512).map(_.toLong).toDF("v").select(
        call_function("hll_packed", col("v"), lit(p)).as("pkL"),
        call_function("hll_packed", col("v").cast("string"), lit(p)).as("pkS"))
      assert(viaLong.filter(col("pkL") =!= col("pkS")).count() === 0L,
        s"packedLong diverges from packed(cast) at p=$p")
      df.collect().foreach { r =>
        val (s, pk, h) = (r.getString(0), r.getLong(1), r.getLong(2))
        val j = h & ((1L << p) - 1)
        val w = h >>> p
        val maxRho = 64 - p + 1
        val rho =
          if (w == 0L) maxRho
          else maxRho - java.lang.Long.toBinaryString(w).length
        assert(pk >> 8 === j, s"bucket mismatch for '$s' p=$p")
        assert((pk & 0xff) === rho, s"rank mismatch for '$s' p=$p")
      }
    }
  }

  test("minhash128: single-feature group signature is mix_i(hash)") {
    CustomFunctions.register(spark)
    val df = Seq((1L, 42L)).toDF("k", "h")
      .groupBy("k").agg(call_function("minhash128", col("h")).as("sig"))
    val sig = df.collect()(0).getSeq[Long](1)
    assert(sig.length === 128)
    (0 until 128).foreach(i => assert(sig(i) === MinHashAgg.mix(42L, i)))
  }

  test("minhash128: partition split does not change the signature (merge correctness)") {
    CustomFunctions.register(spark)
    val data = (1L to 400L).map(i => (i % 2, i * 7919L))
    def sigOf(parts: Int) = {
      val rows = data.toDF("k", "h").repartition(parts)
        .groupBy("k").agg(call_function("minhash128", col("h")).as("sig"))
        .orderBy("k").collect()
      rows.map(_.getSeq[Long](1))
    }
    val one = sigOf(1)
    val eight = sigOf(8)
    assert(one.zip(eight).forall { case (a, b) => a == b })
  }

  test("minhash128: signature agreement estimates Jaccard") {
    CustomFunctions.register(spark)
    // two sets with true Jaccard 60/140 ≈ 0.43
    val a = (1L to 100L).map(("a", _))
    val b = (41L to 180L).map(("b", _))
    val sigs = (a ++ b).toDF("k", "x")
      .groupBy("k").agg(call_function("minhash128", xxhash64(col("x"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 128.0
    val trueJ = 60.0 / 180.0
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("array_count_in counts occurrences in the vocabulary, codegen ≡ lambda") {
    CustomFunctions.register(spark)
    val markers = Seq("the", "a", "data")
    val df = Seq(
      "the a the data xyz", // 4 marker tokens (occurrence-weighted)
      "nothing here",       // 0
      "data",               // 1
      ""                    // "" token → 0
    ).toDF("text").select(split(col("text"), " ").as("w"))
    val got = df.select(
      call_function("array_count_in", col("w"),
        array(markers.map(lit): _*)).as("n"),
      size(filter(col("w"),
        t => array_contains(typedLit(markers), t))).cast("long").as("ref"))
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(4L, 0L, 1L, 0L))
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), "codegen != lambda reference"))
    // null array → null result
    val nullRow = Seq(1).toDF("i")
      .select(call_function("array_count_in",
        lit(null).cast("array<string>"), array(lit("x"))).as("n"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
    // wrong marker element type → clear plan-time error, not a CCE
    val err = intercept[Exception] {
      Seq(1).toDF("i")
        .select(call_function("array_count_in",
          array(lit("x")), array(lit(1), lit(2))).as("n"))
        .collect()
    }
    assert(err.getMessage.contains("array<string>"), err.getMessage)
  }

  test("topk_agg equals the window row_number idiom and is partition-stable") {
    CustomFunctions.register(spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    def viaAgg(parts: Int) = orders.repartition(parts)
      .groupBy("o_custkey")
      .agg(call_function("topk_agg",
        struct(col("o_totalprice").as("ord"), col("o_orderkey").as("id")),
        lit(3)).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rank"),
        col("col.id").as("o_orderkey"), col("col.ord").as("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaAgg(1) === viaWindow)
    // partial-aggregation merge across many partitions changes nothing
    assert(viaAgg(8) === viaWindow)
    assert(viaWindow.nonEmpty)
  }

  test("topk_agg matches reference sort-take on random tie-heavy data, every k") {
    CustomFunctions.register(spark)
    val rnd = new scala.util.Random(12345)
    // small value domain → many (ord) ties, exercising the id tiebreak
    val data = (1L to 300L).map(i => (i % 7, rnd.nextInt(5).toDouble, i))
    val df = data.toDF("grp", "ord", "id")
    Seq(1, 3, 10).foreach { k =>
      val got = df.repartition(5)
        .groupBy("grp")
        .agg(call_function("topk_agg",
          struct(col("ord"), col("id")), lit(k)).as("top"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        .toMap
      val expected = data.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3))
          .sortBy { case (ord, id) => (-ord, id) }
          .take(k).toSeq).toMap
      expected.foreach { case (g, exp) =>
        assert(got(g) === exp, s"k=$k group=$g")
      }
    }
  }

  test("simhash64: single-feature signature is the feature hash; merge is partition-stable") {
    CustomFunctions.register(spark)
    val h = -3141592653589793238L
    val single = Seq((1L, h)).toDF("k", "x")
      .groupBy("k").agg(call_function("simhash64", col("x")).as("sig"))
      .collect()(0).getLong(1)
    assert(single === h)

    val data = (1L to 300L).map(i => (1L, i * 2654435761L))
    def sigOf(parts: Int) =
      data.toDF("k", "x").repartition(parts)
        .groupBy("k").agg(call_function("simhash64", col("x")).as("sig"))
        .collect()(0).getLong(1)
    assert(sigOf(1) === sigOf(6))
  }
}
