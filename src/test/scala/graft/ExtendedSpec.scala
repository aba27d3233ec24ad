package graft

import org.apache.spark.sql.functions._

import graft.ops.{ExtendedQueries, SkewJoin, VectorQueries}

/** Beyond-reference operators: approx-distinct error bound, salted
  * skew-join equivalence, and IVF-probed ANN consistency.
  */
class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("q20: relational HLL and builtin HLL++ both within error bound of exact") {
    val exact = ExtendedQueries.q20Exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("exact_orders").toDouble).toMap
    // Oracled relational HLL (m=512 → rsd ≈ 4.6%; allow ~2.2σ).
    val rows = ExtendedQueries.q20.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val e = exact(r.getString(0))
      assert(math.abs(approx - e) / e < 0.1,
        s"relational ${r.getString(0)}: approx=$approx exact=$e")
    }
    // Spec-pinned builtin twin (engine-internal bias tables → no oracle).
    ExtendedQueries.q20Builtin(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val e = exact(r.getString(0))
      assert(math.abs(approx - e) / e < 0.1,
        s"builtin ${r.getString(0)}: approx=$approx exact=$e")
    }
  }

  test("salted join equals plain join, for every salt count and join type") {
    val left = (1L to 500L).map(i => (i % 7, i)).toDF("k", "lv")
    // skew: key 99 appears 300×
    val skewed = left.unionAll(Seq.fill(300)((99L, 0L)).toDF("k", "lv"))
    val right = Seq((0L, "a"), (1L, "b"), (99L, "hot"), (123L, "miss"))
      .toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    val plain = canon(skewed.join(right, Seq("k"), "inner"))
    Seq(1, 4, 16).foreach { n =>
      assert(canon(SkewJoin.saltedJoin(skewed, right, "k", n)) === plain, s"n=$n")
    }
    val plainLeft = canon(skewed.join(right, Seq("k"), "left"))
    assert(canon(SkewJoin.saltedJoin(skewed, right, "k", 8, "left")) === plainLeft)
    val plainSemi = canon(skewed.join(right, Seq("k"), "left_semi"))
    assert(canon(SkewJoin.saltedJoin(skewed, right, "k", 8, "left_semi")) === plainSemi)
    val plainAnti = canon(skewed.join(right, Seq("k"), "left_anti"))
    assert(canon(SkewJoin.saltedJoin(skewed, right, "k", 8, "left_anti")) === plainAnti)
  }

  test("salted join rejects right-preserving join types and survives a __salt column") {
    val l = Seq((1L, "x")).toDF("k", "lv")
    val r = Seq((1L, "y")).toDF("k", "rv")
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(l, r, "k", 4, "right"))
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(l, r, "k", 4, "full_outer"))
    // a pre-existing __salt column on either input must not collide
    val lSalted = Seq((1L, "x", 7L)).toDF("k", "lv", "__salt")
    val got = SkewJoin.saltedJoin(lSalted, r, "k", 4).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("__salt") === 7L) // user column untouched
  }

  test("s03 IVF: trained cells are consistent, brute force dominates, recall has a floor") {
    graft.functions.CustomFunctions.register(spark)
    val rows = VectorQueries.s03.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val cs = VectorQueries.trainedCentroids(spark, sf)
    assert(cs.length === 16 && cs.forall(_.length === 64))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cells = e.select(col("vec_id"), VectorQueries.cellOf(col("v"), cs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // dominance: every s03 cos ≤ the s01 top cos; ranks contiguous
    val s1 = VectorQueries.s01.fn(spark, sf).collect()
    val s1best = s1.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getDouble(3)).max }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getDouble(3)).max <= s1best(q) + 1e-12)
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length))
    }
    // self-cell sanity: each neighbor has an assigned cell
    rows.foreach(r => assert(cells.contains(r.getLong(2))))
    // recall@1 floor vs exact: with trained cells and 2 probes, at least
    // half the queries must find the true nearest neighbor
    val exactTop = s1.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivfTop = rows.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = exactTop.count { case (q, nn) => ivfTop.get(q).contains(nn) }
    info(s"IVF recall@1: $hits/${exactTop.size}")
    assert(hits * 2 >= exactTop.size, s"recall@1 too low: $hits/${exactTop.size}")
  }

  test("q24 distributed selection equals the rank-everything window form") {
    import org.apache.spark.sql.expressions.Window
    val byPrio = Window.partitionBy("o_orderpriority")
    val naive = graft.io.Tables.table(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn",
        row_number().over(byPrio.orderBy("o_totalprice", "o_orderkey")))
      .withColumn("n", count(lit(1)).over(byPrio))
      .crossJoin(spark.range(1).select(
        explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p")))
      .filter(col("rn") === ceil(col("p") * col("n")).cast("long"))
      .select(col("o_orderpriority"), col("p"), col("o_totalprice").as("value"))
      .orderBy("o_orderpriority", "p")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val dist = ExtendedQueries.q24.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(dist.toSeq === naive.toSeq)
  }

  test("q24 exact selection quantiles bracket approx_percentile's sketch answers") {
    val exact = ExtendedQueries.q24.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val approx = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .collect()
      .flatMap { r =>
        val qs = r.getSeq[Double](1)
        Seq(0.5, 0.9, 0.99).zip(qs).map { case (p, v) => (r.getString(0), p) -> v }
      }.toMap
    assert(exact.nonEmpty && exact.keySet === approx.keySet)
    // the sketch path q24's scaladoc points to agrees within 2% of the
    // exact ordered-selection answer
    exact.foreach { case (k, ev) =>
      assert(math.abs(approx(k) - ev) / ev < 0.02, s"$k: approx=${approx(k)} exact=$ev")
    }
  }

  test("q17/q18/q19 return rows and are internally consistent") {
    val q17 = ExtendedQueries.q17.fn(spark, sf).collect()
    val byOp = q17.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    // |union| = |intersect| + |except| + |auto \ hi|  ⇒  sanity: union ≥ both parts
    assert(byOp("union") >= byOp.getOrElse("intersect", 0) + byOp.getOrElse("except", 0))

    val q18 = ExtendedQueries.q18.fn(spark, sf).collect()
    val grand = q18.filter(r => r.getString(0) == "<all>" && r.getString(1) == "<all>")
    assert(grand.length === 1)
    val leaves = q18.filter(r => r.getString(0) != "<all>" && r.getString(1) != "<all>")
    assert(leaves.map(_.getAs[Long]("cnt")).sum === grand.head.getAs[Long]("cnt"))

    val q19ops = ExtendedQueries.q19.fn(spark, sf).collect().map(_.getString(0)).toSet
    assert(q19ops.contains("never_ordered"))
  }

  test("q25: the correlated spark.sql form decorrelates to the fused body's relation") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    val fused = canon(ExtendedQueries.q25.fn(spark, sf))
    assert(fused.nonEmpty)
    assert(canon(ExtendedQueries.q25Correlated(spark, sf)) === fused)
  }
}
