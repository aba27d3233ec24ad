package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAgg, NGramExplode, RollingHash, SimHashAgg, TopKAgg}

/** Property-based pinning of the custom Catalyst expressions: the
  * distributed-correctness invariants (partial-aggregation buffers must
  * be update-order- and partition-split-invariant — Spark may split and
  * merge in ANY arrangement) and reference-model equivalence for the
  * scalar/generator expressions. Pure expression-level tests: no
  * SparkSession, so hundreds of randomized cases run in milliseconds.
  */
class ExpressionPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  /** Split xs into consecutive chunks at the given cut ratios. */
  private def chunks[A](xs: List[A], cuts: List[Double]): List[List[A]] =
    cuts.sorted.distinct.foldLeft((List.empty[List[A]], xs)) {
      case ((acc, rest), cut) =>
        val at = (cut * xs.length).toInt.min(rest.length)
        val (h, t) = rest.splitAt(at - (xs.length - rest.length) max 0)
        (acc :+ h, t)
    } match { case (acc, rest) => acc :+ rest }

  test("MinHashAgg: signature is partition- and order-invariant, equals direct min-of-mix") {
    val agg = MinHashAgg(BoundReference(0, LongType, nullable = true), 16)
    def sigOf(groups: Seq[Seq[Long]]): Seq[Long] = {
      val merged = groups
        .map(g => g.foldLeft(agg.createAggregationBuffer()) {
          (b, x) => agg.update(b, InternalRow(x))
        })
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toSeq
    }
    val gen = for {
      xs <- Gen.listOf(Gen.long)
      cuts <- Gen.listOfN(2, Gen.choose(0.0, 1.0))
      // seed the permutation from the generator so failures replay
      // from the reported ScalaCheck seed
      shuffleSeed <- Gen.long
      shuffled = new scala.util.Random(shuffleSeed).shuffle(xs)
    } yield (xs, cuts, shuffled)
    check(Prop.forAll(gen) { case (xs, cuts, shuffled) =>
      val direct = (0 until 16).map { i =>
        if (xs.isEmpty) Long.MaxValue
        else xs.map(x => graft.functions.MinHashAgg.mix(x, i)).min
      }
      sigOf(List(xs)) == direct &&
        sigOf(chunks(xs, cuts)) == direct &&
        sigOf(List(shuffled)) == direct
    })
  }

  test("SimHashAgg: signature is partition-invariant and matches the sign model") {
    val agg = SimHashAgg(BoundReference(0, LongType, nullable = true))
    def sigOf(groups: Seq[Seq[Long]]): Long = {
      val merged = groups
        .map(g => g.foldLeft(agg.createAggregationBuffer()) {
          (b, x) => agg.update(b, InternalRow(x))
        })
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      agg.eval(merged).asInstanceOf[Long]
    }
    val gen = for {
      xs <- Gen.listOf(Gen.long)
      cuts <- Gen.listOfN(2, Gen.choose(0.0, 1.0))
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val model = (0 until 64).foldLeft(0L) { (sig, b) =>
        val votes = xs.map(x => if (((x >>> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) sig | (1L << b) else sig
      }
      sigOf(List(xs)) == model && sigOf(chunks(xs, cuts)) == model
    })
  }

  test("TopKAgg: partition-invariant and equals sort-take, including ties and NaN") {
    val child = BoundReference(0,
      StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
      nullable = true)
    val k = 5
    val agg = TopKAgg(child, k)
    def topOf(groups: Seq[Seq[(Double, Long)]]): Seq[(Double, Long)] = {
      val merged = groups
        .map(g => g.foldLeft(agg.createAggregationBuffer()) { (b, e) =>
          agg.update(b, InternalRow(InternalRow(e._1, e._2)))
        })
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val arr = agg.eval(merged).asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getDouble(0), r.getLong(1))
      }
    }
    val entry = for {
      ord <- Gen.oneOf(Gen.choose(-10.0, 10.0), Gen.oneOf(1.0, 2.0, Double.NaN))
      id <- Gen.choose(0L, 20L) // small range forces ties
    } yield (ord, id)
    val gen = for {
      xs <- Gen.listOf(entry)
      cuts <- Gen.listOfN(2, Gen.choose(0.0, 1.0))
    } yield (xs, cuts)
    // goodness order: ord DESC (NaN largest, Spark double sort), id ASC
    def cmp(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c < 0 else a._2 < b._2
    }
    // compare via doubleToLongBits: specialized Tuple2[Double, _]
    // equality is primitive ==, under which NaN != NaN
    def bits(s: Seq[(Double, Long)]): Seq[(Long, Long)] =
      s.map { case (d, i) => (java.lang.Double.doubleToLongBits(d), i) }
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val model = bits(xs.sortWith(cmp).take(k))
      bits(topOf(List(xs))) == model && bits(topOf(chunks(xs, cuts))) == model
    })
  }

  test("RollingHash: equals the reference byte fold for arbitrary ASCII strings") {
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    check(Prop.forAll(gen) { s =>
      val got = RollingHash(Literal(UTF8String.fromString(s), StringType),
        31L, 1000000007L).eval(InternalRow.empty)
      val want = s.getBytes("UTF-8").foldLeft(7L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      got == want
    })
  }

  test("Md5Lower64: little-endian low 8 digest bytes, matches DuckDB's known value") {
    // DuckDB: SELECT md5_number_lower('abc') = 8250560606382298838
    val abc = graft.functions.Md5Lower64(
      Literal(UTF8String.fromString("abc"), StringType)).eval(InternalRow.empty)
    assert(abc === 8250560606382298838L)
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    check(Prop.forAll(gen) { s =>
      val got = graft.functions.Md5Lower64(
        Literal(UTF8String.fromString(s), StringType)).eval(InternalRow.empty)
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val want = (8 to 15).foldRight(0L)((i, acc) => (acc << 8) | (dig(i) & 0xffL))
      got == want
    })
  }

  test("NGramExplode: emits max(0, len-n+1) windows, each the joined slice") {
    val tok = Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
    val gen = for {
      toks <- Gen.listOf(tok)
      n <- Gen.choose(1, 4)
    } yield (toks, n)
    check(Prop.forAll(gen) { case (toks, n) =>
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
      val rows = NGramExplode(Literal(arr, ArrayType(StringType)), n)
        .eval(InternalRow.empty).iterator.toList
        .map(_.getUTF8String(0).toString)
      val want = if (toks.length < n) Nil
      else toks.sliding(n).map(_.mkString(" ")).toList
      rows == want
    })
  }

  test("TokenWindowExplode: byte-scan windows equal split→sliding→join on the string") {
    // tokens may be empty (consecutive/leading/trailing spaces) and
    // multi-byte (codepoint safety of the byte cuts)
    val tok = Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('é'))).map(_.mkString)
    val gen = for {
      toks <- Gen.listOf(tok)
      k <- Gen.choose(1, 4)
    } yield (toks.mkString(" "), k)
    check(Prop.forAll(gen) { case (text, k) =>
      val rows = graft.functions.TokenWindowExplode(
        Literal(UTF8String.fromString(text), StringType), k)
        .eval(InternalRow.empty).iterator.toList
        .map(r => (r.getLong(0), r.getUTF8String(1).toString))
      val toks = text.split(" ", -1).toList
      val want = if (toks.length < k) Nil
      else toks.sliding(k).zipWithIndex
        .map { case (w, i) => (i + 1L, w.mkString(" ")) }.toList
      rows == want
    })
  }

  test("NGramStats: equals the explode→group-count model for arbitrary token arrays") {
    val tok = Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('a'))).map(_.mkString)
    val gen = for {
      toks <- Gen.listOf(tok)
      n <- Gen.choose(1, 4)
    } yield (toks, n)
    check(Prop.forAll(gen) { case (toks, n) =>
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
      val row = graft.functions.NGramStats(Literal(arr, ArrayType(StringType)), n)
        .eval(InternalRow.empty).asInstanceOf[InternalRow]
      val grams = if (toks.length < n) Nil
      else toks.sliding(n).map(_.mkString(" ")).toList
      val byGram = grams.groupBy(identity).view.mapValues(_.size)
      val want = (grams.size.toLong, byGram.size.toLong,
        if (grams.isEmpty) 0L else byGram.values.max.toLong)
      (row.getLong(0), row.getLong(1), row.getLong(2)) == want
    })
  }

  test("NGramCountExplode: distinct n-grams in first-occurrence order with exact multiplicities") {
    val tok = Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('a'))).map(_.mkString)
    val gen = for {
      toks <- Gen.listOf(tok)
      n <- Gen.choose(1, 4)
    } yield (toks, n)
    check(Prop.forAll(gen) { case (toks, n) =>
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
      val rows = graft.functions.NGramCountExplode(Literal(arr, ArrayType(StringType)), n)
        .eval(InternalRow.empty).iterator.toList
        .map(r => (r.getUTF8String(0).toString, r.getLong(1)))
      val grams = if (toks.length < n) Nil
      else toks.sliding(n).map(_.mkString(" ")).toList
      val want = grams.distinct.map(g => (g, grams.count(_ == g).toLong))
      rows == want
    })
  }
}
