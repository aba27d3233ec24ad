package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-fingerprinting / dedup
  * operator family (the "custom Expression beats UDF" path of the build
  * contract). All three run inside whole-stage codegen (RollingHash) or
  * as a single-pass imperative aggregate (MinHashAgg / SimHashAgg), so
  * the dedup pipelines stay shuffle-minimal: one aggregation produces a
  * whole signature instead of exploding numHashes× rows per shingle.
  */

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `acc_0 = 7; acc_{k+1} = (acc_k * base + byte_k) mod modulus`.
  *
  * The document-fingerprinting primitive (content-defined hashing) —
  * codegen'd so fingerprinting 100 TB of text stays inside
  * WholeStageCodegen. DuckDB-expressible via
  * `list_reduce(list_prepend(7, [ascii(c) ...]), ...)`, which is what the
  * oracle uses (byte == codepoint for ASCII corpora).
  */
case class RollingHash(child: Expression, base: Long, modulus: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 7L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % modulus
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 7L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${base}L + ($bytes[$i] & 0xff)) % ${modulus}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object MinHashAgg {
  /** splitmix64-style finalizer seeded per hash index: an independent
    * bijective mix of the 64-bit base hash for each of the numHashes
    * "permutations". Masked to non-negative so signatures read naturally.
    */
  def mix(x: Long, i: Int): Long = {
    var z = x + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }
}

/** MinHash signature aggregate: over a group of 64-bit shingle hashes
  * (e.g. `xxhash64(shingle)`), computes `sig[i] = min over shingles of
  * mix_i(hash)` for i < numHashes — the estimator
  * `P(sig_a[i] == sig_b[i]) = J(A,B)` behind MinHash-LSH near-dedup.
  *
  * A single-pass TypedImperativeAggregate with partial aggregation
  * (map-side combine): each partition reduces to one numHashes-long
  * buffer before the shuffle, vs the naive `explode(seqs) + groupBy`
  * plan that shuffles numHashes× the shingle count.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = MinHashAgg.mix(x, i)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
  override def prettyName: String = "minhash_agg"
}

/** Charikar SimHash aggregate: over a group of 64-bit feature hashes,
  * accumulates per-bit sign counts and emits the 64-bit signature whose
  * bit b is set iff more features had bit b set than clear. Hamming
  * distance between signatures ≈ angular distance between the feature
  * multisets. Single-pass, partial-aggregable (the 64 counters sum).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buffer(b) += (if (((x >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
  override def prettyName: String = "simhash_agg"
}

object Md5Lower64 {
  /** SQL/call_function builder with arity validation. */
  def fromExprs(exprs: Seq[Expression]): Md5Lower64 = {
    require(exprs.length == 1, "md5_lower64(value) takes exactly 1 argument")
    Md5Lower64(exprs.head)
  }

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of the MD5 digest (bytes 8..15, little-endian) as a
    * signed long — the bit pattern DuckDB's `md5_number_lower` yields as
    * UBIGINT. Called from generated code; MessageDigest is per-thread.
    */
  def hash64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
    h
  }
}

object HllPacked {
  /** SQL/call_function builder: `hll_packed(value, p)` with literal p. */
  def fromExprs(exprs: Seq[Expression]): HllPacked = {
    require(exprs.length == 2 && exprs(1).foldable,
      "hll_packed(value, p) requires a literal precision p")
    val pv = exprs(1).eval()
    require(pv != null && pv.isInstanceOf[Number], "p must be an integer literal")
    HllPacked(exprs.head, pv.asInstanceOf[Number].intValue())
  }

  /** One MD5 + register derivation per call, packed as (j << 8) | rho:
    * j = low p bits of the 64-bit hash, rho = leading-zero run of the
    * remaining 64-p bits plus one (= nlz(h >>> p) - p + 1 since the
    * shifted word always carries p guaranteed-zero high bits; the
    * w == 0 case degenerates to the same formula because nlz(0) = 64).
    * Bit-identical to the composed form the oracle computes with
    * `bin()`/`length()` — rho = (64-p+1) - len(bin(w)) and
    * len(bin(w)) = 64 - nlz(w) for w > 0. Called from generated code.
    */
  def packed(bytes: Array[Byte], p: Int): Long = {
    val h = Md5Lower64.hash64(bytes)
    val j = h & ((1L << p) - 1)
    val rho = java.lang.Long.numberOfLeadingZeros(h >>> p) - p + 1
    (j << 8) | rho
  }

  /** Long input: hashes the value's DECIMAL STRING bytes, identical to
    * `packed(CAST(v AS STRING))` — the oracle hashes VARCHAR, and
    * Long.toString emits the same ASCII bytes as Spark's long→string
    * cast, minus the per-row UTF8String round-trip.
    */
  def packedLong(v: Long, p: Int): Long =
    packed(java.lang.Long.toString(v).getBytes(
      java.nio.charset.StandardCharsets.US_ASCII), p)
}

/** HyperLogLog register derivation as ONE codegen pass (q20's hot map
  * side): hash → bucket j → rank rho, packed into a long, replacing the
  * composed md5_lower64 + bitwiseAND + shiftrightunsigned + bin() +
  * length() + CASE forest — the bin() branch allocated a up-to-56-char
  * string per input row. The oracle keeps the composed relational form
  * (DuckDB has no native twin), which stays bit-identical because both
  * derive from the same md5 low-64 bit pattern (see HllPacked.packed).
  * Reference anchor: the reference's DuckDB queries use approx-free
  * exact distincts (token_fee_analysis.py:204-249); this is the §2.4
  * scale answer, built oracle-recomputable.
  */
case class HllPacked(child: Expression, p: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hll_packed requires string, binary or bigint, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => HllPacked.packed(s.getBytes, p)
    case b: Array[Byte] => HllPacked.packed(b, p)
    case l: Long => HllPacked.packedLong(l, p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.HllPacked.packed($c.getBytes(), $p);"
      case LongType =>
        s"${ev.value} = graft.functions.HllPacked.packedLong($c, $p);"
      case _ =>
        s"${ev.value} = graft.functions.HllPacked.packed($c, $p);"
    })

  override protected def withNewChildInternal(newChild: Expression): HllPacked =
    copy(child = newChild)
  override def prettyName: String = "hll_packed"
}

/** 64-bit feature hash with a DuckDB twin: `md5_lower64(s)` equals
  * DuckDB `md5_number_lower(s)` bit-for-bit (as the signed
  * reinterpretation), unlike `xxhash64`, which no oracle engine can
  * recompute. Used by d04 so the SimHash pipeline is fully
  * oracle-checkable end to end; hashing cost is one MD5 per shingle —
  * acceptable for a dedup signature pass (and the price of
  * verifiability).
  */
case class Md5Lower64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_lower64 requires string or binary, got ${other.simpleString(10)}")
    }

  private def toBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Lower64.hash64(toBytes(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesExpr = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Md5Lower64.hash64(${bytesExpr(c)});"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64 =
    copy(child = newChild)
  override def prettyName: String = "md5_lower64"
}

object TopCells {
  /** SQL/call_function builder: `top_cells(v, centroidsLiteral, k)` with
    * a foldable array<array<double>> centroid literal and literal k.
    */
  def fromExprs(exprs: Seq[Expression]): TopCells = {
    require(exprs.length == 3, "top_cells(vector, centroids, k) takes 3 arguments")
    val shapeOk = exprs(1).dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    require(exprs(1).foldable && shapeOk,
      s"top_cells centroids must be a foldable array<array<double>>, got ${exprs(1).dataType.sql}")
    // Validate before touching — top_cells is exposed cluster-wide via the
    // extension SQL surface, so NULL literals / null-holding arrays are
    // user input, not internal invariants (same posture as
    // NGramExplode.fromExprs).
    val outerRaw = exprs(1).eval(null)
    require(outerRaw != null, "top_cells centroids must not be NULL")
    val outer = outerRaw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(outer.numElements() > 0, "top_cells needs at least one centroid")
    val cs = (0 until outer.numElements()).map { i =>
      require(!outer.isNullAt(i), s"top_cells centroid $i must not be NULL")
      val inner = outer.getArray(i)
      var j = 0
      while (j < inner.numElements()) {
        require(!inner.isNullAt(j),
          s"top_cells centroid $i holds a NULL component at $j")
        j += 1
      }
      inner.toDoubleArray()
    }.toArray
    require(cs.forall(_.length == cs(0).length),
      "top_cells centroids must all share one dimension")
    require(exprs(2).foldable, "top_cells k must be a literal")
    val kv = exprs(2).eval()
    require(kv != null && kv.isInstanceOf[Number],
      s"top_cells k must be a non-NULL integer literal, got $kv")
    val k = kv.asInstanceOf[Number].intValue()
    require(k > 0 && k <= cs.length, s"top_cells k must be in [1, ${cs.length}]")
    TopCells(exprs.head, cs, k)
  }

  /** Cell count above which routing goes through the two-level
    * coarse-quantizer index. Below it the flat loop wins and every
    * small index keeps the historic single-loop execution path (and
    * its exact-nearest semantics) byte-for-byte — which covers every
    * driver-tested scale (k = 16..80). The sf10 probe that motivated
    * this measured the flat loop at N·numCells dots — with numCells
    * grown ∝ N (VectorQueries.cellTargetSize) that is a quadratic
    * O(N²d/250) assignment pass: 0.85 s → 9.78 s for 10× data (11.5×
    * growth) on s03. Two-level routing restores ~O(N·√k·d).
    *
    * An EXACT grouped alternative was measured first and rejected: a
    * Cauchy-Schwarz group bound (dot(v,c) ≤ dot(v,μ_g) + ‖v‖·r_g,
    * groups visited best-bound-first with early stop) kept selection
    * bit-identical but pruned NOTHING on the 64-dim test embeddings —
    * near-uniform high-dim data gives every group a radius on the data
    * scale, so s03 at sf10 got SLOWER (12.7 s vs 9.8): the coarse dots
    * and bound sort were pure overhead. High-dimensional metric
    * pruning needs structure the worst-case corpus doesn't have;
    * the standard practice (FAISS coarse quantizer, IMI) is the
    * approximate rule below, which both engines replicate exactly.
    */
  val hierMin = 128

  /** Two-level coarse-quantizer routing index: the `numCells` centroids
    * are partitioned into ~√numCells groups (deterministic seeded Lloyd
    * on the centroids themselves — a pure function of the centroid
    * array, so executors rebuild it identically); each group keeps a
    * representative μ_g (member mean). Routing visits the top-P groups
    * by (dot(v,μ_g), groupId) lexicographic descending — P =
    * min(max(2,k), numGroups) — and selects the top-k member cells by
    * (dot, cellId) descending among ONLY those groups' members.
    *
    * This changes which cell a vector maps to versus the flat
    * exact-nearest loop (it is the standard IVF coarse-quantizer
    * approximation, FAISS's large-k assignment path) — but the rule is
    * DETERMINISTIC and part of the index definition: queries route with
    * the same rule, and the DuckDB oracle replicates it bit-for-bit
    * (VectorQueries.cellsRankedSql emits the matching two-level SQL
    * when the trained index is in this regime).
    */
  final case class Hier(
      numGroups: Int,
      coarseFlat: Array[Double],
      memberIds: Array[Int],
      groupStart: Array[Int])

  private[graft] def buildHier(cs: Array[Array[Double]]): Hier = {
    val n = cs.length
    val dim = cs(0).length
    val g0 = math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt)
    // SPHERICAL clustering of the centroids: both the Lloyd input and
    // the group representatives are L2-normalized. The fine stage ranks
    // cells by raw DOT, so the coarse stage must rank groups by
    // DIRECTION alignment alone — a plain mean of spread-out centroids
    // shrinks toward the origin and its dot ranking degenerates to
    // near-noise, concentrating assignments on a few large-norm cells
    // (measured: s06's Σ|cell|² blow-up, 2.1 s → 39.3 s at sf10, under
    // mean representatives). Normalized representatives give every
    // group an equal-norm voice and restore flat-like balance.
    def normalized(a: Array[Double]): Array[Double] = {
      var s = 0.0
      var d = 0
      while (d < dim) { s += a(d) * a(d); d += 1 }
      val nn = math.sqrt(s)
      if (nn == 0.0 || java.lang.Double.isNaN(nn)) a.clone()
      else { val o = new Array[Double](dim); d = 0; while (d < dim) { o(d) = a(d) / nn; d += 1 }; o }
    }
    val csn = cs.map(normalized)
    // deterministic seeds: evenly spaced centroids in id order
    var centers = Array.tabulate(g0)(i => csn(((i.toLong * n) / g0).toInt).clone())
    val assign = new Array[Int](n)
    var iter = 0
    while (iter < 15) {
      var i = 0
      while (i < n) {
        var bestG = 0
        var bestD = Double.PositiveInfinity
        var gi = 0
        while (gi < g0) {
          var dsq = 0.0
          var d = 0
          while (d < dim) {
            val t = csn(i)(d) - centers(gi)(d); dsq += t * t; d += 1
          }
          if (dsq < bestD) { bestD = dsq; bestG = gi }
          gi += 1
        }
        assign(i) = bestG
        i += 1
      }
      val sums = Array.ofDim[Double](g0, dim)
      val cnt = new Array[Int](g0)
      i = 0
      while (i < n) {
        val gi = assign(i); cnt(gi) += 1
        var d = 0
        while (d < dim) { sums(gi)(d) += csn(i)(d); d += 1 }
        i += 1
      }
      centers = Array.tabulate(g0) { gi =>
        if (cnt(gi) == 0) centers(gi)
        else normalized(sums(gi)) // spherical: representative re-normalized
      }
      iter += 1
    }
    // compact to non-empty groups, members in ascending cell id
    val byGroup = (0 until n).groupBy(assign)
    val liveGroups = (0 until g0).filter(byGroup.contains)
    val g = liveGroups.length
    val coarseFlat = new Array[Double](g * dim)
    val memberIds = new Array[Int](n)
    val groupStart = new Array[Int](g + 1)
    var pos = 0
    liveGroups.zipWithIndex.foreach { case (gi, out) =>
      System.arraycopy(centers(gi), 0, coarseFlat, out * dim, dim)
      groupStart(out) = pos
      byGroup(gi).foreach { cell => memberIds(pos) = cell; pos += 1 }
    }
    groupStart(g) = pos
    Hier(g, coarseFlat, memberIds, groupStart)
  }
}

/** Top-k inverted-list cells by centroid dot product — the IVF routing
  * primitive (cell assignment at k=1, multi-probe at k>1). One codegen'd
  * double loop replaces the composed `sort_array(array(struct(dot, i),
  * ...))` ranking tree, whose SortArray node is CodegenFallback and
  * drops the whole per-row projection out of whole-stage codegen — the
  * same failure mode PqEncode fixed for the s04 encoder. Selection
  * order matches the composed form bit-for-bit: (dot, cellId)
  * lexicographic DESCENDING (ties → larger id first), dots accumulated
  * in ascending element order like ArrayDot.
  */
case class TopCells(child: Expression, centroids: Array[Array[Double]], k: Int)
    extends UnaryExpression {

  private val numCells = centroids.length
  private val dim = centroids(0).length

  /** [cell*dim] row-major centroid components. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](numCells * dim)
    var c = 0
    while (c < numCells) {
      var d = 0
      while (d < dim) { a(c * dim + d) = centroids(c)(d); d += 1 }
      c += 1
    }
    a
  }

  /** Grouped-centroid pruning index (see [[TopCells.Hier]]); built only
    * above [[TopCells.hierMin]] cells, deterministically per JVM.
    */
  @transient private lazy val hier: TopCells.Hier = TopCells.buildHier(centroids)

  private def useHier: Boolean = numCells >= TopCells.hierMin

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_cells requires array<double>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (useHier) return hierEval(v)
    // Clamp to the input's actual length and skip null elements (treated
    // as 0-components), mirroring ArrayDot — an unclamped getDouble(d)
    // past numElements() reads out-of-bounds Unsafe memory and yields
    // silent garbage cell assignments.
    val lim = math.min(dim, v.numElements())
    val dots = new Array[Double](numCells)
    var c = 0
    while (c < numCells) {
      var s = 0.0
      var d = 0
      while (d < lim) {
        if (!v.isNullAt(d)) s += v.getDouble(d) * flat(c * dim + d)
        d += 1
      }
      dots(c) = s
      c += 1
    }
    val out = new Array[Int](k)
    val used = new Array[Boolean](numCells)
    var p = 0
    while (p < k) {
      var bestI = -1
      var best = Double.NegativeInfinity
      var i = 0
      while (i < numCells) {
        // (dot, id) lexicographic desc via Double.compare — a TOTAL
        // order: NaN sorts largest (matching sort_array / DuckDB
        // list_sort), equal dot → larger id wins. Raw >/== would never
        // pick a NaN-dot cell appearing after a non-NaN one.
        if (!used(i)) {
          val c = java.lang.Double.compare(dots(i), best)
          if (bestI < 0 || c > 0 || (c == 0 && i > bestI)) {
            best = dots(i); bestI = i
          }
        }
        i += 1
      }
      used(bestI) = true
      out(p) = bestI
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Two-level routing (numCells ≥ hierMin) — see [[TopCells.Hier]]:
    * top-P coarse groups by (dot(v,μ_g), groupId) descending, then
    * top-k member cells by (dot, cellId) descending among those groups'
    * members only. Both ranking steps use the same lexicographic-desc
    * total order (Double.compare, ties → larger id) as the flat loop,
    * and member dots accumulate in the same ascending element order, so
    * the DuckDB twin reproduces the selection bit-for-bit.
    */
  private def hierEval(v: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val h = hier
    val lim = math.min(dim, v.numElements())
    val g = h.numGroups
    val p = math.min(math.max(2, k), g)
    val cdots = new Array[Double](g)
    var gi = 0
    while (gi < g) {
      var s = 0.0
      var d = 0
      while (d < lim) {
        if (!v.isNullAt(d)) s += v.getDouble(d) * h.coarseFlat(gi * dim + d)
        d += 1
      }
      cdots(gi) = s
      gi += 1
    }
    // top-P groups: repeated argmax with the flat loop's tie rule
    val probe = new Array[Int](p)
    val gUsed = new Array[Boolean](g)
    var pi = 0
    while (pi < p) {
      var bestG = -1
      var best = Double.NegativeInfinity
      gi = 0
      while (gi < g) {
        if (!gUsed(gi)) {
          val c = java.lang.Double.compare(cdots(gi), best)
          if (bestG < 0 || c > 0 || (c == 0 && gi > bestG)) {
            best = cdots(gi); bestG = gi
          }
        }
        gi += 1
      }
      gUsed(bestG) = true
      probe(pi) = bestG
      pi += 1
    }
    // top-k member cells among the probed groups (insertion top-k)
    val tv = new Array[Double](k)
    val ti = new Array[Int](k)
    var tc = 0
    pi = 0
    while (pi < p) {
      val grp = probe(pi)
      var m = h.groupStart(grp)
      val end = h.groupStart(grp + 1)
      while (m < end) {
        val cell = h.memberIds(m)
        var s = 0.0
        var d = 0
        while (d < lim) {
          if (!v.isNullAt(d)) s += v.getDouble(d) * flat(cell * dim + d)
          d += 1
        }
        val cLast = if (tc < k) 1 else java.lang.Double.compare(s, tv(k - 1))
        if (cLast > 0 || (cLast == 0 && cell > ti(k - 1))) {
          var j = if (tc < k) { tc += 1; tc - 1 } else k - 1
          tv(j) = s; ti(j) = cell
          var sift = true
          while (j > 0 && sift) {
            val c0 = java.lang.Double.compare(tv(j), tv(j - 1))
            if (c0 > 0 || (c0 == 0 && ti(j) > ti(j - 1))) {
              val dv = tv(j); tv(j) = tv(j - 1); tv(j - 1) = dv
              val di = ti(j); ti(j) = ti(j - 1); ti(j - 1) = di
              j -= 1
            } else sift = false
          }
        }
        m += 1
      }
      pi += 1
    }
    // P = min(max(2,k), numGroups) guarantees ≥ k candidate members
    // (every group is non-empty; P = numGroups covers all cells)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(ti)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (useHier) doGenCodeHier(ctx, ev)
    else nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("cellFlat", flat, "double[]")
      val dots = ctx.freshName("dots")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI")
      val cmpRes = ctx.freshName("cmpRes")
      val lim = ctx.freshName("lim")
      s"""
         |int $lim = java.lang.Math.min($dim, $v.numElements());
         |double[] $dots = new double[$numCells];
         |for (int $c = 0; $c < $numCells; $c++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$v.isNullAt($d)) $s += $v.getDouble($d) * $flatRef[$c * $dim + $d];
         |  }
         |  $dots[$c] = $s;
         |}
         |boolean[] $used = new boolean[$numCells];
         |int[] $out = new int[$k];
         |for (int $p = 0; $p < $k; $p++) {
         |  int $bestI = -1;
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < $numCells; $i++) {
         |    if (!$used[$i]) {
         |      int $cmpRes = Double.compare($dots[$i], $best);
         |      if ($bestI < 0 || $cmpRes > 0 || ($cmpRes == 0 && $i > $bestI)) {
         |        $best = $dots[$i]; $bestI = $i;
         |      }
         |    }
         |  }
         |  $used[$bestI] = true;
         |  $out[$p] = $bestI;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  /** Codegen twin of [[hierEval]] — the same two-level algorithm as
    * straight-line Java with runtime loops (nothing unrolls: at the
    * cell counts where this path activates, unrolled dot chains would
    * blow the 64KB method limit the flat composed form already avoids
    * by looping).
    */
  private def doGenCodeHier(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val h = hier
      val g = h.numGroups
      val p = math.min(math.max(2, k), g)
      val flatRef = ctx.addReferenceObj("cellFlat", flat, "double[]")
      val coarseRef = ctx.addReferenceObj("coarseFlat", h.coarseFlat, "double[]")
      val memberRef = ctx.addReferenceObj("cellMembers", h.memberIds, "int[]")
      val startRef = ctx.addReferenceObj("cellGroupStart", h.groupStart, "int[]")
      val lim = ctx.freshName("lim")
      val cdots = ctx.freshName("cdots")
      val probe = ctx.freshName("probe")
      val gUsed = ctx.freshName("gUsed")
      val tv = ctx.freshName("tv")
      val ti = ctx.freshName("ti")
      val tc = ctx.freshName("tc")
      val d = ctx.freshName("d")
      val gi = ctx.freshName("gi")
      val s = ctx.freshName("s")
      val pi = ctx.freshName("pi")
      val bestG = ctx.freshName("bestG")
      val best = ctx.freshName("best")
      val cmpRes = ctx.freshName("cmpRes")
      val grp = ctx.freshName("grp")
      val m = ctx.freshName("m")
      val end = ctx.freshName("end")
      val cell = ctx.freshName("cell")
      val cLast = ctx.freshName("cLast")
      val j = ctx.freshName("j")
      val c0 = ctx.freshName("c0")
      val dv = ctx.freshName("dv")
      val di = ctx.freshName("di")
      s"""
         |int $lim = java.lang.Math.min($dim, $v.numElements());
         |double[] $cdots = new double[$g];
         |for (int $gi = 0; $gi < $g; $gi++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$v.isNullAt($d)) $s += $v.getDouble($d) * $coarseRef[$gi * $dim + $d];
         |  }
         |  $cdots[$gi] = $s;
         |}
         |int[] $probe = new int[$p];
         |boolean[] $gUsed = new boolean[$g];
         |for (int $pi = 0; $pi < $p; $pi++) {
         |  int $bestG = -1;
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $gi = 0; $gi < $g; $gi++) {
         |    if (!$gUsed[$gi]) {
         |      int $cmpRes = Double.compare($cdots[$gi], $best);
         |      if ($bestG < 0 || $cmpRes > 0 || ($cmpRes == 0 && $gi > $bestG)) {
         |        $best = $cdots[$gi]; $bestG = $gi;
         |      }
         |    }
         |  }
         |  $gUsed[$bestG] = true;
         |  $probe[$pi] = $bestG;
         |}
         |double[] $tv = new double[$k];
         |int[] $ti = new int[$k];
         |int $tc = 0;
         |for (int $pi = 0; $pi < $p; $pi++) {
         |  int $grp = $probe[$pi];
         |  int $end = $startRef[$grp + 1];
         |  for (int $m = $startRef[$grp]; $m < $end; $m++) {
         |    int $cell = $memberRef[$m];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) {
         |      if (!$v.isNullAt($d)) $s += $v.getDouble($d) * $flatRef[$cell * $dim + $d];
         |    }
         |    int $cLast = ($tc < $k) ? 1 : Double.compare($s, $tv[$k - 1]);
         |    if ($cLast > 0 || ($cLast == 0 && $cell > $ti[$k - 1])) {
         |      int $j;
         |      if ($tc < $k) { $j = $tc; $tc++; } else { $j = $k - 1; }
         |      $tv[$j] = $s; $ti[$j] = $cell;
         |      while ($j > 0) {
         |        int $c0 = Double.compare($tv[$j], $tv[$j - 1]);
         |        if ($c0 > 0 || ($c0 == 0 && $ti[$j] > $ti[$j - 1])) {
         |          double $dv = $tv[$j]; $tv[$j] = $tv[$j - 1]; $tv[$j - 1] = $dv;
         |          int $di = $ti[$j]; $ti[$j] = $ti[$j - 1]; $ti[$j - 1] = $di;
         |          $j--;
         |        } else break;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($ti);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
  override def prettyName: String = "top_cells"
}

object NGramExplode {
  /** SQL/call_function builder: `ngrams(arr, n)` with a foldable
    * positive integer n.
    */
  def fromExprs(exprs: Seq[Expression]): NGramExplode = {
    require(exprs.length == 2 && exprs(1).foldable,
      "ngrams(arr, n) requires a literal n")
    val nv = exprs(1).eval()
    require(nv != null && nv.isInstanceOf[Number] &&
        nv.asInstanceOf[Number].intValue() > 0,
      s"ngrams n must be a positive integer literal, got $nv")
    NGramExplode(exprs.head, nv.asInstanceOf[Number].intValue())
  }
}

/** Sliding word-n-gram generator (UDTF rung of the extension ladder):
  * emits one row per window of `n` consecutive tokens of an
  * array<string>, joined with single spaces — the collocation /
  * shingling primitive behind bigram statistics (t10). A native
  * Catalyst `Generator` planned as `Generate`, so n-gramming a corpus
  * is one generate stage with NO intermediate array materialization —
  * vs the `transform(sequence(...), i -> concat_ws(...))` + explode
  * composition, which builds every document's full n-gram array on the
  * heap before exploding it, with the lambda evaluated interpretively
  * per window.
  *
  * Rows with fewer than n tokens emit nothing; NULL tokens are SKIPPED
  * when joining a window (ConcatWs semantics — "a",NULL,"b" at n=3
  * yields "a b"), exactly matching the concat_ws-composed declarative
  * form this generator replaces (split() never produces nulls in our
  * pipelines, so the gate is insensitive to the choice).
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams requires array<string>, got ${other.simpleString(10)}")
    }

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val len = arr.numElements()
      if (len < n) Iterator.empty
      else {
        val toks = new Array[UTF8String](len)
        var i = 0
        while (i < len) {
          toks(i) =
            if (arr.isNullAt(i)) null else arr.getUTF8String(i)
          i += 1
        }
        val sep = UTF8String.fromString(" ")
        (0 to len - n).iterator.map { s =>
          val parts = new Array[UTF8String](n)
          System.arraycopy(toks, s, parts, 0, n)
          InternalRow(UTF8String.concatWs(sep, parts: _*))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
  override def prettyName: String = "ngrams"
}

object NGramDistinctExplode {
  /** SQL/call_function builder: `ngrams_distinct(arr, n)` (same
    * validation contract as NGramExplode.fromExprs).
    */
  def fromExprs(exprs: Seq[Expression]): NGramDistinctExplode = {
    require(exprs.length == 2 && exprs(1).foldable,
      "ngrams_distinct(arr, n) requires a literal n")
    val nv = exprs(1).eval()
    require(nv != null && nv.isInstanceOf[Number] &&
        nv.asInstanceOf[Number].intValue() > 0,
      s"ngrams_distinct n must be a positive integer literal, got $nv")
    NGramDistinctExplode(exprs.head, nv.asInstanceOf[Number].intValue())
  }
}

/** DISTINCT sliding word-n-grams of one row, each tagged with the row's
  * distinct-n-gram count: (sz, g) rows in first-occurrence order — the
  * shingling primitive behind the dedup ladder (d02/d03/d04/d06/d13),
  * whose similarity math needs every posting to carry its document's
  * distinct-shingle count map-side.
  *
  * Exists because the declarative composition
  * `explode(array_distinct(transform(sequence(...), i ->
  * concat_ws(..., element_at(w, i+1), ...))))` is quadratic in document
  * length once CollapseProject inlines the `split(text)` that produced
  * `w` into the lambda body: ArrayTransform is CodegenFallback, so the
  * lambda runs interpreted and re-splits the ENTIRE document for every
  * element_at of every window — O(3·W²) per doc (round-10 catch: one
  * 390 s straggler task in the cold shingle materialization at sf10,
  * jstack showed StringSplit.nullSafeEval under ConcatWs.eval). Here
  * the token array is evaluated ONCE per row and the window slide +
  * row-local dedup is O(W·n).
  *
  * Rows with fewer than n tokens emit nothing; NULL tokens are SKIPPED
  * when joining a window (ConcatWs semantics — "a",NULL,"b" at n=3
  * yields "a b"), exactly matching the concat_ws-composed declarative
  * form this generator replaces (split() never produces nulls in our
  * pipelines, so the gate is insensitive to the choice).
  */
case class NGramDistinctExplode(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams_distinct requires array<string>, got ${other.simpleString(10)}")
    }

  override def elementSchema: StructType = new StructType()
    .add("sz", LongType, nullable = false)
    .add("g", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val len = arr.numElements()
      if (len < n) Iterator.empty
      else {
        val toks = new Array[UTF8String](len)
        var i = 0
        while (i < len) {
          toks(i) =
            if (arr.isNullAt(i)) null else arr.getUTF8String(i)
          i += 1
        }
        val sep = UTF8String.fromString(" ")
        // first-occurrence order = array_distinct's order, so the
        // composed form and this generator emit IDENTICAL row sequences
        val seen = new java.util.LinkedHashSet[UTF8String]()
        var s = 0
        while (s <= len - n) {
          val parts = new Array[UTF8String](n)
          System.arraycopy(toks, s, parts, 0, n)
          seen.add(UTF8String.concatWs(sep, parts: _*))
          s += 1
        }
        val sz = seen.size.toLong
        val it = seen.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = InternalRow(sz, it.next())
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramDistinctExplode =
    copy(child = newChild)
  override def prettyName: String = "ngrams_distinct"
}

object NGramCountExplode {
  /** SQL/call_function builder: `ngram_counts(tokens, n)` (same
    * validation contract as NGramExplode.fromExprs).
    */
  def fromExprs(exprs: Seq[Expression]): NGramCountExplode = {
    require(exprs.length == 2, "ngram_counts(tokens, n) takes 2 arguments")
    val nExpr = exprs(1)
    require(nExpr.foldable, "ngram_counts n must be a literal")
    val nv = nExpr.eval()
    require(nv != null, "ngram_counts n must not be NULL")
    val n = nv.asInstanceOf[Number].intValue()
    require(n >= 1, s"ngram_counts n must be >= 1, got $n")
    NGramCountExplode(exprs(0), n)
  }
}

/** Generator emitting each DISTINCT n-gram of a token array once, with
  * its within-row multiplicity: `(ngram string, cnt long)` rows, in
  * first-occurrence order. N-gram strings match [[NGramExplode]]
  * exactly (space-joined, NULL tokens skipped per ConcatWs).
  *
  * The corpus-statistics primitive behind collocation/document-frequency
  * scans (t10): `ngrams(...)` explodes every INSTANCE, so a downstream
  * `COUNT(DISTINCT doc_id)` needs Spark's two-phase distinct aggregate
  * over instance-count rows; this pre-collapses each row's duplicates
  * map-side — the (ngram, doc) distinctness the two-phase plan shuffles
  * to establish is already true row-locally — so per-ngram totals and
  * document frequencies become ONE ordinary partial-aggregated groupBy
  * (`SUM(cnt)`, `COUNT(*)`).
  */
case class NGramCountExplode(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_counts requires array<string>, got ${other.simpleString(10)}")
    }

  override def elementSchema: StructType = new StructType()
    .add("ngram", StringType, nullable = false)
    .add("cnt", LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val len = arr.numElements()
      if (len < n) Iterator.empty
      else {
        val toks = new Array[UTF8String](len)
        var i = 0
        while (i < len) {
          toks(i) =
            if (arr.isNullAt(i)) null else arr.getUTF8String(i)
          i += 1
        }
        val sep = UTF8String.fromString(" ")
        val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
        var s = 0
        while (s <= len - n) {
          val parts = new Array[UTF8String](n)
          System.arraycopy(toks, s, parts, 0, n)
          val g = UTF8String.concatWs(sep, parts: _*)
          val prev = counts.get(g)
          counts.put(g, if (prev == null) 1L else prev.longValue() + 1L)
          s += 1
        }
        val it = counts.entrySet().iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = {
            val e = it.next()
            InternalRow(e.getKey, e.getValue.longValue())
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramCountExplode =
    copy(child = newChild)
  override def prettyName: String = "ngram_counts"
}

object NGramStats {
  /** SQL/call_function builder: `ngram_stats(tokens, n)` with a foldable
    * non-null integer n ≥ 1 (same validation contract as
    * NGramExplode.fromExprs).
    */
  def fromExprs(exprs: Seq[Expression]): NGramStats = {
    require(exprs.length == 2, "ngram_stats(tokens, n) takes 2 arguments")
    val nExpr = exprs(1)
    require(nExpr.foldable, "ngram_stats n must be a literal")
    val nv = nExpr.eval()
    require(nv != null, "ngram_stats n must not be NULL")
    val n = nv.asInstanceOf[Number].intValue()
    require(n >= 1, s"ngram_stats n must be >= 1, got $n")
    NGramStats(exprs(0), n)
  }

  /** One pass over the token array: total n-gram count, distinct n-gram
    * count, and the highest single n-gram multiplicity. N-gram strings
    * are built exactly as [[NGramExplode]] builds them (space-joined,
    * NULL tokens skipped per ConcatWs), so the stats equal the
    * explode→GROUP BY composition's aggregate row for every input.
    */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): InternalRow = {
    val len = arr.numElements()
    val total = len - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Int](total * 2)
    var top = 0
    var s = 0
    while (s < total) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, s, parts, 0, n)
      val g = UTF8String.concatWs(sep, parts: _*)
      val c = counts.getOrDefault(g, 0) + 1
      counts.put(g, c)
      if (c > top) top = c
      s += 1
    }
    new GenericInternalRow(
      Array[Any](total.toLong, counts.size().toLong, top.toLong))
  }
}

/** Per-row n-gram repetition statistics over a token array:
  * `struct(n_ngrams, n_distinct, top_cnt)` — total n-grams (with
  * duplicates), distinct n-grams, and the top n-gram's multiplicity.
  *
  * The repetition-scoring primitive (t08): the explode→GROUP BY
  * (doc, ngram)→GROUP BY doc composition shuffles every n-gram of every
  * document (tokens× the corpus size, strings no less) to compute what
  * is a PER-DOCUMENT property; this computes the same three aggregates
  * map-side in one pass per row, so the only shuffle-sized data left in
  * a repetition scan is the output itself. Stats are order-insensitive
  * (map size / max multiplicity), so the result is deterministic under
  * any partitioning. Codegen emits a single static call — the loop
  * stays out of the generated method body but the projection stays
  * inside whole-stage codegen (no CodegenFallback).
  */
case class NGramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = new StructType()
    .add("n_ngrams", LongType, nullable = false)
    .add("n_distinct", LongType, nullable = false)
    .add("top_cnt", LongType, nullable = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_stats requires array<string>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NGramStats.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramStats$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramStats =
    copy(child = newChild)
  override def prettyName: String = "ngram_stats"
}

object TokenWindowExplode {
  /** SQL/call_function builder: `token_windows(text, k)` with a
    * foldable positive integer k (tokens per sliding window).
    */
  def fromExprs(exprs: Seq[Expression]): TokenWindowExplode = {
    require(exprs.length == 2 && exprs(1).foldable,
      "token_windows(text, k) requires a literal k")
    val kv = exprs(1).eval()
    require(kv != null && kv.isInstanceOf[Number] &&
        kv.asInstanceOf[Number].intValue() > 0,
      s"token_windows k must be a positive integer literal, got $kv")
    TokenWindowExplode(exprs.head, kv.asInstanceOf[Number].intValue())
  }
}

/** SLIDING k-token window generator (the d10 exact-substring-dedup
  * primitive): emits one `(i, win)` row per window of k consecutive
  * whitespace-split tokens at every start position — i is the 1-based
  * token index of the window's first token (matching DuckDB's
  * `generate_series(1, len(w)-k+1)` / `list_slice(w, i, i+k-1)`), and
  * `win` is the space-joined window text. Split-on-space then
  * join-with-space is the identity, so window i IS the byte substring
  * from token i's start to the space before token i+k — this generator
  * collects the token start offsets in ONE byte scan and cuts each
  * window as a substring, never materializing the token array or a
  * per-window lambda chain. Space bytes are ASCII, so byte cuts are
  * codepoint-safe in UTF-8. Rows with fewer than k tokens emit nothing
  * (same as the SQL form's empty generate_series range).
  */
case class TokenWindowExplode(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_windows requires string, got ${other.simpleString(10)}")
    }

  override def elementSchema: StructType = new StructType()
    .add("i", LongType, nullable = false)
    .add("win", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val b = v.asInstanceOf[UTF8String].getBytes
      val n = b.length
      // token start byte offsets: 0, then one past every space
      var starts = new Array[Int](16)
      starts(0) = 0
      var nTok = 1
      var i = 0
      while (i < n) {
        if (b(i) == ' ') {
          if (nTok == starts.length)
            starts = java.util.Arrays.copyOf(starts, nTok * 2)
          starts(nTok) = i + 1
          nTok += 1
        }
        i += 1
      }
      if (nTok < k) Iterator.empty
      else {
        val cuts = starts
        val tokens = nTok
        (0 to tokens - k).iterator.map { s =>
          // window = tokens [s, s+k-1]; exclusive byte end is the space
          // before token s+k, or end-of-string for the last window
          val until = if (s + k < tokens) cuts(s + k) - 1 else n
          InternalRow(s + 1L,
            UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, cuts(s), until)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindowExplode =
    copy(child = newChild)
  override def prettyName: String = "token_windows"
}

object PassageExplode {
  /** SQL/call_function builder: `passages(text, k)` with a foldable
    * positive integer k (tokens per passage).
    */
  def fromExprs(exprs: Seq[Expression]): PassageExplode = {
    require(exprs.length == 2 && exprs(1).foldable,
      "passages(text, k) requires a literal k")
    val kv = exprs(1).eval()
    require(kv != null && kv.isInstanceOf[Number] &&
        kv.asInstanceOf[Number].intValue() > 0,
      s"passages k must be a positive integer literal, got $kv")
    PassageExplode(exprs.head, kv.asInstanceOf[Number].intValue())
  }
}

/** Non-overlapping k-token passage generator (the d08 splitting
  * primitive): emits one `(i, passage)` row per window of k consecutive
  * whitespace-split tokens. Split-on-space followed by join-with-space
  * is the identity, so passage i IS the byte substring of the original
  * text between the (i·k)-th and ((i+1)·k)-th spaces — this generator
  * cuts those substrings in ONE byte scan, vs the
  * `split → transform(sequence, i -> array_join(slice(...)))` +
  * posexplode composition, which materializes the full token array AND
  * every passage through an interpretively-evaluated lambda before
  * exploding. Space bytes are ASCII, so byte cuts are codepoint-safe in
  * UTF-8; consecutive spaces produce the same empty tokens split()
  * produces (they rejoin as the original byte run). Empty text emits
  * one empty passage (split('') is ['']) — ceil((spaces+1)/k) rows
  * always, the same count `token_stats.ws_tokens` predicts.
  */
case class PassageExplode(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"passages requires string, got ${other.simpleString(10)}")
    }

  override def elementSchema: StructType = new StructType()
    .add("i", IntegerType, nullable = false)
    .add("passage", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val b = v.asInstanceOf[UTF8String].getBytes
      val n = b.length
      // start byte offsets of each passage: 0, then one past every
      // k-th space
      var starts = new Array[Int](8)
      starts(0) = 0
      var nStarts = 1
      var spaces = 0
      var i = 0
      while (i < n) {
        if (b(i) == ' ') {
          spaces += 1
          if (spaces % k == 0) {
            if (nStarts == starts.length)
              starts = java.util.Arrays.copyOf(starts, nStarts * 2)
            starts(nStarts) = i + 1
            nStarts += 1
          }
        }
        i += 1
      }
      val cuts = starts
      val total = nStarts
      (0 until total).iterator.map { p =>
        val from = cuts(p)
        // exclusive end: the space byte before the next passage, or n
        val until = if (p + 1 < total) cuts(p + 1) - 1 else n
        InternalRow(p,
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, from, until)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PassageExplode =
    copy(child = newChild)
  override def prettyName: String = "passages"
}

object TokenStats {
  /** SQL/call_function builder: `token_stats(text)`. */
  def fromExprs(exprs: Seq[Expression]): TokenStats = {
    require(exprs.length == 1, "token_stats(text) takes 1 argument")
    TokenStats(exprs.head)
  }

  /** One pass over the UTF-8 bytes: whitespace-split token count
    * (`size(split(text, ' '))` = space count + 1 — split with an
    * unbounded limit keeps trailing empties, so the identity is exact,
    * empty string included) and the BPE-ish token count
    * (`size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))`):
    * leftmost-first alternation over maximal runs means one match per
    * maximal lowercase-alpha run, one per maximal digit run, one per
    * OTHER CODEPOINT — counted at its UTF-8 lead byte (continuation
    * bytes skip, mirroring both engines' per-codepoint classes).
    * Counting without materializing the match array is the point: the
    * regexp_extract_all form allocates every token string to take a
    * length.
    */
  def compute(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0L
    var re = 0L
    // 0 = none/other, 1 = in [a-z] run, 2 = in [0-9] run
    var state = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == ' ') { spaces += 1; state = 0 }
      else if (c >= 'a' && c <= 'z') {
        if (state != 1) { re += 1; state = 1 }
      } else if (c >= '0' && c <= '9') {
        if (state != 2) { re += 1; state = 2 }
      } else if ((c & 0xC0) != 0x80) { // any other codepoint's lead byte
        re += 1; state = 0
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](spaces + 1, re))
  }
}

/** Single-pass token-budget estimators: `token_stats(text)` returns
  * `struct(ws_tokens, re_tokens)` — the whitespace-split count and the
  * BPE-ish regex token count ([[TokenStats.compute]] pins both
  * identities) — without running a regex engine or materializing a
  * match array. The t03 hot path: the builtin form allocates every
  * matched token into an array per row just to measure its size; this
  * is an allocation-free byte scan called from generated code, so the
  * token-counting pass over a corpus stays memory-bandwidth-bound.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = new StructType()
    .add("ws_tokens", LongType, nullable = false)
    .add("re_tokens", LongType, nullable = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_stats requires string, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}

object WordRedact {
  /** SQL/call_function builder:
    * `word_redact(text, array(patterns...), array(replacements...))`
    * with foldable same-length string arrays (literal-validated at
    * analysis, the TopCells posture).
    */
  def fromExprs(exprs: Seq[Expression]): WordRedact = {
    require(exprs.length == 3,
      "word_redact(text, patterns, replacements) takes 3 arguments")
    def lits(e: Expression, what: String): Seq[String] = {
      require(e.foldable && e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == StringType,
        s"word_redact $what must be a foldable array<string>")
      val v = e.eval()
      require(v != null, s"word_redact $what must not be NULL")
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until arr.numElements()).map { i =>
        require(!arr.isNullAt(i), s"word_redact $what elements must not be NULL")
        arr.getUTF8String(i).toString
      }
    }
    val pats = lits(exprs(1), "patterns")
    val repls = lits(exprs(2), "replacements")
    require(pats.nonEmpty, "word_redact needs at least one pattern")
    require(pats.length == repls.length,
      s"word_redact patterns (${pats.length}) and replacements (${repls.length}) must align")
    WordRedact(exprs.head, pats, repls)
  }

  private def isWordByte(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Parse the restricted registry grammar `\bword\b` /
    * `\b(w1|w2|...)\b` (plain or non-capturing group, alternatives of
    * ASCII word chars). Within it, a match of the Java/RE2 pattern is
    * EXACTLY a maximal word-char run equal to one alternative: every
    * alternative is all word chars, so both `\b`s can only sit at run
    * edges — which reduces the regex to run tokenization + set
    * membership, no engine and no backtracking. Anything outside the
    * grammar → None → the compiled-regex fallback path.
    */
  private[graft] def parseWords(pattern: String): Option[Array[Array[Byte]]] = {
    if (!pattern.startsWith("\\b") || !pattern.endsWith("\\b")) return None
    var core = pattern.substring(2, pattern.length - 2)
    if (core.startsWith("(?:") && core.endsWith(")"))
      core = core.substring(3, core.length - 1)
    else if (core.startsWith("(") && core.endsWith(")"))
      core = core.substring(1, core.length - 1)
    if (core.isEmpty) return None
    val alts = core.split("\\|", -1)
    val words = new Array[Array[Byte]](alts.length)
    var i = 0
    while (i < alts.length) {
      val a = alts(i)
      if (a.isEmpty) return None
      var j = 0
      while (j < a.length) {
        val ch = a.charAt(j)
        if (ch > 127 || !isWordByte(ch.toByte)) return None
        j += 1
      }
      words(i) = a.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    Some(words)
  }

  private def runMatches(b: Array[Byte], start: Int, end: Int,
      words: Array[Array[Byte]]): Boolean = {
    val len = end - start
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          if (b(start + j) != word(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      w += 1
    }
    false
  }

  /** One compiled registry entry: the fast word-set path when the
    * pattern fits [[parseWords]]'s grammar AND the replacement carries
    * no `$`/`\` group references (those go through Matcher's
    * replacement-string processing in the fallback, same as
    * regexp_replace).
    */
  private[functions] final class Entry(val pattern: String, val replacement: String)
      extends Serializable {
    @transient private var words0: Array[Array[Byte]] = _
    @transient private var regex0: java.util.regex.Pattern = _
    @transient private var parsed = false
    private def ensure(): Unit = if (!parsed) {
      val plainRepl = !replacement.contains('$') && !replacement.contains('\\')
      words0 = if (plainRepl) WordRedact.parseWords(pattern).orNull else null
      if (words0 == null) regex0 = java.util.regex.Pattern.compile(pattern)
      parsed = true
    }
    def words: Array[Array[Byte]] = { ensure(); words0 }
    def regex: java.util.regex.Pattern = { ensure(); regex0 }
    @transient lazy val replacementBytes: Array[Byte] =
      replacement.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The per-expression compiled registry + scan loops. Serializable so
    * codegen can reference it from the generated class. */
  final class Engine(patterns: Seq[String], replacements: Seq[String])
      extends Serializable {
    private val entries: Array[Entry] =
      patterns.zip(replacements).map { case (p, r) => new Entry(p, r) }.toArray

    private def countFast(b: Array[Byte], words: Array[Array[Byte]]): Long = {
      var cnt = 0L
      var i = 0
      val n = b.length
      while (i < n) {
        if (isWordByte(b(i))) {
          val start = i
          while (i < n && isWordByte(b(i))) i += 1
          if (runMatches(b, start, i, words)) cnt += 1
        } else i += 1
      }
      cnt
    }

    private def redactFast(b: Array[Byte], words: Array[Array[Byte]],
        repl: Array[Byte]): Array[Byte] = {
      var out: java.io.ByteArrayOutputStream = null
      var copied = 0
      var i = 0
      val n = b.length
      while (i < n) {
        if (isWordByte(b(i))) {
          val start = i
          while (i < n && isWordByte(b(i))) i += 1
          if (runMatches(b, start, i, words)) {
            if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
            out.write(b, copied, start - copied)
            out.write(repl, 0, repl.length)
            copied = i
          }
        } else i += 1
      }
      if (out == null) b
      else { out.write(b, copied, n - copied); out.toByteArray }
    }

    def compute(s: UTF8String): InternalRow = {
      val original = s.getBytes
      val counts = new Array[Long](entries.length)
      var current = original
      var currentStr: String = null // decoded lazily, only for regex entries
      var k = 0
      while (k < entries.length) {
        val e = entries(k)
        val w = e.words
        if (w != null) {
          counts(k) = countFast(original, w)
          current = redactFast(current, w, e.replacementBytes)
        } else {
          // fallback: exact regexp_count / regexp_replace semantics
          val origStr = {
            if (currentStr == null) currentStr = s.toString
            currentStr
          }
          val m = e.regex.matcher(origStr)
          var c = 0L
          while (m.find()) c += 1
          counts(k) = c
          val cur = new String(current, java.nio.charset.StandardCharsets.UTF_8)
          val mr = e.regex.matcher(cur)
          val sb = new java.lang.StringBuffer
          while (mr.find()) mr.appendReplacement(sb, e.replacement)
          mr.appendTail(sb)
          current = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        k += 1
      }
      val redacted =
        if (current eq original) s.clone()
        else UTF8String.fromBytes(current)
      new GenericInternalRow(Array[Any](redacted, new GenericArrayData(counts)))
    }
  }
}

/** Registry-driven PII scrub in one operator:
  * `word_redact(text, patterns, replacements)` returns
  * `struct(redacted, counts)` — the text with every pattern
  * sequentially rewritten to its placeholder plus the per-pattern match
  * counts on the ORIGINAL text (the t09 contract: counts diagnose the
  * source, redaction feeds downstream).
  *
  * The engine compiles each literal registry entry once per plan: a
  * `\b`-anchored word-alternation pattern (the shape the stand-in
  * registry and most real PII hot patterns take) reduces to maximal
  * word-run tokenization + byte-wise set membership — no regex engine
  * on the hot path, no intermediate string per pattern, ~one scan per
  * registry entry instead of the builtin chain's separate
  * regexp_replace AND regexp_count engine runs per entry. Patterns
  * outside the grammar (or replacements with group references) keep
  * exact regexp_replace/regexp_count semantics through a compiled
  * java.util.regex fallback inside the same operator, so the fast path
  * is an optimization, never a semantics change
  * (CustomExpressionsSpec pins both paths against the builtin chain).
  */
case class WordRedact(child: Expression, patterns: Seq[String],
    replacements: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = new StructType()
    .add("redacted", StringType, nullable = false)
    .add("counts", ArrayType(LongType, containsNull = false), nullable = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_redact requires string, got ${other.simpleString(10)}")
    }

  @transient private lazy val engine = new WordRedact.Engine(patterns, replacements)

  override protected def nullSafeEval(input: Any): Any =
    engine.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val engRef = ctx.addReferenceObj("wordRedactEngine",
      new WordRedact.Engine(patterns, replacements),
      classOf[WordRedact.Engine].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $engRef.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordRedact =
    copy(child = newChild)
  override def prettyName: String = "word_redact"
}

/** Session registration for the custom expressions, so queries can use
  * them via `call_function` / SQL by name. Idempotent.
  */
object CustomFunctions {
  val RollingHashBase = 31L
  val RollingHashMod = 1000000007L

  /** The full native-function surface as ONE builder list: both
    * registration paths — per-session FunctionRegistry ([[register]])
    * and cluster-wide SparkSessionExtensions (graft.GraftExtensions) —
    * iterate this, so they cannot drift apart (they had: round-5's
    * additions reached only the session path for a while).
    *
    * The bloom entries are Spark's own runtime-filter expressions (what
    * InjectRuntimeFilter plants under AQE), exposed for EXPLICIT
    * semi-join reduction (q33): a distributed bloom build over
    * xxhash64'd keys and the codegen'd membership probe.
    */
  val builders: Seq[(String, Seq[Expression] => Expression, Class[_])] = Seq(
    ("rolling_hash",
      (exprs: Seq[Expression]) =>
        RollingHash(exprs.head, RollingHashBase, RollingHashMod),
      classOf[RollingHash]),
    ("minhash128",
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head, 128),
      classOf[MinHashAgg]),
    ("simhash64",
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head),
      classOf[SimHashAgg]),
    ("array_dot",
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1)),
      classOf[ArrayDot]),
    ("array_count_in", ArrayCountIn.fromExprs _, classOf[ArrayCountIn]),
    ("topk_agg", TopKAgg.fromExprs _, classOf[TopKAgg]),
    ("pq_encode", PqEncode.fromExprs _, classOf[PqEncode]),
    ("ngrams", NGramExplode.fromExprs _, classOf[NGramExplode]),
    ("ngrams_distinct", NGramDistinctExplode.fromExprs _,
      classOf[NGramDistinctExplode]),
    ("ngram_stats", NGramStats.fromExprs _, classOf[NGramStats]),
    ("ngram_counts", NGramCountExplode.fromExprs _, classOf[NGramCountExplode]),
    ("top_cells", TopCells.fromExprs _, classOf[TopCells]),
    ("md5_lower64", Md5Lower64.fromExprs _, classOf[Md5Lower64]),
    ("hll_packed", HllPacked.fromExprs _, classOf[HllPacked]),
    ("decimal_micros", DecimalMicros.fromExprs _, classOf[DecimalMicros]),
    ("micros_double", MicrosDouble.fromExprs _, classOf[MicrosDouble]),
    ("json_get_long", JsonGetLong.fromExprs _, classOf[JsonGetLong]),
    ("token_stats", TokenStats.fromExprs _, classOf[TokenStats]),
    ("passages", PassageExplode.fromExprs _, classOf[PassageExplode]),
    ("token_windows", TokenWindowExplode.fromExprs _, classOf[TokenWindowExplode]),
    ("word_redact", WordRedact.fromExprs _, classOf[WordRedact]),
    ("bloom_agg",
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1)),
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]),
    ("bloom_might_contain",
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder, _) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

object TopKAgg {
  /** SQL/call_function builder: `topk_agg(struct(ord, id), k)` with a
    * foldable non-null integer k.
    */
  def fromExprs(exprs: Seq[Expression]): TopKAgg = {
    require(exprs.length == 2 && exprs(1).foldable,
      "topk_agg(struct(ord, id), k) requires a literal k")
    val kv = exprs(1).eval()
    require(kv != null && kv.isInstanceOf[Number],
      s"topk_agg k must be a non-null integer literal, got $kv")
    TopKAgg(exprs.head, kv.asInstanceOf[Number].intValue())
  }
}

object ArrayCountIn {
  /** SQL/call_function builder: second argument must be a non-null
    * literal array of strings (the static vocabulary), folded at plan
    * time; null elements in the vocabulary are ignored (they can match
    * nothing).
    */
  def fromExprs(exprs: Seq[Expression]): ArrayCountIn = {
    require(exprs.length == 2 && exprs(1).foldable,
      "array_count_in(arr, markers) requires a literal marker array")
    require(exprs(1).dataType.isInstanceOf[ArrayType] &&
        exprs(1).dataType.asInstanceOf[ArrayType].elementType == StringType,
      s"array_count_in markers must be array<string>, got ${exprs(1).dataType.sql}")
    val evaluated = exprs(1).eval()
    require(evaluated != null, "array_count_in markers must not be NULL")
    val data = evaluated.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val markers = (0 until data.numElements())
      .filterNot(data.isNullAt)
      .map(data.getUTF8String(_).toString)
    ArrayCountIn(exprs.head, markers)
  }
}

/** Grouped top-k as a SINGLE-PASS bounded-heap aggregate: over rows of
  * `struct(ord: double, id: long)`, keeps the k largest by
  * (ord DESC, id ASC) and emits them rank-ordered. The scale answer to
  * "top k per group": the window idiom (`row_number` over a partition
  * ORDER BY) sorts every group's full row set — O(N log N) per group
  * and a mandatory full shuffle of all rows — while this aggregate is
  * O(N log k) with MAP-SIDE partial aggregation: each partition reduces
  * every group to ≤ k entries before the shuffle, so only k·groups
  * rows ever move. The grouped twin of Spark's global
  * TakeOrderedAndProject.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
    with UnaryLike[Expression] {

  require(k > 0, "topk_agg requires k > 0")

  private type Buf = java.util.PriorityQueue[(Double, Long)]

  /** Goodness total order: higher ord beats lower, ties broken by
    * smaller id. `Double.compare` (not `>`) so NaN participates in a
    * TOTAL order (sorted as largest, matching Spark's double sort) —
    * with raw comparisons a NaN entry would be incomparable and lodge
    * in the buffer forever.
    */
  private def cmp(a: (Double, Long), b: (Double, Long)): Int = {
    val c = java.lang.Double.compare(a._1, b._1)
    if (c != 0) c else java.lang.Long.compare(b._2, a._2)
  }

  // min-heap on goodness: the WORST surviving entry is at the head, so
  // each insert past k is one peek + O(log k) sift — the real heap
  // bound, not a linear scan
  private def newHeap(): Buf =
    new java.util.PriorityQueue[(Double, Long)](k + 1,
      (a: (Double, Long), b: (Double, Long)) => cmp(a, b))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(f0, f1))
          if f0.dataType == DoubleType && f1.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_agg requires struct<ord: double, id: bigint>, got ${other.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = newHeap()

  private def insert(buf: Buf, e: (Double, Long)): Buf = {
    if (buf.size < k) buf.offer(e)
    else if (cmp(e, buf.peek()) > 0) { buf.poll(); buf.offer(e) }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val row = v.asInstanceOf[InternalRow]
      if (row.isNullAt(0) || row.isNullAt(1)) buf
      else insert(buf, (row.getDouble(0), row.getLong(1)))
    }
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: Buf): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size))
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) => cmp(b, a))
    new GenericArrayData(arr.map { case (ord, id) =>
      InternalRow(ord, id)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (ord, id) = it.next(); bb.putDouble(ord); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newHeap()
    var i = 0
    while (i < n) { buf.offer((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
  override def prettyName: String = "topk_agg"
}

/** Occurrence-weighted membership count: how many elements of an
  * array<string> are in a small static vocabulary. The marker-ratio
  * primitive of the language-ID / quality-score family —
  * `size(filter(w, t => array_contains(markers, t)))` expresses the
  * same thing, but higher-order builtins evaluate their lambda
  * interpretively per element, putting an interpreter in the hottest
  * corpus-wide map loop; this stays in whole-stage codegen with one
  * hash probe per token.
  */
case class ArrayCountIn(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_count_in requires array<string>, got ${other.simpleString(10)}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val len = arr.numElements()
    var n = 0L
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val setRef = ctx.addReferenceObj("markerSet", set,
        classOf[java.util.HashSet[_]].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      s"""
         |long $n = 0L;
         |int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayCountIn =
    copy(child = newChild)
  override def prettyName: String = "array_count_in"
}

/** Strict left-to-right dot product of two array<double> columns —
  * the inner loop of the embedding-similarity family. Identical
  * summation order to `aggregate(zip_with(a, b, _*_), 0d, _+_)` (and to
  * the oracle's `list_reduce` mirror), but codegen'd: the higher-order
  * builtins evaluate their lambdas interpretively per element, which at
  * N·k pair-dots dominates the ANN/near-dup queries; this stays inside
  * whole-stage codegen with zero per-element allocation.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

/** Product-quantization encoder: maps a unit-normalized array<double>
  * vector to its `numSubs` nearest-centroid codes (argmin-L2 per
  * subspace, via the ‖c‖²/2 − x·c identity; ties break to the lowest
  * code). One codegen'd expression replaces the composed
  * slice/struct/sort_array tree (numSubs × numCodes slices + a struct
  * sort per subspace), which Janino compiles into a per-row expression
  * forest too large to stay fast — encoding is the map-side pass every
  * vector of a 100 TB corpus takes, so it must be a tight triple loop.
  *
  * Summation order matches the composed form exactly (dot accumulated
  * ascending, then subtracted from ‖c‖²/2), so codes are bit-identical
  * to the sort_array argmin — VectorPqSpec pins the equivalence.
  */
object PqEncode {
  /** SQL/call_function builder: `pq_encode(vn, codebooksLiteral)` with a
    * foldable array<array<array<double>>> codebook literal (evaluated at
    * plan time, like array_count_in's marker list).
    */
  def fromExprs(exprs: Seq[Expression]): PqEncode = {
    require(exprs.length == 2, "pq_encode(vector, codebooks) takes 2 arguments")
    val cbExpr = exprs(1)
    val shapeOk = cbExpr.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    require(cbExpr.foldable && shapeOk,
      s"pq_encode codebooks must be a foldable array<array<array<double>>>, " +
        s"got ${cbExpr.dataType.sql}")
    val outer = cbExpr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cbs = (0 until outer.numElements()).map { s =>
      val mid = outer.getArray(s)
      (0 until mid.numElements()).map { c =>
        mid.getArray(c).toDoubleArray()
      }.toArray
    }.toArray
    PqEncode(exprs.head, cbs)
  }
}

case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val numSubs = codebooks.length
  private val numCodes = codebooks(0).length
  private val subDim = codebooks(0)(0).length

  /** [sub*numCodes*subDim] row-major centroid components. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](numSubs * numCodes * subDim)
    var s = 0
    while (s < numSubs) {
      var c = 0
      while (c < numCodes) {
        var d = 0
        while (d < subDim) {
          a((s * numCodes + c) * subDim + d) = codebooks(s)(c)(d); d += 1
        }
        c += 1
      }
      s += 1
    }
    a
  }

  /** ‖c‖²/2 per [sub*numCodes] centroid. */
  @transient private lazy val half: Array[Double] =
    codebooks.flatMap(_.map(c => c.map(x => x * x).sum / 2))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val codes = new Array[Int](numSubs)
    var s = 0
    while (s < numSubs) {
      var bestI = 0
      var best = Double.PositiveInfinity
      var c = 0
      while (c < numCodes) {
        var dot = 0.0
        val base = (s * numCodes + c) * subDim
        val off = s * subDim
        var d = 0
        while (d < subDim) { dot += v.getDouble(off + d) * flat(base + d); d += 1 }
        val nd = half(s * numCodes + c) - dot
        if (nd < best) { best = nd; bestI = c }
        c += 1
      }
      codes(s) = bestI
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val halfRef = ctx.addReferenceObj("pqHalf", half, "double[]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val nd = ctx.freshName("nd")
      val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      s"""
         |int[] $codes = new int[$numSubs];
         |for (int $s = 0; $s < $numSubs; $s++) {
         |  int $bestI = 0;
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $ci = 0; $ci < $numCodes; $ci++) {
         |    double $dot = 0.0;
         |    int $base = ($s * $numCodes + $ci) * $subDim;
         |    int $off = $s * $subDim;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $dot += $c.getDouble($off + $d) * $flatRef[$base + $d];
         |    }
         |    double $nd = $halfRef[$s * $numCodes + $ci] - $dot;
         |    if ($nd < $best) { $best = $nd; $bestI = $ci; }
         |  }
         |  $codes[$s] = $bestI;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object DecimalMicros {
  /** SQL/call_function builder: `decimal_micros(d)`. */
  def fromExprs(exprs: Seq[Expression]): DecimalMicros = {
    require(exprs.length == 1, "decimal_micros(value) takes exactly 1 argument")
    DecimalMicros(exprs.head)
  }

  /** The exact unscaled value of `CAST(d AS DECIMAL(38,6))`, as a long —
    * bit-identical to Spark's cast by construction: the cast goes
    * Double → `BigDecimal.valueOf` (shortest decimal representation) →
    * `setScale(6, HALF_UP)` (`Decimal.toPrecision`'s default mode), and
    * this helper performs the same two steps and returns the unscaled
    * long. Null (the cast's overflow behavior under non-ANSI semantics)
    * for NaN/±Inf and for |d| ≥ ~9.2e12 where the unscaled value
    * exceeds a signed 64-bit long. Called from generated code.
    */
  def microsOrNull(d: Double): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    // Allocation-free fast path for the per-row hot loop: d*1e6 differs
    // from the shortest-repr value the cast rounds by ≲1.5 ULP, so when
    // its fractional part sits farther than 4 ULP from the .5 rounding
    // boundary, nearest-integer of the product IS the cast's HALF_UP
    // result (any tie rule agrees off the tie; near-integer fractions
    // round to the same integer from either side). Within the margin —
    // P ≈ 1e-15 per row — and wherever 4 ULP ≥ 0.25 (|d| ≳ 2.8e8, where
    // the margin test loses meaning), fall back to the exact BigDecimal
    // construction. DecimalSumSpec pins fast == exact on real columns;
    // ExpressionPropertiesSpec sweeps crafted boundary values.
    val p = d * 1e6
    if (java.lang.Math.abs(p) < 4.5e15) {
      val f = p - java.lang.Math.floor(p)
      val margin = 4.0 * java.lang.Math.ulp(p)
      if (margin < 0.25 && java.lang.Math.abs(f - 0.5) > margin)
        return java.lang.Long.valueOf(java.lang.Math.rint(p).toLong)
    }
    microsViaBigDecimal(d)
  }

  /** The exact two-step construction the fast path must replicate —
    * kept separate so specs can drive both sides on crafted inputs.
    */
  private[graft] def microsViaBigDecimal(d: Double): java.lang.Long = {
    val bd = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    try java.lang.Long.valueOf(bd.unscaledValue().longValueExact())
    catch { case _: ArithmeticException => null }
  }
}

/** Fixed-point accumulator feed: `decimal_micros(d)` = the unscaled
  * (×10⁶) long of `CAST(d AS DECIMAL(38,6))`. Lets exact double
  * aggregation run on LONG partials — a primitive, in-place-mutable
  * aggregation buffer inside whole-stage codegen — instead of
  * DECIMAL(38,6) partials, whose every `+` is a Java BigDecimal
  * allocation (the measured 9.5× q03 gap vs DuckDB's int128 sums at
  * sf1). `micros_double(SUM(decimal_micros(d)))` is bit-identical to
  * `CAST(SUM(CAST(d AS DECIMAL(38,6))) AS DOUBLE)` whenever the SUM's
  * unscaled total stays within ±2⁶³ (|Σd| < ~9.2e12) — DecimalSumSpec
  * pins the equivalence per input column on real data. Beyond that
  * bound (group sums past ~9.2e12 units) keep the DECIMAL(38,6) path:
  * its 128-bit headroom is exactly what the wider type buys.
  */
case class DecimalMicros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decimal_micros requires double, got ${other.simpleString(10)}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val boxed = DecimalMicros.microsOrNull(v.asInstanceOf[Double])
      if (boxed == null) null else boxed.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("micros")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long $tmp = graft.functions.DecimalMicros.microsOrNull($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DecimalMicros =
    copy(child = newChild)
  override def prettyName: String = "decimal_micros"
}

object MicrosDouble {
  /** SQL/call_function builder: `micros_double(l)`. */
  def fromExprs(exprs: Seq[Expression]): MicrosDouble = {
    require(exprs.length == 1, "micros_double(value) takes exactly 1 argument")
    MicrosDouble(exprs.head)
  }

  /** `new BigDecimal(unscaled, 6).doubleValue()` — the same conversion
    * `CAST(DECIMAL(38,6) AS DOUBLE)` performs (`Decimal.toDouble` is
    * `toBigDecimal.doubleValue`), so the two paths agree bit-for-bit.
    * Called from generated code.
    */
  def toDouble(unscaled: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), 6)
      .doubleValue()
}

/** Inverse feed of [[DecimalMicros]]: reads a ×10⁶ unscaled long back as
  * the double `CAST(DECIMAL(38,6) AS DOUBLE)` would produce. Applied
  * once per GROUP (after the long-partial SUM), so its BigDecimal hop is
  * off the per-row hot path.
  */
case class MicrosDouble(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"micros_double requires bigint, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MicrosDouble.toDouble(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MicrosDouble.toDouble($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MicrosDouble =
    copy(child = newChild)
  override def prettyName: String = "micros_double"
}

object JsonGetLong {
  /** SQL/call_function builder: `json_get_long(json, key)` with a
    * foldable string key (same literal-validation posture as TopCells —
    * the function is exposed cluster-wide via the extension surface).
    */
  def fromExprs(exprs: Seq[Expression]): JsonGetLong = {
    require(exprs.length == 2, "json_get_long(json, key) takes 2 arguments")
    require(exprs(1).foldable && exprs(1).dataType == StringType,
      s"json_get_long key must be a foldable string, got ${exprs(1).dataType.sql}")
    val kv = exprs(1).eval()
    require(kv != null, "json_get_long key must not be NULL")
    val key = kv.asInstanceOf[UTF8String].toString
    require(key.nonEmpty, "json_get_long key must be non-empty")
    JsonGetLong(exprs.head, key)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Scan a top-level JSON object for `key` and return its integer value
    * as a boxed long, or null when the document is not an object, the
    * key is absent, or its value is not a JSON integer in long range —
    * the same outcomes `from_json(js, 'key LONG')['key']` produces for
    * those inputs (PERMISSIVE mode nulls the row on any conversion
    * failure). Duplicate keys: last wins (Jackson's behavior). One pass,
    * zero allocation — called from generated code.
    *
    * Envelope (JsonGetLongSpec pins it against from_json): well-formed
    * object documents, keys without escape sequences. Documents that are
    * malformed beyond the root-object frame, or that spell the target
    * key with `\\u` escapes, are best-effort (null or skip) and may
    * diverge from Jackson's row-null on such inputs.
    */
  def extract(s: UTF8String, key: Array[Byte]): java.lang.Long = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n && isWs(b(i))) i += 1
    if (i >= n || b(i) != '{') return null
    i += 1
    var value: java.lang.Long = null
    while (true) {
      while (i < n && isWs(b(i))) i += 1
      if (i >= n) return null
      if (b(i) == '}') return value // end of root object; trailing bytes
                                    // ignored (Jackson stops at the root
                                    // END_OBJECT too)
      // --- member key ---
      if (b(i) != '"') return null
      i += 1
      val keyStart = i
      var keyEscaped = false
      while (i < n && b(i) != '"') {
        if (b(i) == '\\') { keyEscaped = true; i += 2 } else i += 1
      }
      if (i >= n) return null
      val keyLen = i - keyStart
      i += 1
      var isTarget = !keyEscaped && keyLen == key.length
      if (isTarget) {
        var j = 0
        while (isTarget && j < keyLen) {
          if (b(keyStart + j) != key(j)) isTarget = false
          j += 1
        }
      }
      while (i < n && isWs(b(i))) i += 1
      if (i >= n || b(i) != ':') return null
      i += 1
      while (i < n && isWs(b(i))) i += 1
      if (i >= n) return null
      // --- member value ---
      val c = b(i)
      if (isTarget) {
        if (c == '-' || isDigit(c)) {
          val neg = c == '-'
          if (neg) i += 1
          if (i >= n || !isDigit(b(i))) return null
          if (b(i) == '0' && i + 1 < n && isDigit(b(i + 1))) return null // leading zero: malformed JSON
          // accumulate NEGATIVE so Long.MinValue parses without overflow
          var acc = 0L
          while (i < n && isDigit(b(i))) {
            val d = b(i) - '0'
            if (acc < (Long.MinValue + d) / 10) return null // |value| > 2^63: Jackson coercion fails
            acc = acc * 10 - d
            i += 1
          }
          if (i < n && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) return null // float: not a LONG
          if (!neg && acc == Long.MinValue) return null // +2^63
          value = java.lang.Long.valueOf(if (neg) acc else -acc)
        } else if (c == 'n' && i + 3 < n && b(i + 1) == 'u' && b(i + 2) == 'l' && b(i + 3) == 'l') {
          value = null
          i += 4
        } else return null // string/bool/object/array value for a LONG field
      } else {
        // --- skip a non-target value ---
        if (c == '"') {
          i += 1
          while (i < n && b(i) != '"') { if (b(i) == '\\') i += 2 else i += 1 }
          if (i >= n) return null
          i += 1
        } else if (c == '{' || c == '[') {
          var depth = 1
          i += 1
          while (depth > 0) {
            if (i >= n) return null
            val x = b(i)
            if (x == '"') {
              i += 1
              while (i < n && b(i) != '"') { if (b(i) == '\\') i += 2 else i += 1 }
              if (i >= n) return null
            } else if (x == '{' || x == '[') depth += 1
            else if (x == '}' || x == ']') depth -= 1
            i += 1
          }
        } else if (c == '-' || isDigit(c)) {
          while (i < n && (isDigit(b(i)) || b(i) == '-' || b(i) == '+' ||
            b(i) == '.' || b(i) == 'e' || b(i) == 'E')) i += 1
        } else if (c == 't') i += 4
        else if (c == 'f') i += 5
        else if (c == 'n') i += 4
        else return null
      }
      while (i < n && isWs(b(i))) i += 1
      if (i >= n) return null
      if (b(i) == ',') i += 1
      else if (b(i) != '}') return null
    }
    null // unreachable
  }
}

/** Single-key JSON integer extraction without a parser object:
  * `json_get_long(js, 'k')` scans the UTF-8 bytes once — no Jackson
  * parser allocation, no struct row, no string materialization — and
  * matches `from_json(js, 'k LONG')['k']` on well-formed documents
  * (JsonGetLongSpec pins the envelope, including absent keys,
  * duplicate-key last-wins, overflow, and non-integer values → null).
  * The hot-path shape for q35-style "extract one scalar from a tiny
  * payload" pipelines, where Jackson's per-row setup dominates the
  * actual parse (~10-byte documents); full-schema or nested extraction
  * still goes through from_json / VARIANT.
  */
case class JsonGetLong(child: Expression, key: String)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val keyBytes =
    key.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"json_get_long requires string, got ${other.simpleString(10)}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val boxed = JsonGetLong.extract(v.asInstanceOf[UTF8String], keyBytes)
      if (boxed == null) null else boxed.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyBytes, "byte[]")
    val tmp = ctx.freshName("jsonLong")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long $tmp = graft.functions.JsonGetLong.extract($c, $keyRef);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JsonGetLong =
    copy(child = newChild)
  override def prettyName: String = "json_get_long"
}
