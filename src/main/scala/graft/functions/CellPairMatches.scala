package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Blocked all-vs-all cosine screening over two PACKED cells — the candidate
 * kernel of the bucketed near-dup joins ([[graft.operators.SimilarityOps]]).
 *
 * Why this exists (round 11, from the round-10 distinct-growth probe): the
 * row-per-candidate clique join materializes two 256-byte embedding arrays
 * through an UnsafeRow for EVERY candidate pair — at the 10×-distinct probe
 * that is ~200M candidate rows (~200 GB of row traffic) to surface ~10⁵
 * true pairs; the per-candidate row overhead, not the arithmetic, dominated
 * x57's 34 s. This kernel receives each cell's vectors ONCE per paired-cell
 * row (packed by `collect_list(struct(vec_id, embedding))` — ONE aggregate,
 * so id/vector alignment is structural, not an ordering assumption), unpacks
 * them to primitive float arrays, precomputes per-vector norm factors, and
 * runs the all-vs-all dot loop in-core, emitting ONLY candidates whose raw
 * f32 cosine clears `minSim` — the join's row volume drops from candidate
 * count to match count.
 *
 * Exactness contract: the emitted `sim` is bit-identical to
 * [[CosineSimilarityF32.compute]] — the dot and the two norms use the same
 * sequential f32 accumulation (independent accumulators, so hoisting the
 * norm out of the pair loop reproduces the interleaved loop's value
 * exactly), and the final `dot / (sqrt(na)f · sqrt(nb)f)` is the same f32
 * expression. `minSim` must sit BELOW the operator threshold by the rounding
 * margin (round-to-6-places can lift a raw sim by ≤ 5·10⁻⁷, the
 * double→float→double trip by ≤ ~10⁻⁷ relative): callers pass
 * `threshold − 1e-6` and re-apply the EXACT `round6f(sim) ≥ threshold`
 * filter in Column space on the (tiny) surviving set, so every rounding
 * semantic stays in the one place oracle parity was proven.
 *
 * `same = true` means both sides are the SAME cell: only i < j pairs are
 * evaluated (the b-side child is ignored — callers pass the a-side twice
 * for plan symmetry). `same = false` evaluates the full cross product and
 * emits each pair ordered (min id, max id); cells partition the corpus, so
 * an unordered pair can only surface from one cell pair.
 *
 * CodegenFallback is deliberate: the expression runs once per PAIRED-CELL
 * row (bounded by the pruned cell-pair table), each call amortizing ≥10⁴
 * dot products — per-call interpretation overhead is noise, and the hot
 * loop is monomorphic JIT-compiled Scala. What matters for codegen health
 * is the SURROUNDING plan (packing aggregate, broadcast join, explode),
 * which stays whole-stage.
 *
 * The dot loop is OUTER-PRODUCT (SAXPY) form (round 13; supersedes the
 * round-12 j-block-of-4): with the b-side transposed dim-major
 * (`bt(k·n + j) = y_j(k)`) and k as the OUTER loop, the inner loop
 * `acc(j) += x(k)·bt(k·n + j)` is an element-wise independent
 * multiply-add over a contiguous float array — no reduction, so C2
 * auto-vectorizes it (the JVM's strict float semantics keep it
 * mul-then-add, never a fused FMA, on every lane). Each pair's
 * accumulator `acc(j)` still receives exactly the ops `pairSim` would
 * issue, in the same k-ascending order — the reordering is ACROSS pairs
 * only, never within one, so every emitted sim stays bit-identical to
 * the scalar chain (unit-gated in CellPairMatchesSpec). The f32 parity
 * contract bars vectorizing a single dot's reduction chain; it never
 * barred running 8–16 pairs' chains per SIMD lane-set, which is what
 * this form does. Same-cell calls run each row against its PREFIX
 * [0, i) rather than the suffix — the same canonical pair set with an
 * offset-free inner loop (a runtime base offset defeats SuperWord on
 * this host: 5.2 vs 26 GFLOP/s measured), bit-identical because float
 * multiplication commutes per element. Mixed-dimension, empty, or
 * sub-16-member cells fall back to the round-12 scalar sweep (same
 * results, same throw sites); short prefix rows use a scalar prefix
 * sweep — the k-loop setup dominates below 16 partners.
 */
case class CellPairMatchesF32(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def cellOk(t: DataType) = t match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _))), _) => true
      case _ => false
    }
    if (children.length == 4 &&
        cellOk(children(0).dataType) && cellOk(children(1).dataType) &&
        children(2).dataType == DoubleType &&
        children(3).dataType == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cell_pair_matches expects (array<struct<long, array<float>>> ×2, " +
        "double, boolean), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = CellPairMatchesF32.OutType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val cellA = CellPairMatchesF32.unpack(
      children(0).eval(input).asInstanceOf[ArrayData])
    val minSim = children(2).eval(input).asInstanceOf[Double]
    val same = children(3).eval(input).asInstanceOf[Boolean]
    if (same)
      CellPairMatchesF32.matchesSame(cellA, minSim)
    else
      CellPairMatchesF32.matchesCross(cellA,
        CellPairMatchesF32.unpack(
          children(1).eval(input).asInstanceOf[ArrayData]),
        minSim)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)

  override def prettyName: String = "cell_pair_matches"
}

object CellPairMatchesF32 {
  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField("sim", FloatType, nullable = false))), containsNull = false)

  /** One cell unpacked to primitives: ids, vectors, and the per-vector
    * norm factor `sqrt(Σx²)` with the SAME sequential f32 accumulation as
    * [[CosineSimilarityF32.compute]]'s `na` (independent accumulator there,
    * so the hoisted value is bit-identical to the interleaved one). */
  private[functions] final class Cell(
      val ids: Array[Long], val vecs: Array[Array[Float]],
      val norms: Array[Float])

  /** Unpacks one cell, SKIPPING members with a null struct or null
    * embedding: the Column path this kernel replaced computed
    * `cos(emb_a, emb_b)` per candidate, whose null-intolerance
    * null-propagated and silently EXCLUDED any pair touching a null
    * vector — dropping the member here preserves exactly those
    * semantics (every pair involving it vanishes), where an NPE would
    * crash the operators routed through the kernel on nullable
    * embedding columns. */
  private[functions] def unpack(a: ArrayData): Cell = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Float](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getStruct(i, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          ids(m) = s.getLong(0)
          val v = s.getArray(1).toFloatArray()
          vecs(m) = v
          var na = 0f
          var j = 0
          while (j < v.length) { na += v(j) * v(j); j += 1 }
          norms(m) = math.sqrt(na).toFloat
          m += 1
        }
      }
      i += 1
    }
    if (m == n) new Cell(ids, vecs, norms)
    else new Cell(
      java.util.Arrays.copyOf(ids, m),
      java.util.Arrays.copyOf(vecs.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Array[Float]]],
      java.util.Arrays.copyOf(norms, m))
  }

  /** f32 dot then `dot / (sa·sb)` in f32 — with the [[Cell]] norm factors
    * this reproduces [[CosineSimilarityF32.compute]] bit-for-bit. NaN (zero
    * vector) never clears `>= minSim`, matching the Column path where
    * round6f(NaN)=NaN fails the threshold filter. */
  private[functions] def pairSim(x: Array[Float], y: Array[Float],
      sa: Float, sb: Float): Float = {
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"cell_pair_matches: dimension mismatch ${x.length} vs ${y.length}")
    var dot = 0f
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); i += 1 }
    dot / (sa * sb)
  }

  /** Four pair-sims against one probe vector in a single pass over the
    * dims, one INDEPENDENT f32 accumulator per pair. The sequential f32
    * dot is a loop-carried dependency chain (~4–5 cycles per add, and FP
    * reassociation is barred by the parity contract, so neither we nor
    * the JIT may vectorize WITHIN a pair) — interleaving four pairs'
    * chains fills the FMA pipeline across pairs instead. Each
    * accumulator sees exactly the ops `pairSim` would issue, in the same
    * order, so every emitted sim stays bit-identical (unit-gated in
    * CellPairMatchesSpec). Requires equal dims, which the caller's
    * `pairSim`-style check guarantees per block. */
  private def pairSim4(x: Array[Float],
      y0: Array[Float], y1: Array[Float], y2: Array[Float],
      y3: Array[Float], out: Array[Float]): Unit = {
    val n = x.length
    if (y0.length != n || y1.length != n || y2.length != n ||
        y3.length != n)
      throw new IllegalArgumentException(
        "cell_pair_matches: dimension mismatch " +
          s"$n vs (${y0.length}, ${y1.length}, ${y2.length}, ${y3.length})")
    var d0 = 0f; var d1 = 0f; var d2 = 0f; var d3 = 0f
    var k = 0
    while (k < n) {
      val xk = x(k)
      d0 += xk * y0(k); d1 += xk * y1(k)
      d2 += xk * y2(k); d3 += xk * y3(k)
      k += 1
    }
    out(0) = d0; out(1) = d1; out(2) = d2; out(3) = d3
  }

  /** Shared inner sweep: all pairs (i, j) for j in [jLo, n) against a
    * fixed i, j-blocked by 4. Emission order matches the scalar loop. */
  private def sweepRow(a: Cell, b: Cell, i: Int, jLo: Int, minSim: Double,
      dots: Array[Float], buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
    val xi = a.vecs(i); val sa = a.norms(i); val ai = a.ids(i)
    val n = b.ids.length
    var j = jLo
    while (j + 3 < n) {
      pairSim4(xi, b.vecs(j), b.vecs(j + 1), b.vecs(j + 2), b.vecs(j + 3),
        dots)
      var t = 0
      while (t < 4) {
        val s = dots(t) / (sa * b.norms(j + t))
        if (s >= minSim) {
          val bj = b.ids(j + t)
          if (ai <= bj) buf += row(ai, bj, s) else buf += row(bj, ai, s)
        }
        t += 1
      }
      j += 4
    }
    while (j < n) {
      val s = pairSim(xi, b.vecs(j), sa, b.norms(j))
      if (s >= minSim) {
        val bj = b.ids(j)
        if (ai <= bj) buf += row(ai, bj, s) else buf += row(bj, ai, s)
      }
      j += 1
    }
  }

  /** Rows with fewer remaining partners than this take the scalar sweep —
    * below it the SAXPY k-loop's setup (dim passes over a tiny window)
    * costs more than the pipeline it fills. */
  private val MinSaxpyWidth = 16

  /** The b-side dimensionality when every member shares one, else -1
    * (mixed dims or an empty cell → scalar fallback, which reproduces the
    * legacy sweep's results and throw sites exactly). */
  private def uniformDim(c: Cell): Int = {
    val n = c.vecs.length
    if (n == 0) return -1
    val d = c.vecs(0).length
    var i = 1
    while (i < n) { if (c.vecs(i).length != d) return -1; i += 1 }
    d
  }

  /** Dim-major transposed copy of a cell: `bt(k)(j) = vecs(j)(k)` — one
    * O(n·dim) pass, amortized over the O(nₐ·n·dim) sweep it enables. One
    * array PER DIMENSION, not one flat array with a `k·n + j` offset:
    * SuperWord vectorizes `acc(j) += xk · brow(j)` (26 GFLOP/s measured on
    * this host's JIT) but refuses the same loop with a runtime base offset
    * on one side (5.2 GFLOP/s — scalar), so the layout IS the speedup. */
  private def transpose(b: Cell, dim: Int): Array[Array[Float]] = {
    val n = b.ids.length
    val bt = Array.ofDim[Float](dim, n)
    var j = 0
    while (j < n) {
      val v = b.vecs(j)
      var k = 0
      while (k < dim) { bt(k)(j) = v(k); k += 1 }
      j += 1
    }
    bt
  }

  /** All pairs (i, j) for j in [0, len) against row i through the
    * transposed SAXPY form: k outer, offset-free contiguous j inner
    * (auto-vectorized; per-pair op order identical to [[pairSim]] — see
    * the class doc). `acc` is caller-allocated at full b width and
    * cleared per row. `len` is the full b width on the cross path; on the
    * same-cell path it is i — the PREFIX [0, i) — so every canonical pair
    * (j, i) with j < i is evaluated exactly once with no inner-loop base
    * offset. The prefix orientation computes Σ xᵢ(k)·yⱼ(k) where the
    * legacy suffix sweep computed Σ xⱼ(k)·yᵢ(k): identical bit patterns,
    * because IEEE-754 multiplication is commutative per element and the
    * k-ascending accumulation order is unchanged. */
  private def saxpyRow(a: Cell, b: Cell, bt: Array[Array[Float]], dim: Int,
      i: Int, len: Int, minSim: Double, acc: Array[Float],
      buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
    val xi = a.vecs(i)
    if (xi.length != dim)
      throw new IllegalArgumentException(
        s"cell_pair_matches: dimension mismatch ${xi.length} vs $dim")
    java.util.Arrays.fill(acc, 0, len, 0f)
    var k = 0
    while (k < dim) {
      val xk = xi(k)
      val brow = bt(k)
      var j = 0
      while (j < len) { acc(j) += xk * brow(j); j += 1 }
      k += 1
    }
    val sa = a.norms(i); val ai = a.ids(i)
    var j = 0
    while (j < len) {
      val s = acc(j) / (sa * b.norms(j))
      if (s >= minSim) {
        val bj = b.ids(j)
        if (ai <= bj) buf += row(ai, bj, s) else buf += row(bj, ai, s)
      }
      j += 1
    }
  }

  /** Scalar prefix sweep for the same-cell SAXPY path's short rows
    * (i < [[MinSaxpyWidth]]): pairs (j, i) for j in [0, i), the same
    * canonical pair set and bit-identical sims (commutativity — see
    * [[saxpyRow]]), without the k-loop setup cost. */
  private def prefixRow(c: Cell, i: Int, minSim: Double,
      buf: scala.collection.mutable.ArrayBuffer[InternalRow]): Unit = {
    val xi = c.vecs(i); val sa = c.norms(i); val ai = c.ids(i)
    var j = 0
    while (j < i) {
      val s = pairSim(xi, c.vecs(j), sa, c.norms(j))
      if (s >= minSim) {
        val bj = c.ids(j)
        if (ai <= bj) buf += row(ai, bj, s) else buf += row(bj, ai, s)
      }
      j += 1
    }
  }

  private[functions] def matchesSame(c: Cell, minSim: Double): GenericArrayData = {
    val n = c.ids.length
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // >= to match matchesCross's gate: a MinSaxpyWidth-member cell takes
    // the same kernel on both paths (results are bit-identical either
    // way; the shared boundary keeps the constant's documented meaning —
    // "fewer than this take the scalar sweep" — true of both arms)
    val dim = if (n >= MinSaxpyWidth) uniformDim(c) else -1
    if (dim >= 0) {
      // SAXPY prefix form: row i pairs with [0, i) — no inner offset
      val bt = transpose(c, dim)
      val acc = new Array[Float](n)
      var i = 0
      while (i < n) {
        if (i >= MinSaxpyWidth) saxpyRow(c, c, bt, dim, i, i, minSim, acc, buf)
        else prefixRow(c, i, minSim, buf)
        i += 1
      }
    } else {
      // legacy suffix sweep (tiny, mixed-dim, or empty cells)
      val dots = new Array[Float](4)
      var i = 0
      while (i < n) {
        sweepRow(c, c, i, i + 1, minSim, dots, buf)
        i += 1
      }
    }
    new GenericArrayData(buf.toArray[Any])
  }

  private[functions] def matchesCross(
      a: Cell, b: Cell, minSim: Double): GenericArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val nb = b.ids.length
    val dim = if (nb >= MinSaxpyWidth) uniformDim(b) else -1
    if (dim >= 0) {
      val bt = transpose(b, dim)
      val acc = new Array[Float](nb)
      var i = 0
      while (i < a.ids.length) {
        saxpyRow(a, b, bt, dim, i, nb, minSim, acc, buf)
        i += 1
      }
    } else {
      val dots = new Array[Float](4)
      var i = 0
      while (i < a.ids.length) {
        sweepRow(a, b, i, 0, minSim, dots, buf)
        i += 1
      }
    }
    new GenericArrayData(buf.toArray[Any])
  }

  private def row(a: Long, b: Long, s: Float): InternalRow =
    new GenericInternalRow(Array[Any](a, b, s))
}
