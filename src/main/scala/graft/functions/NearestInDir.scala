package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Per-row nearest-directory-entry argmax — the shuffle-free centroid
 * assignment kernel of [[graft.operators.SimilarityOps]] (round 14).
 *
 * `nearest_in_dir(embedding, dir)` takes one corpus vector and a broadcast
 * directory `array<struct<id: long, vec: array<float>>>` and returns
 * `struct(sim: float, id: long)` for the entry maximizing
 * (cosine DESC, id ASC). This replaces the crossJoin + max_by aggregate
 * shape, which shipped every corpus vector THROUGH a groupBy(vec_id) argmax
 * exchange per quantizer level purely to re-group candidate rows that were
 * born co-located (one broadcast-join map task) — one full-payload corpus
 * shuffle per level for zero information movement (x57 event-log
 * decomposition, REVIEW_r13 §7 addendum / BENCH_notes_r14 §1). A Column
 * higher-order `aggregate` fold computes the same argmax shuffle-free but
 * pays interpreted per-candidate struct allocation (measured 2–9× the
 * max_by stage's task time at the 60×d probe, with JIT-sensitive variance);
 * this expression runs the whole argmax as one monomorphic primitive-float
 * loop per row.
 *
 * Exactness contract: the cosine is [[CosineSimilarityF32.compute]] — the
 * identical sequential-f32 arithmetic every gated path uses — and the
 * comparison is Spark's own float TOTAL ORDER (`SQLOrderingUtil
 * .compareFloats`: NaN greatest, -0.0 == 0.0), i.e. exactly the interpreted
 * row ordering `max_by(struct(csim, -cid))` applied. An all-NaN row (zero
 * vector) therefore keeps max_by's winner: the minimum id, csim NaN.
 *
 * The unpacked directory is MEMOIZED per expression instance keyed on the
 * ArrayData's UNDERLYING identity (UnsafeArrayData: baseObject +
 * baseOffset + sizeInBytes; reference equality otherwise) PLUS a content
 * sample, with an adaptive downgrade to the fail-safe re-unpack path the
 * moment a reused buffer is detected (see the memo fields' comment): the
 * directory arrives from a broadcast join, so every row of a partition
 * reads the same broadcast bytes — but `UnsafeRow.getArray` allocates a
 * fresh wrapper per call, which is why the key must see through the
 * wrapper — and the per-row cost is one vector unpack plus k dot products
 * (k ≈ 2·√(cells) in the two-level scheme). Expression instances are
 * task-confined, so the mutable cache needs no synchronization (same
 * pattern as the [[CellPairMatchesF32]] kernel's per-call buffers).
 *
 * Null semantics: a null vector or null directory yields null (callers
 * filter empty directories; gated corpora carry no null embeddings).
 * Null directory ENTRIES or entry vectors are skipped — the crossJoin
 * form's cosine null-propagated those candidate rows away.
 */
case class NearestInDir(children: Seq[Expression])
    extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def dirOk(t: DataType) = t match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _))), _) => true
      case _ => false
    }
    if (children.length == 2 &&
        children(0).dataType.isInstanceOf[ArrayType] &&
        children(0).dataType.asInstanceOf[ArrayType].elementType == FloatType &&
        dirOk(children(1).dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_in_dir expects (array<float>, array<struct<long, array<float>>>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = NearestInDir.OutType
  override def nullable: Boolean = true

  // Directory memo. Reference identity alone is NOT a stable key in the
  // production path: `UnsafeRow.getArray`/`JoinedRow.getArray` allocates a
  // FRESH UnsafeArrayData wrapper per call, so an `eq`-keyed memo misses on
  // every row and re-unpacks the whole directory (k `toFloatArray`
  // allocations) per input row — ~2× kernel work plus GC churn at large k
  // (round-15 ADVICE). UnsafeArrayData wrappers over the same broadcast
  // bytes share (baseObject, baseOffset, sizeInBytes), so the memo keys on
  // that underlying identity — sound on the broadcast path, where the
  // bytes behind a base are immutable. It is NOT sound alone when the
  // directory column arrives through a REUSED row buffer (shuffle
  // deserialization / UnsafeProjection output of a non-broadcast plan of
  // the public nearest_in_dir SQL function): consecutive rows then share
  // (base, offset), and a different directory of equal size would falsely
  // hit the memo and return a stale argmax SILENTLY (round-16 ADVICE —
  // the eq-keyed memo it replaced failed SAFE by re-unpacking). Two
  // guards close that:
  //   1. rotating content window — numElements plus 16 words per row,
  //      compared against a FULL-REGION SNAPSHOT taken at unpack, with
  //      the window's start cursor ADVANCING each row (word 0 and the
  //      sub-word tail bytes re-checked every row). Per-row cost is the
  //      same 16-word load pair the round-16 fixed sample paid, but the
  //      moving cursor sweeps the ENTIRE region every ⌈words/16⌉ rows,
  //      so a persistent rewrite is detected within that bound
  //      DETERMINISTICALLY — the round-16 ADVICE's correlated-directory
  //      blind spot (two directories agreeing on all 16 FIXED sample
  //      positions forever, e.g. per-group directories sharing a common
  //      prefix) cannot exist: there are no fixed positions to hide
  //      between. The snapshot costs one O(size) copy per unpack, next
  //      to an unpack that is already O(size) with per-entry allocation;
  //   2. adaptive downgrade — a same-(base, offset) mismatch of size,
  //      cardinality, or window content is PROOF the buffer is reused,
  //      so the instance permanently stops trusting underlying identity
  //      and falls back to the fail-safe re-unpack path (exact from the
  //      first detected mutation on; only rows between the first reuse
  //      and its bounded-window detection lean on guard 1).
  // Non-Unsafe ArrayData (literals, generic rows in tests) keeps plain
  // reference equality, which is always sound.
  @transient private var dirRef: ArrayData = _
  @transient private var dirBase: AnyRef = _
  @transient private var dirOffset: Long = 0L
  @transient private var dirSize: Int = -1
  @transient private var dirNumElems: Int = -1
  // var, allocated at first unpack: a @transient VAL array would be null
  // after task-closure deserialization (both the interpreted tree and the
  // codegen references array ship through Java serialization)
  @transient private var dirSnap: Array[Byte] = _
  @transient private var checkCursor: Int = 0
  @transient private var reusedBase: Boolean = false
  @transient private var dirIds: Array[Long] = _
  @transient private var dirVecs: Array[Array[Float]] = _
  // test hook: NearestInDirSpec asserts unpack stays O(1) per partition
  @transient private[graft] var unpackCount: Long = 0L

  private def sameDir(dir: ArrayData): Boolean = dir match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      if (reusedBase || dirBase == null || (u.getBaseObject ne dirBase) ||
          u.getBaseOffset != dirOffset) false
      else if (u.getSizeInBytes != dirSize || u.numElements() != dirNumElems) {
        // same region start, different shape: the buffer was rewritten
        reusedBase = true; false
      } else if (snapWindowMatches(u)) true
      else { reusedBase = true; false } // content changed under the region
    case _ => dir eq dirRef
  }

  /** Rotating verification window (see the memo fields' doc): 16 words of
    * the live region compared against the unpack-time snapshot starting at
    * the advancing cursor (wrapping), plus word 0 and the sub-word tail
    * bytes every row — every byte of the region is re-verified at least
    * once per ⌈words/16⌉ consecutive rows. */
  private def snapWindowMatches(
      u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData): Boolean = {
    import org.apache.spark.unsafe.Platform
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val snapOff = Platform.BYTE_ARRAY_OFFSET.toLong
    val words = dirSize >>> 3
    // tail bytes past the last full word (region size mod 8)
    var t = words.toLong << 3
    while (t < dirSize) {
      if (Platform.getByte(base, off + t) != Platform.getByte(dirSnap, snapOff + t))
        return false
      t += 1
    }
    if (words == 0) return true
    // fixed anchor: the first word, every row
    if (Platform.getLong(base, off) != Platform.getLong(dirSnap, snapOff)) return false
    val n = math.min(NearestInDir.SampleWords, words)
    var i = 0
    var w = checkCursor
    while (i < n) {
      if (w >= words) w = 0
      val p = w.toLong << 3
      if (Platform.getLong(base, off + p) != Platform.getLong(dirSnap, snapOff + p))
        return false
      w += 1; i += 1
    }
    checkCursor = if (w >= words) 0 else w
    true
  }

  private def unpackDir(dir: ArrayData): Unit = {
    val n = dir.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!dir.isNullAt(i)) {
        val row = dir.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ids(m) = row.getLong(0)
          vecs(m) = row.getArray(1).toFloatArray()
          m += 1
        }
      }
      i += 1
    }
    dirIds = java.util.Arrays.copyOf(ids, m)
    dirVecs = java.util.Arrays.copyOf(vecs, m)
    dirRef = dir
    dir match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          if !reusedBase =>
        dirBase = u.getBaseObject; dirOffset = u.getBaseOffset
        dirSize = u.getSizeInBytes; dirNumElems = n
        // full-region snapshot: the rotating window verifies live bytes
        // against THESE, so detection never depends on fixed positions
        if (dirSnap == null || dirSnap.length != dirSize)
          dirSnap = new Array[Byte](dirSize)
        org.apache.spark.unsafe.Platform.copyMemory(
          u.getBaseObject, u.getBaseOffset, dirSnap,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong, dirSize.toLong)
        checkCursor = 0
      case _ =>
        dirBase = null; dirOffset = 0L; dirSize = -1; dirNumElems = -1
    }
    unpackCount += 1
  }

  override def eval(input: InternalRow): Any = {
    val embRaw = children(0).eval(input)
    val dirRaw = children(1).eval(input)
    if (embRaw == null || dirRaw == null) return null
    compute(embRaw.asInstanceOf[ArrayData], dirRaw.asInstanceOf[ArrayData])
  }

  /** Null-safe argmax kernel shared by [[eval]] and the generated code
    * (which calls it through a reference object). Public because janino's
    * generated class lives outside this package. Returns null for an
    * empty directory. */
  def compute(emb: ArrayData, dir: ArrayData): InternalRow = {
    if (!sameDir(dir)) unpackDir(dir)
    if (dirIds.length == 0) return null
    val x = emb.toFloatArray()
    var bestSim = Float.NaN
    var bestId = 0L
    var first = true
    var i = 0
    while (i < dirIds.length) {
      val s = CosineSimilarityF32.compute(x, dirVecs(i))
      val id = dirIds(i)
      // Spark's float total order (NaN greatest, -0.0 == 0.0), id ASC ties —
      // bit-for-bit the max_by(struct(csim, -cid)) interpreted ordering
      val c = if (first) 1
        else org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(s, bestSim)
      if (c > 0 || (c == 0 && id < bestId)) { bestSim = s; bestId = id }
      first = false
      i += 1
    }
    new GenericInternalRow(Array[Any](bestSim, bestId))
  }

  // doGenCode (round 16, verdict ask 5): the r15 form was CodegenFallback,
  // which evaluates the WHOLE subtree interpreted per row (two child
  // eval() virtual dispatches + the fallback's boxed eval call) on the
  // corpus-wide assignment path. The generated code keeps the children in
  // whole-stage codegen and calls the memoized kernel through a reference
  // object — same task-confined instance semantics (the references array
  // is deserialized per task closure, exactly like the interpreted
  // expression tree), so the directory memo and its reuse guard carry
  // over unchanged. The kernel itself stays a Scala method: its cost is
  // k·d float fma's, which generated Java could not improve (it is the
  // same JIT), so codegen only removes the per-row dispatch overhead —
  // measured on the sfx100d decade fixture (BENCH_notes_r16 §3).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kernel = ctx.addReferenceObj("nearestInDir", this)
    val embCode = children(0).genCode(ctx)
    val dirCode = children(1).genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    val adCls = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${embCode.code}
         |${dirCode.code}
         |boolean ${ev.isNull} = true;
         |$rowCls ${ev.value} = null;
         |if (!${embCode.isNull} && !${dirCode.isNull}) {
         |  ${ev.value} = $kernel.compute(($adCls) ${embCode.value}, ($adCls) ${dirCode.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)

  override def prettyName: String = "nearest_in_dir"
}

object NearestInDir {
  val OutType: StructType = StructType(Seq(
    StructField("sim", FloatType, nullable = false),
    StructField("id", LongType, nullable = false)))
  // per-row verification window width: 16 words per check (same per-row
  // cost as the round-16 fixed sample), rotated across the whole region so
  // full coverage lands every ⌈words/16⌉ rows (see the memo fields' doc)
  private[functions] val SampleWords: Int = 16
}
