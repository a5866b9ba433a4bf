package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_contains_long(h, bloomBytes)` — membership probe of a 64-bit hash
 * against a serialized [[org.apache.spark.util.sketch.BloomFilter]], as a
 * codegen'd row-local predicate. No false negatives (a row whose hash was
 * inserted always passes), tunable false-positive rate.
 *
 * This is the engine's large-benchmark decontamination prefilter
 * ([[graft.operators.CurationOps.decontaminateBloomAgainst]]): at 100 TB the
 * benchmark shingle set can be far too big to broadcast as an exact hash
 * relation, but its Bloom sketch is orders of magnitude smaller — ~5 bits
 * per distinct item at fpp 0.03 (linear in cardinality, NOT constant; the
 * builder caps the sizing so the sketch stays plan-shippable and lets the
 * effective fpp rise instead) — ship the sketch, drop ~all non-overlapping
 * shingle occurrences at the scan, and run the exact confirm join only on
 * the tiny surviving fraction.
 * Same shape as Spark's own injected runtime filters
 * (`BloomFilterMightContain`), but with the sketch as an explicit argument
 * so it can be built once, persisted beside the corpus, and reused across
 * jobs rather than rebuilt per query.
 *
 * The filter deserializes lazily ONCE per task-class instance (mutable
 * state in the generated class, `@transient lazy val` interpreted) — the
 * per-row cost is two xxhash64 probes into the bit array, no allocation.
 */
case class BloomContainsLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomContainsLong.deserialize(bloomBytes)

  // Content equality over the sketch bytes: the case-class default compares
  // Array[Byte] by reference, so two probes built from equal-content sketches
  // would defeat Catalyst canonicalization / common-subexpression reuse
  // (never wrong results — just a missed dedup of identical probe work).
  override def equals(other: Any): Boolean = other match {
    case b: BloomContainsLong =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_long expects a bigint hash input, got $other")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference the BYTES (serializable, cheap to ship with the plan) and
    // materialize the filter lazily inside the generated class, so each
    // executor deserializes once instead of per row.
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bloomVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloom")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($bloomVar == null) {
         |  $bloomVar = graft.functions.BloomContainsLong.deserialize($bytesRef);
         |}
         |${ev.value} = $bloomVar.mightContainLong($c);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_contains_long"
}

object BloomContainsLong {
  /** Called from both interpreted and generated code. */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Serialize a sketch to the byte form the expression consumes. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }
}
