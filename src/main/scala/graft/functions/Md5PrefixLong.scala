package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/**
 * First `hexChars` hex digits of md5(input) as an unsigned long — the native
 * form of the oracle idiom `('0x' || substr(md5(x), 1, k))::BIGINT`
 * (DuckDB) / `conv(substring(md5(x), 1, k), 16, 10)` (Spark built-ins).
 *
 * The built-in chain hex-encodes the 16-byte digest into a 32-char string,
 * substrings it, then string-parses base 16 — three allocations and a parse
 * per evaluation on the dedup hot path (one per shingle occurrence). This
 * expression reads the digits straight off the digest bytes: one
 * thread-local MessageDigest, no strings. Bit-identical to the built-in
 * chain for 1 ≤ hexChars ≤ 15 (60 bits, below the sign bit), property-tested
 * in CosineSimilaritySpec and pinned cross-engine by every md5-hashing
 * oracle query (x1-x3, x19, x21, x23).
 */
case class Md5PrefixLong(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"md5_prefix_long supports 1..15 hex chars (unsigned in a long), got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects binary input, got $other")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Md5PrefixLong.compute(v.asInstanceOf[Array[Byte]], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixLong.compute($c, $hexChars);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix_long"
}

object Md5PrefixLong {
  private val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from both interpreted and generated code. */
  def compute(bytes: Array[Byte], hexChars: Int): Long = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}
