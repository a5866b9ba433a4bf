package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Non-overlapping `width`-token windows of a token array in ONE pass — the
 * codegen'd replacement for the last in-tree instance of the HOF failure
 * class ([[WordShingles]], [[CdcChunks]]): the column form
 * `transform(sequence(1, n/width), i -> concat_ws(' ', slice(ws, (i-1)*width+1, width)))`
 * re-evaluates every lambda reference to the `split(lower(text))` subtree
 * per WINDOW (lambda bodies sit outside whole-stage codegen and
 * subexpression elimination), making span generation O(words²/width) per
 * document. The constant stayed small at the probed scales (windows are
 * n/width, not n−k), but the asymptotic is the same defect — and the cure
 * is the same: take the ALREADY-SPLIT token array as the child (evaluated
 * once per row), walk it once.
 *
 * Semantics (bit-identical to the column form it replaces):
 *  - n ≥ width: the ⌊n/width⌋ spans `concat_ws(' ', toks[i·width..(i+1)·width−1])`
 *    in position order — the trailing partial window is DROPPED (the span
 *    operators keep the tail separately);
 *  - n < width: an empty array (a short doc has zero full windows).
 *
 * No distinct — [[graft.operators.TextOps]]'s span grid keeps every
 * occurrence (position matters for the winner rules); consumers that want
 * distinct wrap in `array_distinct` at the Column layer, exactly as before.
 *
 * Null handling: standard null-in/null-out; the [[graft.operators.TextOps]]
 * wrapper restores the legacy null-text value (empty array — the old
 * `when(size(ws) ≥ width, …).otherwise(array())` sent a null size to the
 * otherwise branch) with one `coalesce`.
 */
case class WordSpans(child: Expression, width: Int)
    extends UnaryExpression {
  require(width > 0, s"word_spans width must be positive, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_spans expects array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WordSpans.compute(v.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordSpans.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_spans"
}

object WordSpans {
  private val SEP = UTF8String.fromString(" ")

  /** Called from both interpreted and generated code. */
  def compute(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    val nSpans = n / width
    if (nSpans == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](nSpans)
    var s = 0
    while (s < nSpans) {
      // concat_ws(" ", toks[s·width .. s·width+width−1]) — concatWs skips
      // nulls exactly like the built-in (split never produces them, but
      // the contract must match)
      out(s) = UTF8String.concatWs(SEP,
        java.util.Arrays.copyOfRange(toks, s * width, (s + 1) * width): _*)
      s += 1
    }
    new GenericArrayData(out)
  }
}
