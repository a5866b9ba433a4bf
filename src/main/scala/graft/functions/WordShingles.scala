package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word `k`-gram shingles of a token array in ONE pass — the
 * codegen'd replacement for the higher-order-function form
 * `transform(sequence(1, n-2), i -> concat_ws(' ', slice(ws, i, 3)))`,
 * which re-evaluates every lambda reference to the `split(lower(text))`
 * subtree per ELEMENT (HOF lambda bodies sit outside both whole-stage
 * codegen and subexpression elimination), making shingling O(words²) per
 * document — measured 40 s of x65's 49 s at the 30×-distinct probe,
 * 165 µs of CPU per shingle. The same failure class as the round-6 CDC
 * chunker ([[CdcChunks]], VERDICT r6 §What's wrong #1); the same cure:
 * take the ALREADY-SPLIT token array as the child (evaluated once per
 * row), walk it once, stay inside whole-stage codegen.
 *
 * Semantics (bit-identical to the column form it replaces, which wrapped
 * the transform in `array_distinct`):
 *  - n ≥ k: the distinct k-grams `concat_ws(' ', toks[i..i+k-1])` for
 *    i in 0..n-k, in FIRST-OCCURRENCE order (array_distinct's order);
 *  - n < k: one whole-doc shingle `concat_ws(' ', toks)` when
 *    `wholeDocIfShort` (the near-dup family's rule — a 2-word doc still
 *    participates), else an empty array (the repetition census's rule —
 *    a 2-word doc has zero trigrams).
 *
 * Null handling: the child (a `split` result) is null only for null
 * text; callers that must preserve the legacy null-text value wrap the
 * call in `when(text.isNull, …)` at the Column layer — the expression
 * itself is standard null-in/null-out.
 */
case class WordShingles(child: Expression, k: Int, wholeDocIfShort: Boolean)
    extends UnaryExpression {
  require(k > 0, s"word_shingles gram size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[ArrayData], k, wholeDocIfShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k, $wholeDocIfShort);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val SEP = UTF8String.fromString(" ")

  /** concat_ws(" ", toks[from..until-1]) — skips nulls exactly like the
    * built-in (split never produces them, but the contract must match). */
  private def joinWs(toks: Array[UTF8String], from: Int, until: Int): UTF8String =
    UTF8String.concatWs(SEP, java.util.Arrays.copyOfRange(toks, from, until): _*)

  /** Called from both interpreted and generated code. */
  def compute(arr: ArrayData, k: Int, wholeDocIfShort: Boolean): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (n < k) {
      if (wholeDocIfShort) new GenericArrayData(Array[Any](joinWs(toks, 0, n)))
      else new GenericArrayData(Array.empty[Any])
    } else {
      // LinkedHashSet = array_distinct's first-occurrence order; UTF8String
      // hashes/compares byte-wise, the same equality the built-in applies.
      val seen = new java.util.LinkedHashSet[UTF8String](math.min(n, 64))
      i = 0
      while (i <= n - k) { seen.add(joinWs(toks, i, i + k)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }
}
