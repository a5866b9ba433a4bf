package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking of a token array in ONE pass — the codegen'd
 * replacement for the round-6 higher-order-function pipeline that made
 * x54 a 92 s query (VERDICT r6 §What's wrong #1): HOFs don't participate
 * in whole-stage codegen, and every lambda reference to the `split(...)`
 * subtree re-evaluated it, so each row paid O(tokens) full `split`s plus
 * repeated md5 + concat work, superlinear in document length. This
 * expression materializes the tokens once and walks them once.
 *
 * Semantics (bit-identical to the round-6 column pipeline and to the
 * DuckDB oracle CTEs of x54/x55, 1-based positions as in the SQL):
 *  - a boundary falls AFTER token position p (3 ≤ p ≤ n) whenever
 *    `md5_prefix_long(concat_ws(' ', tokens[p-2..p]), 8) % m == 0` — the
 *    rolling cut rule over the 3-gram ENDING at p, so boundaries depend on
 *    local content only (the rsync/backup-dedup chunking argument);
 *  - edges = 0 :: boundaries :: n (n skipped when the last gram already
 *    cut there); chunk i = tokens(edges(i)..edges(i+1)-1) joined by ' ';
 *  - docs with fewer than 3 tokens (or no qualifying gram) form one
 *    whole-doc chunk; an empty token array yields one empty chunk — the
 *    same edge cases the `[0] ++ bpos ++ [n]` column form produced.
 *
 * Cost: one 3-token join + one md5 per token position — O(tokens) per
 * document with a small constant, inside whole-stage codegen. Expected
 * chunk length stays ~`m` tokens.
 */
case class CdcChunks(child: Expression, m: Int) extends UnaryExpression {
  require(m > 0, s"cdc_chunks modulus must be positive, got $m")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CdcChunks.compute(v.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $m);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  private val SEP = UTF8String.fromString(" ")

  /** concat_ws(" ", toks[from..until-1]) — skips nulls exactly like the
    * built-in (split never produces them, but the contract must match). */
  private def joinWs(toks: Array[UTF8String], from: Int, until: Int): UTF8String =
    UTF8String.concatWs(SEP, java.util.Arrays.copyOfRange(toks, from, until): _*)

  /** Called from both interpreted and generated code. */
  def compute(arr: ArrayData, m: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](math.max(1, n / m))
    var start = 0 // 0-based index of the current chunk's first token
    var p = 3     // 1-based position of the gram's last token
    while (p <= n) {
      val gram = joinWs(toks, p - 3, p)
      if (Md5PrefixLong.compute(gram.getBytes, 8) % m == 0) {
        out += joinWs(toks, start, p)
        start = p
      }
      p += 1
    }
    // Trailing edge at n unless the last gram already cut there; short/empty
    // docs (n < 3, out still empty) become one whole-doc chunk.
    if (start < n || out.isEmpty) out += joinWs(toks, start, n)
    new GenericArrayData(out.toArray[Any])
  }
}
