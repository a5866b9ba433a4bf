package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding segmentation of a word array as a single codegen'd
 * pass — `bpe_segment(array<string> words, merges)` returns the subword
 * tokens of every word, flattened in word order. `size(bpe_segment(...))`
 * is therefore the document's subword token count: the trainer-faithful
 * budget unit the whitespace counters (`split(lower(text), ' ')`) only
 * approximate (VERDICT r6 "What's missing" #2 — whitespace counts run
 * 1.3–2× off real subword budgets and are language-skewed).
 *
 * Application semantics (the classical greedy BPE decode, from the public
 * algorithm — Sennrich et al. 2016, "Neural Machine Translation of Rare
 * Words with Subword Units"):
 *  - a word starts as its Unicode-codepoint symbols (the empty word is one
 *    empty symbol — parity with the oracle's `string_split(word, '')`);
 *  - repeatedly, the adjacent symbol pair with the LOWEST merge rank is
 *    merged at its LEFTMOST occurrence, until no adjacent pair is in the
 *    merge table. Merging one occurrence at a time is equivalent to the
 *    textbook "all occurrences left-to-right, lowest rank first" order:
 *    a merge can only create pairs of HIGHER rank (a pair involving a
 *    merged symbol must have been learned after the merge that created
 *    the symbol), so the global-minimum rank never jumps backwards.
 *
 * The merge table travels in the plan as one encoded string literal
 * (`left + ' ' + right` per line — symbols cannot contain spaces, they
 * are fragments of space-split words) and is decoded into a hash table
 * once per expression instance, not per row. Ranks are 1-based, matching
 * the DuckDB oracle's MAP literal.
 *
 * Cross-engine determinism: rank comparison is strict (`<`), so rank ties
 * are impossible (ranks are distinct by construction) and the leftmost
 * minimum is selected exactly like the oracle's
 * `list_position(rk, list_min(rk))`.
 */
case class BpeSegment(child: Expression, mergesEncoded: String)
    extends UnaryExpression {

  @transient private lazy val table: java.util.HashMap[String, Integer] =
    BpeSegment.buildTable(mergesEncoded)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment expects array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeSegment.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Ship the ENCODED string with the plan; build the hash table lazily
    // once per generated class instance (mirrors BloomContainsLong).
    val encRef = ctx.addReferenceObj("bpeMerges", mergesEncoded, "java.lang.String")
    val tableVar = ctx.addMutableState("java.util.HashMap", "graftBpeTable")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($tableVar == null) {
         |  $tableVar = graft.functions.BpeSegment.buildTable($encRef);
         |}
         |${ev.value} = graft.functions.BpeSegment.compute($c, $tableVar);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_segment"
}

/**
 * [[BpeSegment]] with the merge table as a FILE ARTIFACT instead of a plan
 * literal — `bpe_segment_file(array<string> words, path)`. A trainer-scale
 * table (8k–100k merges, 100 KB–1 MB encoded) as a literal bloats every
 * plan that carries it: it is copied per plan instance on the driver,
 * serialized into every stage's task binary, and dumped whole into every
 * explain string. Here the plan carries only the PATH; each executor JVM
 * resolves it once through the Hadoop filesystem API (so local paths work
 * on local[*] and shared-storage paths — HDFS/S3 — work on a cluster,
 * exactly how a production pipeline ships its versioned tokenizer
 * artifact) and caches the decoded hash table process-wide, keyed by path.
 * The artifact is immutable-by-convention (version by path, like the
 * checked-in resource), which is what makes the process-wide cache sound.
 *
 * Segmentation semantics and codegen are IDENTICAL to [[BpeSegment]] —
 * both call the same compute(); equality under both transports is
 * spec-locked in BpeSpec.
 */
case class BpeSegmentFile(child: Expression, path: String)
    extends UnaryExpression {

  @transient private lazy val table: java.util.HashMap[String, Integer] =
    BpeSegment.tableForPath(path)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment_file expects array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeSegment.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("bpePath", path, "java.lang.String")
    val tableVar = ctx.addMutableState("java.util.HashMap", "graftBpeFileTable")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($tableVar == null) {
         |  $tableVar = graft.functions.BpeSegment.tableForPath($pathRef);
         |}
         |${ev.value} = graft.functions.BpeSegment.compute($c, $tableVar);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_segment_file"
}

object BpeSegment {
  /** Sentinel rank for "pair not in table" (matches the oracle literal). */
  val NoRank: Int = Int.MaxValue

  /** Process-wide merge-table cache for the artifact-file transport: one
    * filesystem read + decode per (executor JVM, path), shared by every
    * task and every query that names the same artifact. */
  private val fileTables =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[String, Integer]]()

  def tableForPath(path: String): java.util.HashMap[String, Integer] =
    fileTables.computeIfAbsent(path, p => buildTable(readArtifact(p).stripLineEnd))

  /** Read an encoded merge table through the Hadoop FS API (resolves
    * local, HDFS, S3A … by URI scheme — same mechanism the parquet scans
    * use, so anywhere data can live, the tokenizer artifact can too). */
  private def readArtifact(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Write an encoded merge table artifact (the trainer's output side of
    * [[tableForPath]]). */
  def writeArtifact(merges: Seq[(String, String)], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write((encode(merges) + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** One line per merge, `left + " " + right`, rank = 1-based line number.
    * Symbols cannot contain ' ' (they are fragments of space-split words);
    * the trainer validates they contain no '\n' either. */
  def encode(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  def decode(encoded: String): Seq[(String, String)] =
    if (encoded.isEmpty) Seq.empty
    else encoded.split("\n", -1).toSeq.map { line =>
      val i = line.indexOf(' ')
      require(i >= 0, s"bad merge line: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }

  def buildTable(encoded: String): java.util.HashMap[String, Integer] = {
    val t = new java.util.HashMap[String, Integer]()
    decode(encoded).zipWithIndex.foreach { case ((a, b), i) =>
      t.put(a + " " + b, i + 1)
    }
    t
  }

  /** Called from both interpreted and generated code. */
  def compute(arr: ArrayData, table: java.util.HashMap[String, Integer]): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      segmentWord(if (w == null) "" else w.toString, table, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def segmentWord(
      word: String,
      table: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](math.max(1, word.length))
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      syms += word.substring(i, i + cc)
      i += cc
    }
    if (syms.isEmpty) syms += "" // string_split('', '') parity
    var merging = true
    while (merging) {
      var best = NoRank
      var idx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = table.get(syms(j) + " " + syms(j + 1))
        // strict < keeps the LEFTMOST occurrence of the minimum rank
        if (r != null && r < best) { best = r; idx = j }
        j += 1
      }
      if (idx < 0) merging = false
      else {
        syms(idx) = syms(idx) + syms(idx + 1)
        syms.remove(idx + 1)
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }
}
