package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeSegment

/**
 * Deterministic byte-pair encoding over the corpus — subword token budgets
 * for the prep operators (SURVEY.md §2.4 text analysis; VERDICT r6 asked
 * for trainer-faithful token counting: whitespace counts are 1.3–2× off
 * real subword budgets and language-skewed).
 *
 * Training is the public BPE algorithm (Sennrich et al. 2016): start from
 * codepoint symbols, repeatedly merge the most frequent adjacent pair
 * (frequency weighted by word occurrence counts), record the pair; the
 * ranked merge list IS the tokenizer. Ties break lexicographically on the
 * pair, so training is bit-deterministic for a given word histogram.
 *
 * Scale shape: the only distributed work is the word histogram — one
 * explode + groupBy with map-side partials, the same shape as vocabTopK.
 * The DRIVER trains on the top-`maxVocab` histogram rows (the standard
 * practice: BPE is trained on a bounded vocabulary/sample, then applied
 * corpus-wide), so driver memory is capped regardless of corpus size, and
 * the iteration count is `nMerges` — no per-round Spark jobs. Application
 * is a per-row codegen'd expression ([[graft.functions.BpeSegment]]); the
 * merge table rides the plan as one string literal.
 */
object BpeOps {

  /**
   * Train `nMerges` BPE merges on the corpus' word histogram. Returns the
   * ranked merge list (rank = position, highest-frequency first). Stops
   * early when no adjacent pair occurs with weight ≥ 2 (merging a
   * singleton pair can never help a tokenizer). `maxVocab` bounds the
   * driver-side histogram: distinct words beyond the top-`maxVocab` by
   * (count desc, word asc) are ignored for TRAINING (application still
   * covers them — unseen pairs simply never merge).
   */
  def trainMerges(
      documents: DataFrame,
      nMerges: Int = 40,
      maxVocab: Int = 50000): Seq[(String, String)] = {
    require(nMerges > 0 && maxVocab > 0, "nMerges and maxVocab must be positive")
    val hist: Seq[(String, Long)] = documents
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().toIndexedSeq
      .map(r => (r.getString(0), r.getLong(1)))
    trainMergesFromHistogram(hist, nMerges)
  }

  /**
   * The driver-side training loop over an explicit word histogram —
   * INCREMENTAL pair maintenance (the standard subword-nmt optimization of
   * the public algorithm): pair counts live in a hash map mirrored by an
   * ordered set keyed (count desc, pair asc), and each merge touches only
   * the words that contain the merged pair (tracked by an inverted
   * pair→words index), applying the exact count delta of that word's
   * before/after adjacency multiset. Equivalent to recounting the whole
   * vocabulary per round — the counts are identical sums, the ordered-set
   * head is the same (max count, lexicographically smallest pair)
   * tie-break, and the stop conditions match (no pairs left, or best
   * weight < 2) — but a trainer-scale run (8k+ merges over a 50k-word
   * histogram) completes in seconds instead of hours: per merge the work
   * is O(affected words · word length · log #pairs), not
   * O(vocabulary · word length). Equivalence is property-tested against
   * the naive recount loop in BpeSpec.
   */
  def trainMergesFromHistogram(
      hist: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0, "nMerges must be positive")
    import scala.collection.mutable
    val n = hist.size
    val words = new Array[Vector[String]](n)
    val wcount = new Array[Long](n)
    hist.zipWithIndex.foreach { case ((w, c), i) =>
      require(!w.contains('\n'), s"cannot train BPE on a token with a newline: '$w'")
      words(i) = splitCodepoints(w)
      wcount(i) = c
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    // where() entries go stale (a word that no longer contains the pair is
    // a no-op visit), but never miss: every word that could contain a pair
    // is indexed when that adjacency is first counted.
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val queue = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.by { case (c, a, b) => (-c, a, b) })
    def bump(a: String, b: String, delta: Long, wi: Int): Unit = {
      val p = (a, b)
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, a, b))
      val nu = old + delta
      if (nu != 0L) { counts(p) = nu; queue.add((nu, a, b)) }
      else counts.remove(p)
      if (delta > 0 && wi >= 0) where.getOrElseUpdate(p, mutable.BitSet.empty) += wi
    }
    for (wi <- words.indices) {
      val syms = words(wi)
      var j = 0
      while (j < syms.length - 1) { bump(syms(j), syms(j + 1), wcount(wi), wi); j += 1 }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < nMerges) {
      if (queue.isEmpty) continue = false
      else {
        val (cnt, a, b) = queue.head
        if (cnt < 2) continue = false
        else {
          val pair = (a, b)
          merges += pair
          for (wi <- where.getOrElse(pair, mutable.BitSet.empty)) {
            val old = words(wi)
            val merged = mergeAll(old, pair)
            if (merged.length != old.length) {
              var j = 0
              while (j < old.length - 1) { bump(old(j), old(j + 1), -wcount(wi), -1); j += 1 }
              j = 0
              while (j < merged.length - 1) { bump(merged(j), merged(j + 1), wcount(wi), wi); j += 1 }
              words(wi) = merged
            }
          }
          // the merged pair's count has drained to zero via the deltas;
          // its index entry is no longer needed
          counts.remove(pair).foreach(c => queue.remove((c, a, b)))
          where.remove(pair)
        }
      }
    }
    merges.toSeq
  }

  private def splitCodepoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + cc)
      i += cc
    }
    b.result()
  }

  /** Left-to-right non-overlapping merge of every occurrence of `pair` —
    * the training-side apply (equivalent, per step, to the inference
    * loop's repeated leftmost single merges of that pair). */
  private def mergeAll(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += pair._1 + pair._2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /**
   * The checked-in merge table: trained once (deterministically, via
   * [[trainMerges]] — `graft.BpeTrain` regenerates it) on the sf0.001
   * documents corpus and shipped as a resource, the way a production
   * pipeline carries its tokenizer as a versioned artifact rather than
   * retraining per query. The x68/x71 oracles embed THIS table, so the
   * engine-side expression and the DuckDB replay cannot drift.
   */
  lazy val defaultMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "resource /graft/bpe_merges.txt missing")
    try {
      val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      BpeSegment.decode(text.stripLineEnd)
    } finally in.close()
  }

  /** Subword tokens of `wordsCol` (array<string>), flattened in word
    * order. Requires [[graft.functions.GraftFunctions.register]]. */
  def segment(wordsCol: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_segment", wordsCol, lit(BpeSegment.encode(merges)))

  /** Subword token COUNT of the document text under `merges` — the
    * trainer-faithful drop-in for `size(split(lower(text), ' '))`. */
  def tokenCount(merges: Seq[(String, String)] = defaultMerges): Column =
    size(segment(TextOps.words(col("text")), merges)).cast("long")

  /**
   * The trainer-scale merge table (8k merges) as a versioned resource —
   * regenerated deterministically by `graft.BpeTrainBig` (seeded synthetic
   * word histogram → [[trainMergesFromHistogram]]; byte-identical on every
   * re-run). 40 merges prove the algorithm; THIS table proves the engine
   * at real tokenizer vocabulary size: ~8k-entry hash table per executor,
   * artifact-file transport ([[segmentFile]]) instead of a plan literal.
   */
  lazy val bigMerges: Seq[(String, String)] = mergesResource("bpe_merges_8k.txt")

  /** The PRODUCTION-SIZE merge table (32,768 merges — the vocabulary
    * range real tokenizers ship, 32k–100k): same deterministic trainer
    * (`graft.BpeTrainBig <out> 32768`), same artifact transport. 8k
    * proved the engine past the plan-literal regime; THIS table is the
    * measured datapoint that segmentation cost stays flat in table size
    * (`O(Σ word_len²)` per doc with hash-lookup merges — the table only
    * changes which lookups hit). */
  lazy val bigMerges32k: Seq[(String, String)] = mergesResource("bpe_merges_32k.txt")

  private def mergesResource(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/" + name)
    require(in != null, s"resource /graft/$name missing")
    try {
      val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      BpeSegment.decode(text.stripLineEnd)
    } finally in.close()
  }

  /** The big table as an ARTIFACT FILE: the checked-in resource is
    * materialized once per JVM to a content-addressed temp path (digest in
    * the name → concurrent JVMs and repeated calls agree; a 100 TB
    * deployment passes an explicit shared-storage path to [[segmentFile]]
    * instead — the resource extraction is the local-mode convenience). */
  lazy val bigMergesPath: String = artifactPath(bigMerges, "8k")

  /** [[bigMergesPath]] for the 32k table. */
  lazy val bigMerges32kPath: String = artifactPath(bigMerges32k, "32k")

  private def artifactPath(merges: Seq[(String, String)], tag: String): String = {
    val enc = BpeSegment.encode(merges) + "\n"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(enc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_bpe_merges_${tag}_$digest.txt")
    if (!java.nio.file.Files.exists(p)) {
      val tmp = java.nio.file.Files.createTempFile(p.getParent, "bpe_", ".tmp")
      java.nio.file.Files.write(tmp, enc.getBytes("UTF-8"))
      try java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp) // another JVM won the race
      }
    }
    p.toString
  }

  /** [[segment]] with the merge table as a file artifact (path literal in
    * the plan, table loaded once per executor JVM) — the transport for
    * trainer-scale tables. Requires registration, as [[segment]]. */
  def segmentFile(wordsCol: Column, path: String): Column =
    call_function("bpe_segment_file", wordsCol, lit(path))

  /** [[tokenCount]] under a file-artifact merge table. */
  def tokenCountFile(path: String): Column =
    size(segmentFile(TextOps.words(col("text")), path)).cast("long")

  /**
   * NUMERICALIZATION census — the last hop to actual trainer input: every
   * subword unit gets a deterministic integer id (ranked by document
   * frequency desc, total frequency desc, token asc — x71's order, ids
   * 1-based over the FULL unit set), documents become id sequences, and
   * the census fingerprints the whole mapping with exact integer sums
   * (`id_sum` moves if ANY unit's id or count shifts — a checksum over
   * the numericalized corpus, cross-engine-gateable).
   *
   * Scale note on the ranking window: it is a single-partition window by
   * construction, but over a PROVABLY BOUNDED relation — the distinct BPE
   * unit set is a subset of {single codepoints seen} ∪ {merge outputs},
   * i.e. ≤ charset + nMerges rows at ANY corpus size (the corpus can only
   * shrink which merges fire, never invent units). The token stream never
   * passes through it; documents join the finished vocab (broadcast) and
   * aggregate with map-side partials.
   */
  def numericalizeCensus(
      documents: DataFrame,
      merges: Seq[(String, String)] = defaultMerges): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val toks = documents.select(col("doc_id"), col("lang"),
      explode(segment(TextOps.words(col("text")), merges)).as("tok"))
    val vocab = toks
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .withColumn("id", row_number().over(
          Window.orderBy(col("df").desc, col("tf").desc, col("tok").asc))
        .cast("long"))
      .select(col("tok"), col("id"))
    toks.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("tokens"),
        sum(col("id")).as("id_sum"))
      .orderBy(col("lang"))
  }

  /**
   * UNK-coverage census under a CAPPED vocabulary — the trainer-integrity
   * audit [[numericalizeCensus]] cannot express: rank the full subword
   * vocabulary (df desc, tf desc, token asc — a total order), keep the
   * top `vocabSize` ids, and report per language how many token
   * occurrences and whole documents fall OUTSIDE the vocabulary. BPE
   * round-trip is lossless exactly for documents with zero UNKs, so
   * `docs_with_unk` counts the docs a `vocabSize`-entry tokenizer cannot
   * reconstruct — the coverage number a tokenizer choice is judged by.
   *
   * Scale shape: same one-explode + one-aggregation as
   * [[numericalizeCensus]]; the ranking window runs over the VOCAB
   * relation (distinct subwords — bounded, orders of magnitude smaller
   * than the corpus), and documents join the finished vocab broadcast.
   */
  def unkCoverageCensus(
      documents: DataFrame,
      merges: Seq[(String, String)] = defaultMerges,
      vocabSize: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val toks = documents.select(col("doc_id"), col("lang"),
      explode(segment(TextOps.words(col("text")), merges)).as("tok"))
    val vocab = toks
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .withColumn("id", row_number().over(
          Window.orderBy(col("df").desc, col("tf").desc, col("tok").asc))
        .cast("long"))
      .select(col("tok"), col("id"))
    toks.join(broadcast(vocab), Seq("tok"))
      .withColumn("unk", (col("id") > vocabSize).cast("long"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("tokens"),
        sum(col("unk")).as("unk_tokens"),
        countDistinct(when(col("unk") === 1L, col("doc_id"))).as("docs_with_unk"))
      .orderBy(col("lang"))
  }

  /**
   * Subword vocabulary census — [[PrepOps.vocabTopK]] in the BPE domain:
   * document frequency and total frequency of every subword token, top-k.
   * Same single explode + groupBy shape; the segmentation happens inside
   * the scan projection, so there is still exactly one shuffle.
   */
  def vocabTopK(
      documents: DataFrame,
      merges: Seq[(String, String)] = defaultMerges,
      k: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        explode(segment(TextOps.words(col("text")), merges)).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("tok").asc)
      .limit(k)
  }

  /**
   * FERTILITY census — subword tokens per word, per language: THE standard
   * tokenizer-quality metric for multilingual corpora (a tokenizer trained
   * on English-heavy data segments other languages into more pieces; high
   * fertility means longer sequences, worse effective context, higher
   * training cost for the same text). Reports per language the exact word
   * and subword-token sums plus their ratio as a micro-quantized integer —
   * `fertility_micro = (subword_tokens * 1e6) div words`, pure BIGINT
   * floor division, bit-identical across engines (never a double divide).
   *
   * Scale shape: one scan, two per-row codegen'd expressions (word count +
   * segment count), one hash aggregation with map-side partials — no
   * explode, no shuffle of the token stream; the cheapest of the BPE
   * censuses.
   */
  def fertilityCensus(
      documents: DataFrame,
      merges: Seq[(String, String)] = defaultMerges): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("lang"),
        size(TextOps.words(col("text"))).cast("long").as("w"),
        size(segment(TextOps.words(col("text")), merges)).cast("long").as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("w")).as("words"),
        sum(col("t")).as("subword_tokens"))
      .withColumn("fertility_micro",
        expr("subword_tokens * CAST(1000000 AS BIGINT) div words"))
      .orderBy(col("lang"))
  }
}
