package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over the `documents` table (SURVEY.md §2.4;
 * training-data-pipeline surface: dedup, language-ID, quality scoring, token
 * counting, fingerprinting).
 *
 * Design rules for 100 TB:
 *  - everything is per-row column expressions + integer-sum aggregations —
 *    single scan, map-side partial aggregation, no joins, no UDFs;
 *  - cross-engine determinism: ratios are computed from exact integer sums
 *    (never averaged doubles), so results are identical regardless of
 *    partitioning / summation order.
 */
object TextOps {

  /** Whitespace tokens of the lowercased text (shared definition, E3/x-ops). */
  def words(text: Column): Column = split(lower(text), " ")

  /** E1: exact dedup census — total vs distinct normalized-md5 fingerprints. */
  def dedupExact(documents: DataFrame): DataFrame =
    documents.agg(
      count(lit(1)).as("total"),
      countDistinct(md5(lower(trim(col("text"))).cast("binary"))).as("distinct_norm"))

  /** E3: per-language doc count, char sum, mean whitespace-token count. */
  def textStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"))
      .orderBy(col("lang"))

  // Stopword lists for the n-gram language-ID heuristic. Tiny closed sets —
  // evaluated as array_contains inside a HOF filter, fully codegen'd.
  // Shared with the DuckDB oracle SQL (SparkEntry) so both sides use one list.
  private[graft] val stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en", "para"))

  private def hits(ws: Column, lang: String): Column =
    size(filter(ws, w => array_contains(array(stop(lang).map(lit): _*), w)))

  /**
   * Language-ID heuristic (stopword-hit argmax with fixed precedence
   * en > de > fr > es, 'und' when no list matches) cross-tabulated against the
   * labeled `lang` — the confusion table of the detector.
   */
  def langId(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val d = documents.select(
      col("lang"),
      hits(ws, "en").as("h_en"), hits(ws, "de").as("h_de"),
      hits(ws, "fr").as("h_fr"), hits(ws, "es").as("h_es"))
    d.withColumn("predicted",
        when(col("h_en") > 0 && col("h_en") >= col("h_de") &&
             col("h_en") >= col("h_fr") && col("h_en") >= col("h_es"), "en")
          .when(col("h_de") > 0 && col("h_de") >= col("h_fr") &&
                col("h_de") >= col("h_es"), "de")
          .when(col("h_fr") > 0 && col("h_fr") >= col("h_es"), "fr")
          .when(col("h_es") > 0, "es")
          .otherwise("und"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /**
   * x147: code-switching census — documents whose stopword evidence is
   * SPLIT between two languages (the CCNet-style mixed-language flag: a
   * doc whose second-best language scores ≥ `ratioPermille`‰ of its best,
   * with at least `minHits` hits, is neither cleanly one language nor the
   * other — route it to review instead of a monolingual corpus). Pure
   * per-row expression work on the same stopword-hit columns as
   * [[langId]]; the best/second-best pick is one descending sort of the
   * 4-element hit array (both engines sort integer lists identically).
   * Census per DECLARED language: docs, mixed docs, and the worst
   * second-to-best ratio seen (micro, integral division).
   */
  def langMixCensus(documents: DataFrame, minHits: Long = 3L,
      ratioPermille: Long = 500L): DataFrame = {
    val w = words(col("text"))
    documents.select(col("lang"),
      sort_array(array(hits(w, "en"), hits(w, "de"), hits(w, "fr"),
        hits(w, "es")), asc = false).as("h"))
      .select(col("lang"),
        col("h").getItem(0).cast("long").as("best"),
        col("h").getItem(1).cast("long").as("second"))
      .withColumn("mixed",
        col("best") > 0L && col("second") >= minHits &&
          col("second") * 1000L >= lit(ratioPermille) * col("best"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("mixed"), 1L).otherwise(0L)).as("mixed_docs"),
        max(when(col("best") > 0L,
          expr("(1000000L * second) DIV best")).otherwise(0L)).as("max_mix_micro"))
      .orderBy(col("lang"))
  }

  /**
   * Quality scoring: per-language exact-integer aggregates → stable ratios.
   * `stop_ratio` = English-stopword density, `ttr` = type-token ratio
   * (unique/total words), `avg_chars` = mean doc length.
   */
  def qualityStats(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    documents
      .select(
        col("lang"), col("n_chars"),
        size(ws).as("n_words"),
        size(array_distinct(ws)).as("n_uniq"),
        hits(ws, "en").as("n_stop"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_words")).as("sum_words"),
        round(sum(col("n_stop")).cast("double") / sum(col("n_words")), 6).as("stop_ratio"),
        round(sum(col("n_uniq")).cast("double") / sum(col("n_words")), 6).as("ttr"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
      .orderBy(col("lang"))
  }

  /** BPE-ish token regex: letter runs, single digits, single non-alnum marks. */
  private val tokenRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Token counting: whitespace tokens vs regex (BPE-ish) tokens, per language. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents
      .select(
        col("lang"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(tokenRe), lit(0))).as("re_tokens"))
      .groupBy(col("lang"))
      .agg(
        sum(col("ws_tokens")).as("sum_ws_tokens"),
        sum(col("re_tokens")).as("sum_re_tokens"),
        round(sum(col("re_tokens")).cast("double") / sum(col("ws_tokens")), 6)
          .as("tokens_per_word"))
      .orderBy(col("lang"))

  /** Exact per-language length quantiles (linear-interpolated, the same
    * definition DuckDB's quantile_cont uses; on integer inputs the median is
    * exactly representable, keeping the oracle hash stable). */
  def lengthQuantiles(documents: DataFrame): DataFrame =
    documents.groupBy(col("lang"))
      .agg(
        expr("percentile(n_chars, 0.5)").as("med_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"))
      .orderBy(col("lang"))

  /**
   * Token-length histogram in power-of-two buckets — the corpus-profiling
   * census behind packing/truncation decisions (how much mass sits in each
   * length regime). The bucket is the BINARY DIGIT COUNT of the token
   * count (`length(bin(toks))`: 1 ⇒ 0–1 tokens, 5 ⇒ 16–31, …), computed
   * through the engines' identical `bin()` string — never `log2`, whose
   * float result can sit an ulp under an exact power and flip a bucket on
   * one engine only. One scan, integer partials.
   */
  def lengthHistogram(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), size(words(col("text"))).cast("long").as("toks"))
      .withColumn("bucket", length(bin(col("toks"))))
      .groupBy(col("lang"), col("bucket"))
      .agg(
        count(lit(1)).as("docs"),
        min(col("toks")).as("min_toks"),
        max(col("toks")).as("max_toks"),
        sum(col("toks")).as("tokens"))
      .orderBy(col("lang"), col("bucket"))

  /**
   * Document fingerprinting (winnowing-lite): fingerprint = lexicographic min
   * of md5 over word 5-gram shingles (a 1-hash MinHash). Docs sharing a
   * fingerprint are near-dup candidates. Output: corpus census — total docs,
   * distinct fingerprints, size of the largest fingerprint cluster.
   */
  def fingerprintCensus(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    // One-pass distinct 5-grams ([[graft.functions.WordShingles]] — the HOF
    // form re-evaluated the split subtree per lambda element, O(words²) per
    // doc); min over md5 of DISTINCT grams = min over all positions, so the
    // fingerprint is unchanged. Null text: [""] → md5("") — the legacy
    // otherwise-branch value.
    val shs = when(col("text").isNull, array(lit("")))
      .otherwise(graft.functions.GraftFunctions.wordShingles(
        words(col("text")), 5, wholeDocIfShort = true))
    val perDoc = documents.select(
      array_min(transform(shs, s => md5(s.cast("binary")))).as("fp"))
    perDoc.groupBy(col("fp")).agg(count(lit(1)).as("cluster"))
      .agg(
        sum(col("cluster")).as("total_docs"),
        count(lit(1)).as("distinct_fp"),
        max(col("cluster")).as("max_cluster"))
  }

  /**
   * Within-document repetition signals per language (the Gopher-rule
   * family: a doc whose tokens are mostly repeats of themselves is
   * boilerplate/spam, filtered before training). Duplicate-token and
   * duplicate-trigram masses are exact integer sums (n − n_distinct over
   * the doc's OWN tokens/trigrams); `repetitive_docs` counts docs whose
   * duplicate-token fraction exceeds `maxDupFrac`. One scan, per-row array
   * expressions, map-side integer partials; the flag's single double
   * division is the same expression in the oracle (IEEE-stable).
   */
  def repetitionStats(documents: DataFrame, maxDupFrac: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    // Trigram counts WITHOUT materializing the position array (the HOF form
    // re-evaluated the split subtree per lambda element, O(words²) per doc):
    // total trigrams is the closed form n−2; the distinct count is the
    // one-pass expression with the short-doc policy OFF (a <3-word doc has
    // zero trigrams here — unlike [[DedupOps.shingles]]'s whole-doc rule).
    // Null text: legacy's when-branch yielded empty arrays → nt=ndt=0; the
    // null-intolerant expression needs the coalesce to match.
    val tri = graft.functions.GraftFunctions.wordShingles(
      ws, 3, wholeDocIfShort = false)
    documents
      .select(col("lang"),
        size(ws).as("nw"), size(array_distinct(ws)).as("ndw"),
        coalesce(when(size(ws) >= 3, size(ws) - 2), lit(0)).as("nt"),
        coalesce(size(tri), lit(0)).as("ndt"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum((col("nw") - col("ndw")).cast("long")).as("dup_words"),
        sum((col("nt") - col("ndt")).cast("long")).as("dup_trigrams"),
        sum(when((col("nw") - col("ndw")).cast("double")
            / greatest(col("nw"), lit(1)).cast("double") > maxDupFrac, 1L)
          .otherwise(0L)).as("repetitive_docs"))
      .orderBy(col("lang"))
  }

  /**
   * Deterministic feature-hashing embedding (the "hashing trick"): every
   * word hashes (md5-prefix, the oracle-reproducible family) to one of
   * `dim` buckets and the document's vector is its per-bucket word
   * counts as float32 — a model-free text→vector bridge, so the entire
   * similarity stack ([[graft.operators.SimilarityOps]]: cosine top-k,
   * near-dup, IVF) runs on corpora that ship no embedding column.
   * Output: (doc_id, embedding array<float>).
   *
   * Scale shape: one explode → one (doc, bucket) count aggregation
   * (map-side partials) → one per-doc map_from_entries + dense transform
   * (O(dim · nnz) per row, dim a small constant) — no joins, no UDFs,
   * fully codegen'd. Deterministic everywhere, so the same text always
   * embeds identically on any cluster.
   */
  def hashEmbed(documents: DataFrame, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val bucket =
      graft.functions.GraftFunctions.md5PrefixLong(col("x"), 8) % dim
    documents
      .select(col("doc_id"), explode(words(col("text"))).as("x"))
      .select(col("doc_id"), bucket.as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          j => coalesce(element_at(col("m"), j), lit(0L)).cast("float"))
          .as("embedding"))
  }

  /** Non-overlapping `width`-token windows of the text (docs shorter than
    * `width` contribute none; a trailing partial window is dropped). The
    * ONE definition both span operators and both their DuckDB oracles
    * must stay bit-identical to.
    *
    * One-pass codegen'd expression ([[graft.functions.WordSpans]]) over
    * the split-once token array — the HOF form it replaces re-evaluated
    * the `split(lower(text))` subtree per WINDOW (O(words²/width) per
    * doc, the [[graft.functions.WordShingles]] failure class; the last
    * in-tree instance). Value-identical including edges (equivalence
    * property-tested in WordSpansSpec); the `coalesce` keeps the legacy
    * null-text value (empty array — the old when/otherwise sent a null
    * size to the otherwise branch). Callers' sessions must be
    * [[graft.functions.GraftFunctions.register]]ed (every span entry
    * point is). */
  private def spanArray(width: Int): Column = {
    require(width > 0, "span width must be positive")
    coalesce(
      graft.functions.GraftFunctions.wordSpans(words(col("text")), width),
      array().cast("array<string>"))
  }

  /**
   * Content-defined chunks of a document (CDC, the rolling-hash cut rule):
   * a boundary falls AFTER token position p whenever the md5-prefix hash
   * of the 3-gram ending at p is ≡ 0 (mod `m`) — so cut points depend on
   * LOCAL content only, and an insertion early in a document shifts no
   * boundary after the edit's 3-gram neighborhood. That is the property
   * the fixed-width span grid ([[spanArray]]) lacks: one added token
   * re-aligns every later span, hiding all cross-doc duplication past the
   * edit; CDC chunks re-synchronize immediately (the backup-dedup /
   * rsync-style chunking argument, applied to corpus text). Docs shorter
   * than 3 tokens (or with no qualifying gram) form one whole-doc chunk;
   * expected chunk length is ~`m` tokens. Pure per-row expression work —
   * one codegen'd pass over the token array ([[graft.functions.CdcChunks]]).
   *
   * Round-7 note: this was a higher-order-function pipeline through round 6
   * and the suite's one scale-killer (92 s at sf0.1 — every lambda reference
   * re-evaluated the whole `split` subtree, an md5 per position times
   * O(tokens) re-splits). The single-pass expression keeps the identical
   * boundary rule and edge cases (equivalence property-tested against the
   * legacy column form in CdcChunksSpec), so the x54/x55 oracle hashes are
   * unchanged.
   */
  private[graft] def cdcChunks(m: Int): Column = {
    require(m > 0, "cdc modulus must be positive")
    call_function("cdc_chunks", words(col("text")), lit(m))
  }

  /**
   * Cross-document CDC duplicate-chunk census — [[duplicateSpans]] with
   * content-defined boundaries instead of the fixed grid: exact integers
   * over the corpus chunk relation (total chunk occurrences, distinct
   * chunks, chunks appearing in >1 doc, widest sharing). Same scale shape:
   * per-row chunking, one groupBy(chunk) with map-side partials.
   */
  def cdcChunkCensus(documents: DataFrame, m: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"), explode(cdcChunks(m)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("nd"))
      .agg(
        sum(col("cnt")).as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("shared_chunks"),
        max(col("nd")).as("max_docs_sharing"))
  }

  /**
   * APPLY corpus-wide CDC chunk dedup and RETURN THE CLEANED CORPUS — the
   * shift-robust twin of [[spanDedupApply]]: every occurrence of a chunk
   * except its first (minimum (doc_id, position)) is removed and each
   * document is reassembled from its surviving chunks in position order
   * (chunks cover the whole token sequence, so there is no tail case; a
   * document can come out empty). Because [[cdcChunks]] boundaries are
   * content-local, a one-token edit in one copy of shared boilerplate
   * still lets every later chunk dedup — the span grid would miss all of
   * them. Winner selection is one row_number window over the chunk key;
   * reassembly is one groupBy(doc_id) of the doc's own chunks — both keys
   * hash-distribute.
   */
  def cdcDedupApply(documents: DataFrame, m: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val base = documents.select(col("doc_id"), col("lang"), cdcChunks(m).as("chunks"))
    val kept = base
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s("chunk"))).as("kept_text"))
    base.select(col("doc_id"), col("lang"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"),
        coalesce(col("kept_text"), lit("")).as("text"))
  }

  /**
   * Cross-document duplicate-span census: a span occurring in more than
   * one document is boilerplate shared ACROSS docs — the span-level
   * complement of whole-doc dedup, what a pipeline removes as repeated
   * headers/footers/licenses. Exact integers: total span occurrences,
   * distinct spans, spans shared by >1 doc, and the widest sharing. Span
   * generation ([[spanArray]]) is a per-row expression; the census is one
   * groupBy(span) with map-side partials — span keys hash-distribute like
   * any other aggregation key at 100 TB.
   */
  def duplicateSpans(documents: DataFrame, width: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"), explode(spanArray(width)).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .agg(
        sum(col("n")).as("total_spans"),
        count(lit(1)).as("distinct_spans"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("shared_spans"),
        max(col("nd")).as("max_docs_sharing"))
  }

  /**
   * APPLY global span dedup and RETURN THE CLEANED CORPUS — the output a
   * training run actually consumes, where [[spanDedupCensus]] only counts
   * the cut. Every occurrence of a span except its first — minimum
   * (doc_id, position) over [[spanArray]] windows — is removed; each
   * document is reassembled from its surviving spans (in position order)
   * followed by its tail tokens (the trailing partial window, which the
   * span grid never covers and is therefore always kept). Documents
   * shorter than `width` pass through whole; a document can come out
   * empty if every one of its spans lost and it has no tail. The
   * reassembled text is in the span domain (lowercased, single-space
   * joined) — the same normalization every span operator applies.
   *
   * Scale shape: winner selection is the same single row_number window
   * over the span key as [[spanDedupCensus]]; reassembly is one
   * groupBy(doc_id) collecting the doc's OWN surviving spans (bounded by
   * the doc's length, never corpus-wide) joined back to the corpus —
   * both keys hash-distribute.
   */
  /**
   * WITHIN-document duplicate-window removal — the Gopher/C4 intra-doc
   * cleaning rule ([[spanDedupApply]] removes a span's repeats across the
   * CORPUS; this removes a span's repeats inside its OWN document, the
   * rule that strips nav menus and footer text repeated through one page).
   * Every `width`-token window after the first occurrence IN THE SAME DOC
   * is dropped; surviving windows reassemble in position order, the
   * sub-window tail is kept verbatim.
   *
   * Scale shape: ZERO shuffles — `array_distinct` preserves first-
   * occurrence order (hash-set backed, O(spans) per row), so the whole
   * rule runs inside the scan projection, embarrassingly parallel at any
   * corpus size. Contrast every other dedup in this file, which needs at
   * least one key shuffle because its duplicate scope is corpus-wide.
   */
  def intraDocSpanDedup(documents: DataFrame, width: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    val nSpans = (size(ws) / lit(width)).cast("int")
    documents.select(col("doc_id"), col("lang"),
      concat_ws(" ", array_remove(array(
        concat_ws(" ", array_distinct(spanArray(width))),
        concat_ws(" ", slice(ws, nSpans * lit(width) + 1, size(ws)))), ""))
        .as("text"))
  }

  def spanDedupApply(documents: DataFrame, width: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val ws = words(col("text"))
    val nSpans = (size(ws) / lit(width)).cast("int")
    val base = documents.select(
      col("doc_id"), col("lang"),
      spanArray(width).as("spans"),
      // tokens after the last full window (all of them for short docs)
      concat_ws(" ", slice(ws, nSpans * width + 1, size(ws))).as("tail_text"))
    val kept = base
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("span")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s("span"))).as("kept_text"))
    base.join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", array_remove(
          array(coalesce(col("kept_text"), lit("")), col("tail_text")), ""))
          .as("text"))
  }

  /**
   * APPLY global span dedup (the C4-style "remove duplicated lines
   * corpus-wide" rule, over [[spanArray]] windows because this corpus has
   * no line structure): every occurrence of a span except its FIRST —
   * minimum (doc_id, position) — is marked removed, and the census
   * reports per language how much text that takes out and how many docs
   * it touches. Winner selection is one row_number window over the span
   * key (a single shuffle, the same key distribution as
   * [[duplicateSpans]]); determinism comes from the (doc_id, pos) order.
   */
  def spanDedupCensus(documents: DataFrame, width: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val occ = documents.select(col("lang"), col("doc_id"),
      posexplode(spanArray(width)).as(Seq("pos", "span")))
    occ
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("span")).orderBy(col("doc_id"), col("pos"))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("spans"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("removed_spans"),
        (sum(when(col("rn") > 1, 1L).otherwise(0L)) * width).as("tokens_removed"),
        countDistinct(when(col("rn") > 1, col("doc_id"))).as("docs_affected"))
      .orderBy(col("lang"))
  }

  /** Corpus-wide span document frequency → the boilerplate flag relation:
    * spans appearing in at least `minDf` DISTINCT documents. One
    * span-keyed partial-agg groupBy; shared by census and apply so both
    * see the identical flag set. */
  private def boilerplateSpans(occ: DataFrame, minDf: Int): DataFrame =
    occ.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("span"))

  /**
   * x112: boilerplate span census — the rule that is NOT span dedup:
   * a span whose corpus-wide document frequency reaches `minDf` is
   * template text (site chrome, license headers, navigation), and a
   * boilerplate filter removes EVERY occurrence, including the first —
   * where [[spanDedupCensus]] (the C4 dedup rule) always keeps one winner.
   * Per language: span volume, boilerplate occurrences, token mass they
   * carry, and documents touched.
   *
   * Scale shape: document frequency is one span-keyed partial-agg groupBy
   * (no window — a hot template span is absorbed map-side); the flag
   * relation (spans with df ≥ minDf — the template set, far smaller than
   * the occurrence relation) joins back to occurrences on the SAME span
   * key the aggregation just hash-distributed on, so the join reuses that
   * distribution and AQE can broadcast the flag side when it is small.
   * `docs_touched` needs a distinct-doc count over flagged occurrences —
   * expressible only after the join, which is why the census is not a
   * single aggregation.
   */
  def boilerplateCensus(documents: DataFrame, width: Int = 8, minDf: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val occ = documents.select(col("lang"), col("doc_id"),
      explode(spanArray(width)).as("span"))
    val flagged = boilerplateSpans(occ, minDf).withColumn("bp", lit(true))
    occ.join(flagged, Seq("span"), "left_outer")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("spans"),
        sum(when(col("bp"), 1L).otherwise(0L)).as("bp_occurrences"),
        (sum(when(col("bp"), 1L).otherwise(0L)) * width).as("bp_tokens"),
        countDistinct(when(col("bp"), col("doc_id"))).as("docs_touched"))
      .orderBy(col("lang"))
  }

  /**
   * x113: APPLY boilerplate removal — drop every occurrence of every
   * flagged span ([[boilerplateCensus]]'s rule) and reassemble each
   * document from its surviving spans plus the fixed tail (tokens after
   * the last full window), reporting the per-language cleaned-corpus
   * census. The survivor rule is the complement of [[spanDedupApply]]'s:
   * there the first occurrence wins, here no occurrence does.
   *
   * Scale shape: the flag set comes from the same span-keyed groupBy;
   * survivors are one anti-join of occurrences against it (same span key
   * distribution); reassembly is one groupBy(doc_id) over the doc's OWN
   * surviving spans — bounded by document length, never corpus-wide —
   * joined back to the corpus on doc_id. No windows anywhere.
   */
  def boilerplateApply(documents: DataFrame, width: Int = 8, minDf: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    val nSpans = (size(ws) / lit(width)).cast("int")
    val base = documents.select(
      col("doc_id"), col("lang"),
      spanArray(width).as("spans"),
      concat_ws(" ", slice(ws, nSpans * width + 1, size(ws))).as("tail_text"))
    val occ = base.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
    val flagged = boilerplateSpans(occ, minDf)
    val kept = occ
      .join(flagged, Seq("span"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s("span"))).as("kept_text"))
    base.join(kept, Seq("doc_id"), "left_outer")
      .select(col("lang"),
        concat_ws(" ", array_remove(
          array(coalesce(col("kept_text"), lit("")), col("tail_text")), ""))
          .as("text"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("kept_tokens"),
        sum(length(col("text")).cast("long")).as("kept_chars"))
      .orderBy(col("lang"))
  }

  /**
   * x79: bigram-LM perplexity proxy — the CCNet-style corpus-intrinsic
   * quality signal (Wenzek et al. 2020, public method; the reference's
   * quality filters are rule-based, this is the model-based sibling a real
   * curation pipeline adds). An add-one-smoothed bigram language model is
   * trained on the corpus itself and every document is scored by its
   * average negative log-probability under that model: templated /
   * boilerplate text is predictable (low NLL), lexical noise is not.
   *
   * Cross-engine determinism: the model stores each DISTINCT bigram's
   * log-prob once, as a fixed-point micro-nat weight
   * `floor(ln((c12+1)/(c1+V)) * 1e6 + 0.5)` — one `ln` per model row, where
   * both engines' IEEE doubles agree far beyond the 1e-6 quantum — and
   * documents are scored by an EXACT integer sum of those weights, so
   * partition count and summation order cannot perturb the result. The
   * average divides once at the end (`nll_micro / (n * 1e6)`), a single
   * exactly-rounded IEEE operation.
   *
   * Scale shape: tokens are materialized once per row and bigrams emitted
   * by a single expression pass; `c12` is a partial-aggregating groupBy
   * (hot first-tokens are absorbed map-side — deliberately NOT a window
   * over `w1`, which would hand every "the …" occurrence to one task);
   * `c1` re-aggregates the already-distinct `c12` relation (model-sized
   * input, not corpus-sized); the vocabulary size V is one broadcast
   * scalar; scoring is an equi-join on the bigram key, AQE-skew-splittable.
   * Training on the scoring corpus means no OOV path is needed; a held-out
   * model would add one broadcast/backoff branch, same shapes.
   */
  def bigramLmScore(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), words(col("text")).as("ws"))
    val bi = toks
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws)-1), i -> named_struct(" +
          "'w1', element_at(ws, i), 'w2', element_at(ws, i+1)))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    val model = c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        floor(log((col("n12") + lit(1.0)) / (col("n1") + col("v"))) * lit(1e6) + lit(0.5))
          .cast("long").as("w"))
    bi.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("w"))).as("nll_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_micro"),
        (col("nll_micro").cast("double") / (col("n_bigrams").cast("double") * lit(1e6)))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /**
   * x80: per-document shingle novelty — the fraction of a document's
   * distinct word-3-gram shingles whose FIRST corpus occurrence (minimum
   * doc_id) is this document. 1.0 = entirely new content, 0.0 = everything
   * already seen earlier; the standard dedup-aware sampling weight (weight
   * repeated boilerplate down without dropping the document outright).
   *
   * Plan shape: the novel-count side aggregates shingle→min(doc_id) first
   * (partial agg absorbs boilerplate-shingle skew) and then counts firsts
   * per doc, so the final join is doc_id-keyed on two doc-sized relations —
   * no skewed shingle-keyed join-back, no window over the shingle key.
   * Ratio from exact integer counts, one division at the end.
   */
  def noveltyCensus(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val sh = documents.select(col("doc_id"),
      explode(DedupOps.shingles(col("text"))).as("s"))
    val perDoc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val novel = sh.groupBy(col("s")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /**
   * x86: PMI collocations — the top-k adjacent word pairs by pointwise
   * mutual information, `ln(p(w1,w2) / (p(w1)·p(w2)))` with
   * `p(w1,w2) = n12/N_bi` and `p(w) = n/N_uni`, over pairs seen at least
   * `minCount` times. The classic phrase-mining step: collocations become
   * tokenizer merge candidates / phrase-vocabulary entries ("new york"
   * scores high because its parts rarely appear apart).
   *
   * Determinism: the PMI ratio is evaluated as ONE fixed-shape IEEE chain
   * over exact integer counts (`(n12·1.0·N_u·N_u) / (N_b·1.0·n1·n2)` —
   * N_u² may exceed a long at corpus scale, so the products stay in
   * double, identically associated in both engines), quantized once to
   * micro-nats; ordering tie-breaks through (w1, w2) — a total order, so
   * both engines return the identical top-k.
   *
   * Scale shape: unigram and bigram counts are token-keyed partial-agg
   * groupBys; the count joins are vocab-sized; minCount prunes the pair
   * relation BEFORE the joins; the top-k is TakeOrderedAndProject, never
   * a global sort.
   */
  def pmiCollocations(documents: DataFrame, minCount: Long = 5L, k: Int = 20): DataFrame = {
    val toks = documents.select(words(col("text")).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val nu = uni.agg(sum(col("n")).as("n_uni"))
    val bi = toks
      .where(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws)-1), i -> named_struct(" +
          "'w1', element_at(ws, i), 'w2', element_at(ws, i+1)))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val nb = c12.agg(sum(col("n12")).as("n_bi"))
    c12.filter(col("n12") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("n", "n1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("n", "n2"), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
        floor(log((col("n12") * lit(1.0) * col("n_uni") * col("n_uni"))
          / (col("n_bi") * lit(1.0) * col("n1") * col("n2"))) * lit(1e6) + lit(0.5))
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /**
   * x84: CCNet-style perplexity buckets APPLIED (Wenzek et al. 2020,
   * public method) — label every document head/middle/tail by terciles of
   * its [[bigramLmScore]] total NLL, the standard perplexity-stratified
   * corpus split (train mostly on `head`, keep `tail` for diversity
   * probes). Documents too short to score (< 2 tokens) keep bucket 0 /
   * `unscored` rather than vanishing — an apply form labels the WHOLE
   * corpus.
   *
   * Exact NTILE semantics WITHOUT a single-partition window: a bare
   * `NTILE(3) OVER (ORDER BY nll)` plans as one task holding the entire
   * corpus ordering (the a5 problem, SURVEY §2.3 x20). Instead the global
   * position comes from [[WindowOps.runningTotal]]'s two-pass prefix-count
   * — coarse NLL bins (`nll_micro DIV 2^20`, non-decreasing along the
   * order, O(#bins) driver list) partition the ordering so every task
   * ranks one bin — and the bucket is then NTILE's closed form over
   * (rank, n): the first `n mod 3` buckets take `ceil(n/3)` rows. The
   * DuckDB oracle runs the real NTILE; matching it bit-for-bit is the
   * proof the distributed form IS the window.
   */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    // Materialized once: the score relation is ~24 B/doc (three longs),
    // and BOTH ranking passes (the per-bin partial counts and the final
    // join) plus the corpus re-join read it — without this the whole
    // bigram train-and-score pipeline would run three times. Same
    // eager-tiny-intermediate precedent as the x42/x76 composites
    // (runningTotal's partials collect makes construction eager anyway).
    val scored = bigramLmScore(documents).drop("avg_nll").localCheckpoint()
    val tiled = WindowOps.withGlobalNtile(
      scored,
      expr("nll_micro DIV 1048576"),
      Seq(col("nll_micro"), col("doc_id")),
      3, "bucket")
    documents.select(col("doc_id"))
      .join(tiled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        coalesce(col("bucket"), lit(0L)).cast("long").as("bucket"),
        coalesce(when(col("bucket") === 1, "head").when(col("bucket") === 2, "middle")
          .when(col("bucket") === 3, "tail"), lit("unscored")).as("label"))
      .orderBy(col("doc_id"))
  }

  /**
   * x94: vocabulary-growth curve (Heaps' law audit) — distinct vocabulary
   * and total token mass for each doc-count prefix of the corpus, at
   * power-of-two checkpoints `doc_id < 2^k` for k in 4..20. Heaps' law
   * predicts `vocab ≈ K·tokens^β` with β ≈ 0.5–0.7 on natural text; a curve
   * that flattens early means the corpus is recycling templates (synthetic
   * or boilerplate-heavy), one that stays near-linear means noise — THE
   * one-glance diagnostic a data buyer runs before committing a crawl to
   * training. The deterministic doc_id prefix order makes the curve
   * reproducible (no sampling RNG).
   *
   * The naive form recomputes a distinct-count per checkpoint — 17 scans.
   * Instead: a token enters the vocabulary at its FIRST document, so
   * `vocab(t) = |{w : first_doc(w) < t}|` — one token-keyed min-aggregation
   * (map-side partial on the token key), then each token/doc row joins the
   * 17-row broadcast checkpoint table with a `<` theta-predicate (a
   * broadcast nested-loop over a literal — constant per-row work, no
   * shuffle) and one final 17-group count. Token mass reuses the same shape
   * over per-doc counts. Everything is integer-exact; the type-token ratio
   * divides once per checkpoint row.
   */
  /**
   * x99: per-document unigram Shannon entropy — the information-density
   * quality signal the ratio rules can't see: type–token ratio treats "a a
   * a b b b" and "a b a b a b" alike and repetitionStats looks at adjacent
   * structure, but a LOW-entropy doc is dominated by few tokens regardless
   * of arrangement (boilerplate, keyword stuffing), and entropy grades it
   * on a calibrated nats scale. `H = ln n − (1/n)·Σ c_w·ln c_w` over the
   * doc's token counts.
   *
   * Exactness: each ln is quantized ONCE per integer input (ln c for a
   * count, ln n for the doc length), and the identity is carried as the
   * exact integer numerator `ent_num = n·⌊ln n·1e6⌉ − Σ c·⌊ln c·1e6⌉` —
   * partitioning-invariant — with entropy = ent_num/(n·1e6), ONE division.
   * Singleton tokens contribute exactly 0 (⌊ln 1·1e6⌉ = 0), so the sum is
   * over repeated tokens only.
   *
   * Scale shape: one explode → (doc_id, token)-keyed counting aggregation
   * (map-side partials) → one doc-keyed reduce. Same two-shuffle shape as
   * every per-doc token census here; nothing is corpus-global.
   */
  def tokenEntropy(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_toks"),
        sum(col("c") * floor(log(col("c").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long")).as("sce_micro"))
      .withColumn("ent_num",
        col("n_toks") * floor(log(col("n_toks").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long") - col("sce_micro"))
      .withColumn("entropy",
        col("ent_num").cast("double") / (col("n_toks").cast("double") * lit(1e6)))
      .orderBy(col("doc_id"))
  }

  def vocabGrowth(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val thresholds = (4 to 20).map(k => 1L << k).toDF("t")
    val toks = documents.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val firstOcc = toks.groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val vocabAt = firstOcc
      .join(broadcast(thresholds), col("fd") < col("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("vocab"))
    val docToks = documents.select(
      col("doc_id"), size(words(col("text"))).cast("long").as("n_toks"))
    val tokensAt = docToks
      .join(broadcast(thresholds), col("doc_id") < col("t"))
      .groupBy(col("t")).agg(sum(col("n_toks")).as("tokens"), count(lit(1)).as("docs"))
    tokensAt.join(vocabAt, Seq("t"))
      .select(col("t"), col("docs"), col("tokens"), col("vocab"),
        (col("vocab").cast("double") / col("tokens").cast("double")).as("ttr"))
      .orderBy(col("t"))
  }
}
