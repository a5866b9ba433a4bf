package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Decimal→BIGINT narrowing that FAILS LOUDLY on overflow: Spark's default
  * non-ANSI cast yields NULL silently past ±2^63, which would surface as a
  * null metric with no diagnostic. Null input (empty-corpus aggregate)
  * stays null — only a non-null value that doesn't fit raises. Shared by
  * the exact-integer metric carriers (kappa, AUC, KL). */
private[operators] object CheckedCast {
  def toLongChecked(c: Column, what: String): Column =
    when(c.isNotNull && c.cast("long").isNull,
      raise_error(concat(lit(s"$what overflows BIGINT: "), c.cast("string"))).cast("long"))
      .otherwise(c.cast("long"))
}

/**
 * Training-data PREPARATION operators — the last-mile transforms between a
 * curated corpus and a training run: sensitive-term redaction, multi-rule
 * quality filtering (Gopher/C4-style), deterministic train/val/test
 * splitting, token-budget sequence packing, and a vocabulary census.
 *
 * Complements the reference-derived surface (SURVEY.md §2.4): where
 * [[CurationOps]] decides WHICH documents survive, PrepOps shapes WHAT the
 * trainer ingests. Design rules shared with [[TextOps]]:
 *
 *  - per-row column expressions + integer aggregations — one scan, map-side
 *    partials, no UDFs, everything inside whole-stage codegen;
 *  - cross-engine determinism: ratio rules are integer cross-multiplications
 *    (never double compares), hashes are the md5-prefix family, so every
 *    census is DuckDB-oracle-gateable bit-for-bit;
 *  - apply forms return the corpus a trainer consumes; census forms return
 *    exact-integer audit rows over the SAME definitions.
 */
object PrepOps {

  /** Whitespace tokens of the lowercased text (the corpus-wide definition). */
  private def ws: Column = TextOps.words(col("text"))

  /** Max multiplicity of any token in `w` — the `dom` rule's numerator.
    * Sorted run-length scan: equal tokens are adjacent under any total
    * order, so the longest run IS the max count. O(n log n) per document,
    * replacing the O(u·n) `array_distinct × filter` formulation whose
    * per-distinct-token array materializations dominated the quality
    * family's per-row cost (measured at the 500× ingest probe). Value- and
    * null-identical to the old expression: null array → null; the empty
    * array is unreachable (`split("", " ")` yields `[""]`), and the `""`
    * init sentinel is still safe there — run starts at 0, so a leading `""`
    * token counts as 1 like any other. */
  private[graft] def maxWordMultiplicity(w: Column): Column =
    aggregate(
      array_sort(w),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  // ---------------------------------------------------------------- redact

  /**
   * Default sensitive-string patterns: email addresses, NANP-style phone
   * numbers, dotted-quad IPv4 addresses. RE2-compatible (no backreferences
   * or lookaround) so Spark's Java regex and the DuckDB oracle agree on
   * every match.
   */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "phone" -> """\d{3}[-.]\d{3}[-.]\d{4}""",
    "ipv4" -> """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""")

  /** Sequential left-fold of `regexp_replace` over `patterns`. */
  private def redactedText(patterns: Seq[(String, String)], replacement: String): Column =
    patterns.foldLeft(col("text")) { case (c, (_, re)) =>
      regexp_replace(c, lit(re), lit(replacement))
    }

  /**
   * APPLY redaction and return the cleaned corpus (doc_id, lang, text):
   * every match of every pattern replaced by `replacement`, patterns
   * applied in order (each sees the previous replacements). Pure per-row
   * expression work — no shuffle at all; the scan parallelism IS the
   * operator's parallelism at any corpus size.
   */
  def redact(
      documents: DataFrame,
      patterns: Seq[(String, String)] = PiiPatterns,
      replacement: String = "<PII>"): DataFrame =
    documents.select(col("doc_id"), col("lang"),
      redactedText(patterns, replacement).as("text"))

  /**
   * Redaction census per language: documents scanned, total pattern hits,
   * documents touched, and exact char mass before/after. Hit counts are
   * per-pattern over the INPUT text (replacement is sequential, so a
   * pathological pattern pair could overlap — the census documents the
   * input-side view; the char delta reflects the real sequential apply).
   * One scan, integer partials.
   */
  def redactCensus(
      documents: DataFrame,
      patterns: Seq[(String, String)] = PiiPatterns,
      replacement: String = "<PII>"): DataFrame = {
    val hitCols = patterns.map { case (_, re) =>
      size(regexp_extract_all(col("text"), lit(re), lit(0)))
    }
    val hitsPerDoc = hitCols.reduce(_ + _)
    documents
      .select(col("lang"),
        hitsPerDoc.as("h"),
        length(col("text")).as("cb"),
        length(redactedText(patterns, replacement)).as("ca"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("h").cast("long")).as("hits"),
        sum(when(col("h") > 0, 1L).otherwise(0L)).as("docs_touched"),
        sum(col("cb").cast("long")).as("chars_before"),
        sum(col("ca").cast("long")).as("chars_after"))
      .orderBy(col("lang"))
  }

  // -------------------------------------------------------- quality filter

  /**
   * The four Gopher/C4-style per-document quality rules, as exact integer
   * predicates over the shared token definition (n = tokens, u = distinct
   * tokens, c = text chars; mean word length uses c − n + 1 = total word
   * chars under single-space joining):
   *
   *  - `wc`:   minWords ≤ n ≤ maxWords  (too short / too long);
   *  - `wlen`: 3n ≤ c − n + 1 ≤ 12n     (mean word length in [3, 12] —
   *            symbol soup or minified blobs fail);
   *  - `ttr`:  5u ≥ n                   (type-token ratio ≥ 0.2 —
   *            repetitive boilerplate fails);
   *  - `dom`:  5·max-word-count ≤ n     (no single token exceeds 20% of
   *            the doc — "spam spam spam" fails).
   *
   * Integer cross-multiplication keeps every rule bit-identical across
   * engines and summation orders.
   */
  private def ruleFlags(minWords: Int, maxWords: Int): DataFrame => DataFrame = { df =>
    val n = size(ws)
    val u = size(array_distinct(ws))
    val c = length(col("text"))
    val dom = maxWordMultiplicity(ws)
    df.withColumn("p_wc", n >= minWords && n <= maxWords)
      .withColumn("p_wlen", lit(3) * n <= c - n + 1 && c - n + 1 <= lit(12) * n)
      .withColumn("p_ttr", lit(5) * u >= n)
      .withColumn("p_dom", lit(5) * dom <= n)
      .withColumn("n_toks", n)
  }

  /**
   * APPLY the quality rules and return the surviving corpus — the rows a
   * trainer keeps. Same single-scan shape as [[redact]]: the rules are
   * per-row expressions, the filter pushes into the scan stage.
   */
  def qualityFilter(documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame =
    ruleFlags(minWords, maxWords)(documents)
      .filter(col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom"))
      .select(documents.columns.map(col): _*)

  /**
   * x81: Naive Bayes quality classifier — the GPT-3-style "train a quality
   * model, score the whole corpus" step (Brown et al. 2020 used logistic
   * regression over hashed features; multinomial NB is the
   * counting-closed-form sibling, trainable in two aggregations with no
   * iterative solver, so training IS a Spark job, not a driver loop).
   * Weak labels come from the [[qualityFilter]] rule conjunction; the
   * model is per-token add-one class likelihoods, applied as a
   * log-likelihood-ratio score. Docs the rules never saw as a unit get a
   * graded score — the classifier generalizes the rules it was taught.
   *
   * Determinism: like the x79 bigram LM, each DISTINCT token's LLR weight
   * `ln((cg+1)/(Ng+V)) − ln((cb+1)/(Nb+V))` is quantized ONCE to a
   * micro-nat integer; doc scores are exact integer sums plus an equally
   * quantized class prior, so partitioning cannot flip a prediction.
   *
   * Scale shape: training = one token-keyed partial-agg groupBy (the
   * class-conditional counts) + two single-row broadcast aggregates
   * (totals, doc priors); scoring = one equi-join of token occurrences
   * against the vocab-sized model (AQE-skew-splittable on stopword keys).
   */
  def nbQualityScore(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val labeled = ruleFlags(minWords, maxWords)(documents)
      .select(col("doc_id"), col("text"),
        (col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom")).as("weak_good"))
    val toks = labeled.select(col("doc_id"), col("weak_good"),
      explode(TextOps.words(col("text"))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(
      sum(when(col("weak_good"), 1L).otherwise(0L)).as("cg"),
      sum(when(!col("weak_good"), 1L).otherwise(0L)).as("cb"))
    val tot = vocab.agg(
      sum(col("cg")).as("ng"), sum(col("cb")).as("nb"), count(lit(1)).as("v"))
    val prior = labeled.agg(
      sum(when(col("weak_good"), 1L).otherwise(0L)).as("dg"),
      sum(when(!col("weak_good"), 1L).otherwise(0L)).as("db"))
      .select(floor(
        (log((col("dg") + lit(1.0)) / (col("dg") + col("db") + lit(2)))
          - log((col("db") + lit(1.0)) / (col("dg") + col("db") + lit(2)))) * lit(1e6)
          + lit(0.5)).cast("long").as("prior_micro"))
    val model = vocab.crossJoin(broadcast(tot))
      .select(col("w"), floor(
        (log((col("cg") + lit(1.0)) / (col("ng") + col("v")))
          - log((col("cb") + lit(1.0)) / (col("nb") + col("v")))) * lit(1e6)
          + lit(0.5)).cast("long").as("wt"))
    toks.join(model, "w")
      .groupBy(col("doc_id"), col("weak_good"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wt")).as("tok_micro"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("weak_good"), col("n_toks"),
        (col("tok_micro") + col("prior_micro")).as("llr_micro"),
        ((col("tok_micro") + col("prior_micro")) > 0).as("pred_good"))
      .orderBy(col("doc_id"))
  }

  /**
   * x89: classifier-vs-rules confusion census — the evaluation step after
   * training [[nbQualityScore]]: the 2×2 confusion matrix of its
   * predictions against the weak rule labels, with accuracy and Cohen's
   * kappa (chance-corrected agreement). This is training-set agreement —
   * it measures how separable the rule concept is in token space, the
   * standard first read on a bootstrapped quality model.
   *
   * Exactness: the matrix is four integer counts from one aggregation;
   * kappa's numerator `n·(tp+tn) − [(tp+fp)(tp+fn) + (fn+tn)(fp+tn)]` and
   * denominator `n² − [...]` are exact integer products (decimal-carried —
   * n² overflows a long at corpus scale), each divided ONCE into a double.
   * Everything downstream of the scored corpus is a single-row reduce.
   */
  def nbConfusionCensus(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val scored = nbQualityScore(documents, minWords, maxWords)
    val d38 = "decimal(38,0)"
    scored.agg(
        sum(when(col("weak_good") && col("pred_good"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("weak_good") && col("pred_good"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("weak_good") && !col("pred_good"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("weak_good") && !col("pred_good"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("fn") + col("tn")).cast("double")).as("accuracy"),
        CheckedCast.toLongChecked(
          (col("tp") + col("fp") + col("fn") + col("tn")).cast(d38)
            * (col("tp") + col("tn"))
            - ((col("tp") + col("fp")).cast(d38) * (col("tp") + col("fn"))
              + (col("fn") + col("tn")).cast(d38) * (col("fp") + col("tn"))),
          "kappa_num").as("kappa_num"),
        CheckedCast.toLongChecked(
          (col("tp") + col("fp") + col("fn") + col("tn")).cast(d38)
            * (col("tp") + col("fp") + col("fn") + col("tn"))
            - ((col("tp") + col("fp")).cast(d38) * (col("tp") + col("fn"))
              + (col("fn") + col("tn")).cast(d38) * (col("fp") + col("tn"))),
          "kappa_den").as("kappa_den"))
      .withColumn("kappa",
        col("kappa_num").cast("double") / col("kappa_den").cast("double"))
  }

  /**
   * x90: exact AUC of the [[nbQualityScore]] score against the weak
   * labels, by the Mann–Whitney rank-sum identity with proper midrank tie
   * handling: grouping docs by DISTINCT score s,
   * `2·np·nn·AUC = Σ_s np_s · (2·nn_below(s) + nn_s)` — every pair of a
   * positive above a negative counts 2, score-tied pairs count 1. The
   * whole-corpus ranking metric, computed without ranking any row.
   *
   * Scale shape: the per-score relation is a score-keyed partial-agg
   * groupBy (|distinct scores| ≤ corpus, usually far smaller); the
   * prefix count `nn_below` is [[WindowOps.runningTotal]]'s two-pass form
   * over that relation (coarse `llr DIV 2^20` bins — monotone for
   * negative scores too), NOT a single-partition window; the result is a
   * single-row reduce. `u2` is decimal-carried (it approaches n²/2) and
   * narrowed back to BIGINT through [[CheckedCast.toLongChecked]] — a
   * value past 2^63 (n beyond ~6e9 scored docs) raises instead of
   * silently nulling the AUC; AUC divides once.
   */
  def nbRankAuc(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val scored = nbQualityScore(documents, minWords, maxWords)
      .select(col("llr_micro"), col("weak_good")).localCheckpoint()
    val byScore = scored.groupBy(col("llr_micro")).agg(
      sum(when(col("weak_good"), 1L).otherwise(0L)).as("np_s"),
      sum(when(!col("weak_good"), 1L).otherwise(0L)).as("nn_s"))
    val cum = WindowOps.runningTotal(
      byScore, expr("llr_micro DIV 1048576"), Seq(col("llr_micro")),
      col("nn_s"), "nn_cum")
    cum.agg(
        sum(col("np_s")).as("np"), sum(col("nn_s")).as("nn"),
        CheckedCast.toLongChecked(
          sum((col("np_s") * (lit(2) * (col("nn_cum") - col("nn_s")) + col("nn_s")))
            .cast("decimal(38,0)")), "u2").as("u2"))
      .select(col("np"), col("nn"), col("u2"),
        (col("u2").cast("double")
          / (lit(2.0) * col("np").cast("double") * col("nn").cast("double"))).as("auc"))
  }

  /**
   * x91: score-decile calibration — [[nbQualityScore]]'s corpus split into
   * exact NTILE(10) score deciles (the [[WindowOps.withGlobalNtile]]
   * two-pass form, (llr, doc_id) total order — no single-partition
   * window), with each decile's document count, positive count, exact
   * score range, and positive rate. A well-separated classifier shows a
   * monotone pos_rate ramp; a flat ramp means the LLR carries no signal.
   * Positive rates are one division from exact integers per decile.
   */
  def nbCalibrationDeciles(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val scored = nbQualityScore(documents, minWords, maxWords)
      .select(col("doc_id"), col("weak_good"), col("llr_micro")).localCheckpoint()
    WindowOps.withGlobalNtile(
        scored, expr("llr_micro DIV 1048576"),
        Seq(col("llr_micro"), col("doc_id")), 10, "decile")
      .groupBy(col("decile").cast("long").as("decile"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("weak_good"), 1L).otherwise(0L)).as("positives"),
        min(col("llr_micro")).as("lo_micro"),
        max(col("llr_micro")).as("hi_micro"))
      .withColumn("pos_rate",
        col("positives").cast("double") / col("docs").cast("double"))
      .orderBy(col("decile"))
  }

  /**
   * x93: Brier score of [[nbQualityScore]] — the proper scoring rule that
   * completes the eval family: confusion/kappa (x89) grade the DECISION,
   * AUC (x90) grades the RANKING, the calibration ramp (x91) shows the
   * shape, and the Brier score `mean((p − y)²)` grades the PROBABILITIES
   * themselves — it is minimized only by the true conditional probability,
   * so an over-confident classifier pays even when its ranking is perfect.
   *
   * The probability is the LLR's logistic transform
   * `p = 1/(1 + exp(−llr))`, computed in double from the already-quantized
   * integer `llr_micro` (so both engines exponentiate the SAME value), and
   * each row's squared error is quantized to micro units BEFORE summing —
   * the corpus total is an exact integer sum, order- and
   * partitioning-invariant, divided once at the end. Reported overall and
   * per true class (the decomposition that shows WHICH side the model is
   * overconfident about).
   *
   * Scale shape: one per-row expression chain over the scored corpus, one
   * partial-aggregable reduce to two rows. Nothing new shuffles beyond
   * [[nbQualityScore]] itself.
   */
  def nbBrierScore(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val scored = nbQualityScore(documents, minWords, maxWords)
    val p = lit(1.0) / (lit(1.0) + exp(-col("llr_micro").cast("double") / lit(1e6)))
    val y = when(col("weak_good"), lit(1.0)).otherwise(lit(0.0))
    val seMicro = floor((p - y) * (p - y) * lit(1e6) + lit(0.5)).cast("long")
    scored
      .select(col("weak_good"), seMicro.as("se_micro"))
      .groupBy(col("weak_good"))
      .agg(count(lit(1)).as("docs"), sum(col("se_micro")).as("se_sum_micro"))
      .withColumn("brier",
        col("se_sum_micro").cast("double") / (col("docs").cast("double") * lit(1e6)))
      .orderBy(col("weak_good"))
  }

  /**
   * x100: per-class precision / recall / F1 + macro-F1 — the standard
   * classification report from the same four confusion counts as x89
   * (which reports accuracy/kappa). Each metric is ONE division of exact
   * integers (`F1 = 2tp/(2tp+fp+fn)` — the harmonic mean without computing
   * P and R first); macro-F1 averages the two class F1s in a fixed-order
   * two-term expression, not an aggregation, so there is no summation-order
   * hazard. Whole-corpus reduce to a single row.
   */
  def nbPrfCensus(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val scored = nbQualityScore(documents, minWords, maxWords)
    def d(c: Column): Column = c.cast("double")
    val base = scored.agg(
      sum(when(col("weak_good") && col("pred_good"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("weak_good") && col("pred_good"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("weak_good") && !col("pred_good"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("weak_good") && !col("pred_good"), 1L).otherwise(0L)).as("tn"))
    val f1g = d(lit(2) * col("tp")) / d(lit(2) * col("tp") + col("fp") + col("fn"))
    val f1b = d(lit(2) * col("tn")) / d(lit(2) * col("tn") + col("fn") + col("fp"))
    base.select(col("tp"), col("fp"), col("fn"), col("tn"),
      (d(col("tp")) / d(col("tp") + col("fp"))).as("p_good"),
      (d(col("tp")) / d(col("tp") + col("fn"))).as("r_good"),
      f1g.as("f1_good"),
      (d(col("tn")) / d(col("tn") + col("fn"))).as("p_bad"),
      (d(col("tn")) / d(col("tn") + col("fp"))).as("r_bad"),
      f1b.as("f1_bad"),
      ((f1g + f1b) / lit(2.0)).as("macro_f1"))
  }

  /**
   * x96: expected calibration error (ECE) of [[nbQualityScore]] over exact
   * score deciles — the one-number summary of the x91 ramp: how far the
   * predicted probabilities sit from the observed positive rates,
   * bin-weighted. MCE (the worst single bin) rides along.
   *
   * The usual ECE formula averages doubles twice (per-bin mean confidence,
   * then the weighted sum). Both collapse into integer space: with each
   * row's probability quantized once to `p_micro`, a bin's
   * `n_b·|pos_rate − conf|` equals `|pos_b·1e6 − Σ p_micro| / 1e6`, so
   * `ECE = Σ_b |pos_b·1e6 − sp_b| / (N·1e6)` — an exact integer numerator
   * (order- and partitioning-invariant) and ONE division. MCE divides each
   * bin's exact numerator by its own `n_b·1e6` and takes the max — max of
   * identical doubles, no summation-order hazard.
   *
   * Scale shape: deciles come from the same two-pass closed-form rank as
   * x91 (no single-partition window); everything after is a 10-row reduce.
   */
  def nbEceCensus(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-col("llr_micro").cast("double") / lit(1e6)))
    val scored = nbQualityScore(documents, minWords, maxWords)
      .select(col("doc_id"), col("weak_good"), col("llr_micro"))
      .withColumn("p_micro", floor(p * lit(1e6) + lit(0.5)).cast("long"))
      .localCheckpoint()
    val per = WindowOps.withGlobalNtile(
        scored, expr("llr_micro DIV 1048576"),
        Seq(col("llr_micro"), col("doc_id")), 10, "decile")
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_b"),
        sum(when(col("weak_good"), 1L).otherwise(0L)).as("pos_b"),
        sum(col("p_micro")).as("sp_b"))
      .withColumn("gap_num", abs(col("pos_b") * lit(1000000L) - col("sp_b")))
    per.agg(
        sum(col("n_b")).as("docs"),
        sum(col("gap_num")).as("ece_num_micro"),
        max(col("gap_num").cast("double")
          / (col("n_b").cast("double") * lit(1e6))).as("mce"))
      .select(col("docs"), col("ece_num_micro"),
        (col("ece_num_micro").cast("double")
          / (col("docs").cast("double") * lit(1e6))).as("ece"),
        col("mce"))
  }

  /**
   * x98: per-source scorecard — the triage table a pipeline operator reads
   * FIRST when a new crawl lands: for each source, volume (docs, token
   * mass), within-source exact duplication (docs minus distinct normalized
   * fingerprints — the "is this feed recycling itself" number), and the
   * quality-rule keep rate. One row per source; every rate divides exact
   * integers once.
   *
   * Scale shape: per-doc flags and the md5 fingerprint are single-scan row
   * expressions; the only shuffle is the source-keyed aggregation, with
   * `count_distinct(fp)` resolved inside it (partial aggregation absorbs
   * the per-source fan-in before the exchange). No joins.
   */
  def sourceScorecard(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame =
    ruleFlags(minWords, maxWords)(documents)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(col("fp")).as("distinct_docs"),
        sum(when(col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom"), 1L)
          .otherwise(0L)).as("kept"),
        sum(col("n_toks").cast("long")).as("tokens"))
      .select(col("source"), col("docs"),
        (col("docs") - col("distinct_docs")).as("dup_docs"),
        (col("docs") - col("distinct_docs")).cast("double")
          ./(col("docs").cast("double")).as("dup_rate"),
        col("kept"),
        col("kept").cast("double")./(col("docs").cast("double")).as("keep_rate"),
        col("tokens"),
        col("tokens").cast("double")./(col("docs").cast("double")).as("mean_tokens"))
      .orderBy(col("source"))

  /**
   * Quality-rule census per language: documents, survivors, per-rule
   * failure counts (non-exclusive — a doc failing two rules counts in
   * both), and the surviving token mass. The audit view that tells a
   * pipeline operator WHY the filter cut what it cut.
   */
  def qualityFilterCensus(
      documents: DataFrame, minWords: Int = 30, maxWords: Int = 1000): DataFrame =
    ruleFlags(minWords, maxWords)(documents)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom"), 1L)
          .otherwise(0L)).as("kept"),
        sum(when(!col("p_wc"), 1L).otherwise(0L)).as("fail_wc"),
        sum(when(!col("p_wlen"), 1L).otherwise(0L)).as("fail_wlen"),
        sum(when(!col("p_ttr"), 1L).otherwise(0L)).as("fail_ttr"),
        sum(when(!col("p_dom"), 1L).otherwise(0L)).as("fail_dom"),
        sum(when(col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom"),
          col("n_toks").cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("lang"))

  /**
   * x114: filter-funnel attribution — the census [[qualityFilterCensus]]
   * deliberately does not give: with the rules applied in the PIPELINE'S
   * fixed order (word count → word length → type-token ratio → dominance),
   * which rule actually removes each document (`kf_*` = fails this rule,
   * passed every earlier one), and what each rule removes that NO other
   * rule would catch (`only_*` = fails this rule alone — the marginal cost
   * of keeping it). `kf_*` sums + `kept` partition the corpus exactly;
   * `only_* ≤ kf_*` gaps measure rule overlap. This is the view that
   * decides rule ORDER (cheap rules that first-kill the most go first) and
   * rule RETENTION (an `only_* = 0` rule is subsumed).
   *
   * Thresholds are this operator's own (integer cross-multiplied, like
   * [[ruleFlags]]): the x45 constants are tuned to pass most of this
   * corpus, which makes every later stage's attribution zero — a funnel
   * needs rules that each bite. Single scan, one aggregation row, exact
   * integer counts; the flags are per-row codegen'd expressions.
   */
  def filterFunnel(documents: DataFrame, minWords: Int = 30): DataFrame = {
    val w = ws
    val n = size(w)
    val u = size(array_distinct(w))
    val c = length(col("text"))
    val dm = maxWordMultiplicity(w)
    val flagged = documents
      .withColumn("p_wc", n >= minWords)
      .withColumn("p_wlen", lit(3) * n <= c - n + 1 && c - n + 1 <= lit(5) * n)
      .withColumn("p_ttr", lit(2) * u >= n)
      .withColumn("p_dom", lit(10) * dm <= n)
    def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
    flagged.agg(
      count(lit(1)).as("docs"),
      cnt(!col("p_wc")).as("kf_wc"),
      cnt(col("p_wc") && !col("p_wlen")).as("kf_wlen"),
      cnt(col("p_wc") && col("p_wlen") && !col("p_ttr")).as("kf_ttr"),
      cnt(col("p_wc") && col("p_wlen") && col("p_ttr") && !col("p_dom")).as("kf_dom"),
      cnt(!col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom")).as("only_wc"),
      cnt(col("p_wc") && !col("p_wlen") && col("p_ttr") && col("p_dom")).as("only_wlen"),
      cnt(col("p_wc") && col("p_wlen") && !col("p_ttr") && col("p_dom")).as("only_ttr"),
      cnt(col("p_wc") && col("p_wlen") && col("p_ttr") && !col("p_dom")).as("only_dom"),
      cnt(col("p_wc") && col("p_wlen") && col("p_ttr") && col("p_dom")).as("kept"))
  }

  // ----------------------------------------------------------------- split

  /**
   * Deterministic train/val/test assignment: bucket = first four md5 hex
   * chars of the doc_id's string form, mod 100; bucket < trainPct → train,
   * < trainPct+valPct → val, else test. Content-independent and
   * RNG-free — the same document lands in the same split on every cluster,
   * every run, every append (the property that keeps eval sets
   * uncontaminated as the corpus grows). Per-row expression; no shuffle.
   */
  def splitAssign(documents: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    GraftFunctions.register(documents.sparkSession)
    val bucket = GraftFunctions.md5PrefixLong(col("doc_id").cast("string"), 4) % 100
    documents.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * Overlapping-window chunk census — the retrieval-corpus (RAG) prep
   * layout: each document is cut into `window`-token chunks every
   * `stride` tokens (stride < window ⇒ consecutive chunks overlap by
   * window − stride tokens, so a fact near a cut boundary is whole in at
   * least one chunk). Chunk starts are 0, stride, 2·stride, …; the last
   * chunk may run short. Census per language: docs, chunks, the total
   * chunk token mass (overlap counted — the index-size number), and
   * short chunks (< window tokens).
   *
   * Scale shape: pure per-row CLOSED FORMS — every chunk before the last
   * is exactly `window` tokens, so chunk count, total mass, and the
   * short-tail flag are three integer expressions per document; one scan,
   * one aggregation, no explode, no joins, no windows. (The APPLY form a
   * retrieval indexer consumes would explode chunk starts — rows ∝
   * tokens/stride, linear; the census deliberately skips that.)
   */
  def ragChunkCensus(
      documents: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window: window=$window stride=$stride")
    documents
      .select(col("lang"), size(ws).cast("long").as("n"))
      .withColumn("k", when(col("n") <= window, 1L)
        .otherwise(expr(s"(n - ${window}L + ${stride}L - 1L) DIV ${stride}L") + 1L))
      .select(col("lang"), col("n"), col("k"),
        ((col("k") - 1L) * window + (col("n") - (col("k") - 1L) * stride)).as("mass"),
        (col("n") - (col("k") - 1L) * stride < window).as("short"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("k")).as("chunks"),
        sum(col("mass")).as("chunk_tokens"),
        sum(when(col("short"), 1L).otherwise(0L)).as("short_chunks"))
      .orderBy(col("lang"))
  }

  /**
   * Hard per-source token cap — "this crawl contributes at most
   * `capTokens` tokens", the mixture guardrail of public corpus recipes.
   * [[graft.operators.CurationOps.tokenBudgetMix]] is its RATE-based
   * sibling: rates hit a budget in expectation, the cap enforces it
   * exactly. Docs are taken per source in deterministic (md5, doc_id)
   * order until the running token total would pass the cap; the prefix
   * rule makes membership reproducible on any cluster and stable when
   * later-hashing docs append.
   *
   * Scale shape: one window PARTITIONED BY SOURCE (sources
   * hash-distribute — never a single-partition window) computing the
   * inclusive prefix sum, then one census aggregation. No joins. A
   * single pathological source whose doc count exceeds one task's memory
   * would need the x20-style two-pass rank instead; source cardinality
   * times per-source mass makes that regime unlikely before the corpus
   * itself is resharded.
   */
  def sourceCapCensus(documents: DataFrame, capTokens: Long = 1000L): DataFrame = {
    require(capTokens > 0, s"source token cap must be positive: $capTokens")
    GraftFunctions.register(documents.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val t = documents.select(col("doc_id"), col("source"),
      size(ws).cast("long").as("toks"),
      GraftFunctions.md5PrefixLong(col("doc_id").cast("string"), 8).as("hk"))
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    t.withColumn("cum", sum(col("toks")).over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("toks")).as("tokens_total"),
        sum(when(col("cum") <= capTokens, 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("cum") <= capTokens, col("toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Split census: per (split, lang) document and token counts. */
  def splitCensus(documents: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    splitAssign(documents, trainPct, valPct)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("docs"), sum(size(ws).cast("long")).as("tokens"))
      .orderBy(col("split"), col("lang"))

  /**
   * Grouping-sets corpus census: doc/token masses for every combination of
   * (split, lang) INCLUDING subtotals and the grand total (CUBE — one
   * shuffle, Spark expands the grouping sets map-side). The grouping NULLs
   * are replaced by '(all)' markers so ordering and cross-engine hashing
   * never depend on NULL-sort conventions (Spark sorts NULLS FIRST, DuckDB
   * NULLS LAST; neither `split` nor `lang` is otherwise nullable here).
   */
  def cubeCensus(documents: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    splitAssign(documents, trainPct, valPct)
      .cube(col("split"), col("lang"))
      .agg(count(lit(1)).as("docs"), sum(size(ws).cast("long")).as("tokens"))
      .select(
        coalesce(col("split"), lit("(all)")).as("split"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("docs"), col("tokens"))
      .orderBy(col("split"), col("lang"))

  /**
   * PIVOT census: sources as rows, languages as columns, doc counts in the
   * cells — the wide-format coverage report a curation dashboard reads.
   * The language domain is an explicit argument: pinning the pivot values
   * keeps the output schema static (no extra distinct-values job, no
   * column set that drifts with the data — at 100 TB a stray lang value
   * must not reshape the report), and the pivot itself is then a single
   * groupBy(source) aggregate with one CASE-gated count per pinned lang,
   * map-side partials included. Absent (source, lang) cells are 0, never
   * NULL.
   */
  def langPivotCensus(
      documents: DataFrame,
      langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")): DataFrame = {
    val pivoted = documents
      .groupBy(col("source"))
      .pivot("lang", langs)
      .agg(count(lit(1)))
    pivoted
      .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy(col("source"))
  }

  // ------------------------------------------------------ sequence packing

  /**
   * Token-budget sequence packing: documents are laid out in doc_id order
   * and each is assigned to the pack where its first token lands —
   * pack_id = (exclusive running token total) div `budget`. The
   * deterministic, order-preserving packing a pretraining loader uses to
   * cut a corpus into ~budget-token shards.
   *
   * The running total is [[WindowOps.runningTotal]] — the two-pass
   * distributed prefix sum (per-bucket partials → O(#buckets) driver
   * offsets → intra-bucket windows), NOT a single-partition global window,
   * so the layout scales with the corpus. `bucketWidth` doc_ids per prefix
   * bucket bounds the widest window any task sees.
   *
   * Output: one row per document — doc_id, lang, toks, pack_id.
   */
  def seqPack(documents: DataFrame, budget: Long, bucketWidth: Long = 4096L,
      tokens: Column = size(ws)): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    val toks = documents.select(col("doc_id"), col("lang"), tokens.as("toks"))
    WindowOps.runningTotal(
        toks,
        bucket = (col("doc_id") / bucketWidth).cast("long"),
        orderCols = Seq(col("doc_id")),
        valueCol = col("toks"),
        resultName = "cum")
      .select(col("doc_id"), col("lang"), col("toks"),
        // integer DIV of the exclusive prefix (both longs) — exact at any
        // corpus size, no double rounding
        expr(s"(cum - toks) DIV ${budget}L").as("pack_id"))
  }

  /**
   * x129: padding-waste census of the ONE-DOC-PER-SEQUENCE layout (the
   * SFT/instruction-tuning shape, where examples must not share a context
   * window): each document occupies `ceil(toks/seqLen)` sequences padded
   * to `seqLen`, and the census reports per language what that padding
   * costs — the number every team weighs against [[chunkPackCensus]]'s
   * split-doc count when choosing a layout. Closed form per document
   * (no ordering, no windows): one scan, one aggregation, exact integers
   * throughout (`util_permille` is one integral division at the end).
   */
  def padWasteCensus(documents: DataFrame, seqLen: Long = 128L): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive: $seqLen")
    documents
      .select(col("lang"), size(ws).cast("long").as("toks"))
      .withColumn("seqs", expr(s"(toks + ${seqLen - 1}L) DIV ${seqLen}L"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("toks")).as("tokens"),
        sum(col("seqs")).as("seqs"),
        (sum(col("seqs")) * lit(seqLen) - sum(col("toks"))).as("pad_tokens"))
      .withColumn("util_permille",
        expr(s"(1000L * tokens) DIV (seqs * ${seqLen}L)"))
      .orderBy(col("lang"))
  }

  /**
   * Packing census: per-pack document and token counts. Every pack except
   * possibly the first of a run holds ≥ budget − maxDocTokens + 1 and
   * ≤ budget + maxDocTokens − 1 tokens (a document is never split), so the
   * census doubles as a shard-balance audit.
   */
  def seqPackCensus(documents: DataFrame, budget: Long,
      tokens: Column = size(ws)): DataFrame =
    seqPack(documents, budget, tokens = tokens)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("docs"), sum(col("toks").cast("long")).as("tokens"))
      .orderBy(col("pack_id"))

  /**
   * Concat-and-cut packing census — the GPT-style pretraining layout
   * [[seqPack]] deliberately avoids: the corpus token stream (doc_id
   * order) is cut into fixed `seqLen` context windows, documents
   * crossing a cut boundary are SPLIT across sequences. The census
   * reports, per language, how many documents that layout splits
   * (`crossing_docs`) — the attention-mask/document-boundary economics a
   * context-length choice is judged by (a doc fully inside one window
   * trains with clean causal attention; a split doc leaks context across
   * sequence resets unless masked).
   *
   * Scale shape: the global token offsets come from the same two-pass
   * distributed prefix sum as [[seqPack]] (no single-partition window);
   * the boundary test per doc is two integer divisions on its exclusive
   * start and inclusive end offsets. One aggregation, exact integers.
   */
  def chunkPackCensus(
      documents: DataFrame, seqLen: Long = 2048L,
      bucketWidth: Long = 4096L): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive: $seqLen")
    val toks = documents.select(col("doc_id"), col("lang"), size(ws).as("toks"))
    WindowOps.runningTotal(
        toks,
        bucket = (col("doc_id") / bucketWidth).cast("long"),
        orderCols = Seq(col("doc_id")),
        valueCol = col("toks"),
        resultName = "cum")
      .select(col("lang"), col("toks").cast("long").as("toks"),
        (col("cum") - col("toks")).as("s0"), (col("cum") - 1L).as("e0"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("toks")).as("tokens"),
        sum(when(expr(s"(s0 DIV ${seqLen}L) != (e0 DIV ${seqLen}L)"), 1L)
          .otherwise(0L)).as("crossing_docs"))
      .orderBy(col("lang"))
  }

  /**
   * Split-leakage audit: the per-language contamination census of the TRAIN
   * split against the held-out TEST split — [[splitAssign]] composed with
   * [[CurationOps.decontaminateAgainst]]. A train doc is leaked when it
   * shares ≥ `minShared` distinct word-3-gram shingles with any test doc;
   * run it after every corpus append (the split is append-stable, the
   * leakage is not). Scale shape is decontamination's: the test-split
   * shingle set broadcasts (an eval-sized split; widen to a shuffled join
   * for a giant one), the train side streams once.
   */
  def splitLeakage(
      documents: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10,
      minShared: Int = 5): DataFrame = {
    val assigned = splitAssign(documents, trainPct, valPct)
    CurationOps.decontaminateAgainst(
      assigned.filter(col("split") === "train"),
      assigned.filter(col("split") === "test"),
      minShared)
  }

  /**
   * Deterministic stratified sample: the `perGroup` documents with the
   * smallest (md5-hash, doc_id) per `groupCol` value — a fixed-size,
   * RNG-free per-stratum sample (eval slices, labeling batches, per-language
   * probes). Unlike rate-based sampling ([[CurationOps.tokenBudgetMix]])
   * the output size is exact per group; unlike `ORDER BY rand()` it is
   * reproducible on any cluster and stable under partitioning.
   *
   * Scale shape: one row_number window PARTITIONED BY the stratum (strata
   * hash-distribute; no global sort, no single-partition window). All
   * input columns pass through.
   */
  def stratifiedSample(
      documents: DataFrame,
      perGroup: Int,
      groupCol: String = "lang"): DataFrame = {
    require(perGroup > 0, s"perGroup must be positive: $perGroup")
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(documents.sparkSession)
    val h = GraftFunctions.md5PrefixLong(col("doc_id").cast("string"), 8)
    documents
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(h, col("doc_id"))))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
  }

  /** Stratified-sample census: per-group kept docs and token mass. */
  def stratifiedSampleCensus(
      documents: DataFrame,
      perGroup: Int,
      groupCol: String = "lang"): DataFrame =
    stratifiedSample(documents, perGroup, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("docs"), sum(size(ws).cast("long")).as("tokens"))
      .orderBy(col(groupCol))

  // ------------------------------------------------------------ vocabulary

  /**
   * Corpus vocabulary census: the `k` tokens with the highest document
   * frequency (ties: total frequency desc, then token asc). One explode →
   * one groupBy(word) with map-side partials → top-k via orderBy+limit
   * (`TakeOrderedAndProject`: per-partition heaps, no global sort) — the
   * classic word-count shape, scale-bounded by vocabulary size, not corpus
   * size.
   */
  def vocabTopK(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(ws).as("word"), col("doc_id"))
      .groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("word").asc)
      .limit(k)
}
