package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Materialize.NarrowSyntax

/** Text-analysis operators for large-scale document pipelines: tokenization,
  * per-document stats, quality scoring, n-gram language ID, fingerprinting,
  * TF-IDF. All pure column expressions (whole-stage codegen'd / higher-order
  * functions, no UDFs) so they scan-scale linearly — each is a single narrow
  * pass over `documents` except TF-IDF, which needs one shuffle for document
  * frequencies.
  */
object Text {

  /** Whitespace tokens with empties dropped (texts can carry trailing
    * separators).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish pre-tokenization over lowercased text: maximal runs of letters,
    * digits, or other non-space characters — the split a byte-pair encoder
    * performs before merges. The pattern is shared verbatim with the DuckDB
    * oracle, so it is restricted to syntax Java regex and RE2 agree on (no
    * lookaround, no \p classes).
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePattern), lit(0))

  // ------------------------------------------------- merge-table BPE tokenizer

  /** Default merge-rule table for the merge-table BPE tokenizer: pair →
    * rank = list position (lower merges first). Tiny by design — the gate
    * needs a table the DuckDB oracle can re-derive; a production tokenizer's
    * 50k-rule table broadcasts through the identical plan. Chosen to
    * exercise the hard paths: chained merges (`t+h`, then `th+e`; `i+n`,
    * then `in+g`) and a self-pair (`e+e`) whose occurrences OVERLAP (the
    * leftmost-nonoverlapping scan is where naive implementations drift).
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
    ("e", "r"), ("o", "n"), ("e", "e"), ("s", "t"), ("in", "g"))

  /** Greedy BPE over one word: start from characters; repeatedly select the
    * applicable pair with the LOWEST rank and merge all its leftmost-
    * nonoverlapping occurrences; stop when no rule applies — the standard
    * Sennrich/HF tokenizer semantics, so counts line up with a production
    * tokenizer given its merge table. Ranks must be unique (they are list
    * positions); occurrence testing uses rank equality, mirroring the
    * oracle's `rnk = min(rnk) OVER word` formulation exactly.
    */
  private[ops] def bpeApply(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = word.iterator.map(_.toString).toVector
    var go = syms.length > 1
    while (go) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) go = false
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        go = syms.length > 1
      }
    }
    syms
  }

  /** Vocabulary-level BPE: tokenize each DISTINCT pre-token once —
    * `(word, toks, n_toks)`. This is the production shape (HF tokenizers
    * cache per-word results the same way): the merge loop runs |vocab|
    * times, not once per corpus occurrence, and the corpus-sized side only
    * ever does an equality join against this table. The loop itself is
    * genuinely sequential per word (each merge depends on the previous), so
    * it is JVM code over a typed Dataset — the mapPartitions-as-last-resort
    * case the mandate carves out.
    */
  def bpeMergeVocab(
      df: DataFrame,
      merges: Seq[(String, String)] = DefaultMerges,
      textCol: String = "text"): DataFrame = {
    require(merges.distinct.size == merges.size, s"duplicate merge rule in $merges")
    val spark = df.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    df.select(explode(bpeTokens(col(textCol))).as("word")).distinct()
      .as[String]
      .mapPartitions(_.map { w =>
        val t = bpeApply(w, rank)
        (w, t, t.length.toLong)
      })
      .toDF("word", "toks", "n_toks")
  }

  /** Per-document merged-token counts `(id, n_tokens_bpe)`: pre-token
    * stream joined against the vocabulary tokenization, summed per doc;
    * docs with no pre-tokens count 0. The REAL budget counter for
    * [[packCountsByBudget]] — whitespace/pre-token counts drift from any
    * production tokenizer's counts, this one matches the merge table.
    */
  def bpeMergeTokenCounts(
      df: DataFrame,
      merges: Seq[(String, String)] = DefaultMerges,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val vocab = bpeMergeVocab(df, merges, textCol)
    val perDoc = df.select(col(idCol), explode(bpeTokens(col(textCol))).as("word"))
      .join(vocab, "word")
      .groupBy(col(idCol))
      .agg(sum(col("n_toks")).as("__n"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n"), lit(0L)).as("n_tokens_bpe"))
  }

  /** Corpus-wide top-k merged tokens `(token, n)` — pre-token occurrence
    * counts (vocab-sized aggregate) × per-word token lists, so the corpus
    * text is scanned twice (vocab + counts) and never carried through the
    * merge loop.
    */
  def bpeMergeTopTokens(
      df: DataFrame,
      k: Int,
      merges: Seq[(String, String)] = DefaultMerges,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vocab = bpeMergeVocab(df, merges, textCol)
    df.select(explode(bpeTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
      .join(vocab, "word")
      .select(explode(col("toks")).as("token"), col("n_occ"))
      .groupBy(col("token")).agg(sum(col("n_occ")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** Per-document BPE-ish token stats: pre-token count and chars-per-token
    * "fertility" (the cost estimate LLM pipelines budget by). One narrow
    * projection, no shuffle.
    */
  def bpeTokenStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // The pre-token count comes from the codegen'd byte-class run counter
    // (same counts as size([[bpeTokens]]) — pinned by TextExpressionsSpec —
    // without the regex engine that dominated this scan's cost). Two selects
    // so the kernel evaluates once: chars_per_token reads the aliased n_bpe.
    df.select(
      col(idCol),
      org.apache.spark.sql.graftfns.TextFunctions.bpeRunCount(col(textCol)).as("n_bpe"),
      size(tokens(col(textCol))).cast("long").as("n_ws"),
      length(col(textCol)).cast("double").as("__len"))
      .select(
        col(idCol), col("n_bpe"), col("n_ws"),
        round(col("__len") / greatest(col("n_bpe"), lit(1L)).cast("double"), 4)
          .as("chars_per_token"))

  /** Per-document token statistics: count, distinct count, mean token length.
    * One narrow projection — no shuffle.
    */
  def tokenStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ts = tokens(col(textCol))
    // Counts surface as long: the oracle engine's list len() is BIGINT and the
    // driver's hash compare is type-sensitive.
    df.select(
      col(idCol),
      size(ts).cast("long").as("n_tokens"),
      size(array_distinct(ts)).cast("long").as("n_unique"),
      round(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(size(ts), lit(1)).cast("double"),
        4).as("avg_token_len"))
  }

  /** Stopword lists for the n-gram/stopword language-ID heuristic. Tiny by
    * design: language ID at 100 TB must stay a codegen'd expression; a real
    * model would be a broadcast dictionary joined the same way.
    */
  val StopEn: Seq[String] = Seq("the", "of", "and", "to", "in", "is", "that", "it", "a", "for")
  val StopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "del")
  val StopFr: Seq[String] = Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est")
  val StopDe: Seq[String] = Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "dem", "ein")

  private def hits(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => array_contains(lit(words.toArray), t)))

  /** Heuristic language ID: count stopword hits per language, take the argmax
    * with a fixed preference order (en > es > fr > de), `und` when nothing
    * hits. Deterministic, SQL-expressible (same CASE chain drives the oracle).
    *
    * The four hit counts come from ONE codegen'd byte pass
    * ([[org.apache.spark.sql.graftfns.StopHits]], built from the same
    * Stop* lists) instead of four interpreted `filter(array_contains)`
    * traversals — whole-stage codegen's subexpression elimination evaluates
    * the kernel once per row across the CASE chain's references
    * (TextExpressionsSpec pins count equality with the HOF formulation).
    */
  def langId(text: Column): Column = {
    val h = org.apache.spark.sql.graftfns.TextFunctions.stopHits(text)
    val (en, es, fr, de) =
      (element_at(h, 1), element_at(h, 2), element_at(h, 3), element_at(h, 4))
    when(greatest(en, es, fr, de) === 0, lit("und"))
      .when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  /** [[langId]] as a broadcast-dictionary join — the shape a real language
    * model's word list takes at 100 TB (a 10⁵-word dictionary can't be a
    * literal in a codegen'd CASE chain; a broadcast hash join streams the
    * token explosion past it with no shuffle of the corpus). Same outputs as
    * [[langId]]: per-language stopword hit counts (duplicates counted) and
    * the same argmax preference chain.
    *
    * The shuffle carries only (doc, lang) hit counts — map-side partial
    * aggregation collapses the token explosion before it moves.
    */
  def langIdByJoin(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = (StopEn.map((_, "en")) ++ StopEs.map((_, "es")) ++
      StopFr.map((_, "fr")) ++ StopDe.map((_, "de"))).toDF("w", "lang")
    val toks = df.select(col(idCol).as("id"), explode(tokens(lower(col(textCol)))).as("w"))
    val hits = toks.join(broadcast(dict), "w")
      .groupBy(col("id"))
      .pivot("lang", Seq("en", "es", "fr", "de"))
      .agg(count(lit(1)))
    // Name-based using-join on the renamed key: an exprId condition is
    // ambiguous when the caller's idCol is literally "id" (both sides would
    // expose it), and `hits` shares `df`'s lineage anyway.
    df.select(col(idCol))
      .join(hits.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .na.fill(0L, Seq("en", "es", "fr", "de"))
      .select(col(idCol),
        when(greatest(col("en"), col("es"), col("fr"), col("de")) === 0, lit("und"))
          .when(col("en") >= col("es") && col("en") >= col("fr") && col("en") >= col("de"), lit("en"))
          .when(col("es") >= col("fr") && col("es") >= col("de"), lit("es"))
          .when(col("fr") >= col("de"), lit("fr"))
          .otherwise(lit("de")).as("pred_lang"))
  }

  /** Gopher-style RULE battery (Rae et al. 2021, "Scaling Language Models",
    * table A1) — the hard per-document gates web pretraining pipelines run
    * BEFORE any model-based scoring: word-count bounds, mean-word-length
    * band, a minimum of distinct common stopwords, and the repetition rule
    * (fraction of bigram slots taken by the single most frequent bigram).
    * Unlike [[qualityScore]]'s soft blend, each rule is a named boolean and
    * `keep` is their conjunction — the auditable form: a dropped document
    * tells you WHICH rule fired.
    *
    * Scale shape: every rule — including the repetition rule — is computed
    * ROW-LOCALLY over the token array, so the whole battery is a shuffle-free
    * projection pipeline that prunes the scan to (id, text). The token and
    * bigram arrays MATERIALIZE through staged selects before anything
    * consumes them twice: Catalyst re-evaluates an expression per reference
    * when projections collapse, and re-building the bigram array inside a
    * per-distinct-gram lambda is O(distinct·n²) string constructions per row
    * — measured 295 s over 5 000 sf0.1 docs before the split. (CollapseProject
    * keeps the stages: it only inlines cheap or singly-referenced
    * expressions.) The top-bigram count itself is the longest equal-run of
    * the SORTED gram array — an O(n log n) row-local fold, replacing the
    * O(distinct·n) count-per-distinct scan. Thresholds are Gopher's, except
    * the repetition bound tightened 0.18 → 0.08 for this corpus's narrow
    * synthetic vocabulary (at 0.18 the rule would never fire here — an
    * untested rule is a broken rule).
    */
  def gopherQuality(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minDistinctStops: Int = 2,
      maxTopBigramFrac: Double = 0.08): DataFrame = {
    val ts = col("__gq_ts")
    val n = size(ts)
    // sequence(0, n-2) DESCENDS when n < 2 (Spark generates start-to-stop in
    // either direction) — the guard is load-bearing, not defensive.
    val gramsExpr = when(n < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), n - 2),
        i => concat(get(ts, i), lit(" "), get(ts, i + 1))))
    val grams = col("__gq_grams")
    val meanLen = aggregate(ts, lit(0L), (a, t) => a + length(t)).cast("double") /
      greatest(n, lit(1)).cast("double")
    val nStops = size(array_intersect(array_distinct(ts),
      array(StopEn.map(lit): _*)))
    // Longest equal-run over the sorted grams; run/best thread through one
    // struct accumulator. Sorting is the whole cost: O(n log n) row-local.
    val topBigram = aggregate(
      array_sort(grams),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val topBigramFrac = topBigram.cast("double") /
      greatest(size(grams), lit(1)).cast("double")
    df.select(col(idCol), tokens(lower(col(textCol))).as("__gq_ts"))
      .select(col(idCol), ts, gramsExpr.as("__gq_grams"))
      .select(
        col(idCol),
        n.cast("long").as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        nStops.cast("long").as("n_stop_distinct"),
        round(topBigramFrac, 4).as("top_bigram_frac"),
        (n.between(minWords, maxWords) &&
          meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
          nStops >= minDistinctStops &&
          topBigramFrac <= maxTopBigramFrac).as("keep"))
  }

  /** Heuristic quality score in [0, 1] from token count, stopword ratio and
    * punctuation ratio — the standard cheap pre-filter shape for LLM training
    * data. Deterministic arithmetic so the DuckDB oracle reproduces it bit-for
    * bit (modulo round-4).
    */
  def qualityScore(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lowered = lower(col(textCol))
    val ts = tokens(lowered)
    val n = size(ts).cast("double")
    val stopRatio = hits(ts, StopEn).cast("double") / greatest(n, lit(1.0))
    val punct = (length(lowered) - length(regexp_replace(lowered, "[^a-z0-9 ]", ""))).cast("double")
    val punctRatio = punct / greatest(length(lowered), lit(1)).cast("double")
    val score = least(lit(1.0), greatest(lit(0.0),
      lit(0.2) + lit(1.5) * stopRatio - lit(2.0) * punctRatio + lit(0.02) * n))
    df.select(
      col(idCol),
      size(ts).cast("long").as("n_tokens"),
      round(stopRatio, 4).as("stop_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(score, 4).as("quality"))
  }

  /** Whitespace-run pattern for [[normalize]] — the class is spelled out
    * because Java's `\s` includes `\x0B` (vertical tab) where RE2's does
    * not; an explicit class means the same thing to the oracle engine.
    */
  val WhitespaceRun = "[ \\t\\n\\r\\f]+"

  /** Canonical text form — the pre-dedup normalizer (lowercase, collapse
    * internal whitespace runs to one space, trim): byte-identical inputs
    * for [[fingerprint]]/[[Dedup.exact]] when sources differ only in
    * casing or whitespace layout. One codegen'd projection, no shuffle.
    */
  def normalize(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      trim(lower(regexp_replace(col(textCol), WhitespaceRun, " "))).as("norm_text"))

  /** Keep documents whose [[qualityScore]] falls inside the corpus's own
    * `[loQuantile, hiQuantile]` band — the actual FILTERING step behind
    * quality scoring (drop the bottom tail as junk, optionally the top as
    * boilerplate/templates, which in web corpora dominates the extreme
    * high-stopword-ratio end). Quantiles are EXACT (`percentile`, the
    * holistic aggregate — interpolation matches the oracle engine's
    * `quantile_cont`, proven by the `value_quantiles_by_type` gate) and
    * stay IN-PLAN as a broadcast 1-row bound, so construction runs zero
    * driver jobs; at 100 TB swap `percentile_approx` in for the exact
    * holistic sort at one line's change. Output: `(idCol, quality)` of the
    * survivors.
    */
  def filterByQualityBand(
      df: DataFrame,
      loQuantile: Double,
      hiQuantile: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(0.0 <= loQuantile && loQuantile <= hiQuantile && hiQuantile <= 1.0,
      s"need 0 <= lo <= hi <= 1, got [$loQuantile, $hiQuantile]")
    // The scored relation feeds BOTH the bounds aggregate and the filter —
    // un-materialized, the text-scoring scan runs twice (measured 9.5× at
    // 10× data; ~2× of that was the double pass). The checkpointed frame
    // is the narrow (id, quality) projection, never the text.
    val scored = qualityScore(df, idCol, textCol).select(col(idCol), col("quality"))
      .narrowCheckpointIfSmall() // row-per-document — size-gated (r22)
    val bounds = scored.agg(
      percentile(col("quality"), lit(loQuantile)).as("__qlo"),
      percentile(col("quality"), lit(hiQuantile)).as("__qhi"))
    scored.crossJoin(broadcast(bounds))
      .filter(col("quality") >= col("__qlo") && col("quality") <= col("__qhi"))
      .select(col(idCol), col("quality"))
  }

  /** Unigram-LM document scoring — the perplexity quality filter of web
    * pretraining pipelines (Wenzek et al. 2020, "CCNet": rank crawl text by
    * LM perplexity and keep the head/middle). A token→count table trained
    * on `refDf` (add-`alpha` smoothing over the reference vocabulary)
    * scores every document of `df` by its mean token negative
    * log-likelihood, and the corpus is banded head/middle/tail at exact
    * NLL tertiles. Scale shape: the LM join is an equality SHUFFLE on
    * token — the vocabulary is never broadcast or collected (web-scale
    * vocabularies are shuffle-sized, not driver-sized); the smoothing
    * denominator rides as a broadcast 1-row frame; tertile thresholds stay
    * in-plan via the same holistic `percentile` ≡ `quantile_cont`
    * equivalence the `value_quantiles_by_type` gate proves (swap
    * `percentile_approx` in at 100 TB at one line's change). Determinism:
    * per-token NLLs are rounded to 6 dp and summed as decimals, so the
    * per-doc mean cannot wobble with aggregation order. Token-less
    * documents drop out with the explode, by contract. Reference tokens
    * unseen at scoring time (when `refDf` ≠ `df`) take the `alpha`
    * numerator.
    */
  def lmQualityBands(
      df: DataFrame,
      refDf: DataFrame,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    def toks(d: DataFrame) =
      d.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
    // Materialized once (optimization r21): the LM count table feeds the
    // smoothing totals AND the scoring join — un-cut, the reference corpus
    // re-tokenized once per consumer. Vocabulary-sized (one row per
    // distinct token), distributed blocks — never collected.
    val lm = toks(refDf).groupBy(col("token")).agg(count(lit(1)).as("__cnt"))
      .narrowCheckpoint()
    val tot = lm.agg(sum(col("__cnt")).cast("double").as("__tot"),
      count(lit(1)).cast("double").as("__v"))
    val perTok = toks(df)
      .join(lm, Seq("token"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        round(-log((coalesce(col("__cnt"), lit(0L)).cast("double") + lit(alpha)) /
            (col("__tot") + lit(alpha) * (col("__v") + lit(1.0)))), 6)
          .cast("decimal(20,6)").as("__nll6"))
    // The mean stays UNROUNDED: its inputs are bit-identical cross-engine
    // (exact decimal sum → correctly-rounded double cast → one IEEE
    // divide), so the raw double hash-matches — whereas round(x, 4) is the
    // one step where engines can SPLIT: Spark rounds the double's exact
    // binary expansion while DuckDB rounds a 10⁴-scaled double, and a mean
    // sitting within a scaled ulp of the .00005 boundary flips (observed at
    // sf0.1: 3.3945 vs 3.3946 on one of 5 000 documents). Rounding here
    // would *reduce* determinism, not add it.
    // Materialized once: feeds the tertile aggregate AND the banding
    // projection — un-cut, the whole scoring pipeline (tokenize + LM join)
    // executed twice. Row-per-document, three narrow columns.
    val docs = perTok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__nll6")).cast("double") / count(lit(1)).cast("double"))
          .as("nll"))
      .narrowCheckpointIfSmall() // row-per-document — size-gated (r22)
    val th = docs.agg(
      percentile(col("nll"), lit(1.0 / 3)).as("__t1"),
      percentile(col("nll"), lit(2.0 / 3)).as("__t2"))
    docs.crossJoin(broadcast(th))
      .select(col(idCol), col("n_tokens"), col("nll"),
        when(col("nll") <= col("__t1"), lit("head"))
          .when(col("nll") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("band"))
  }

  /** Count-trained linear quality classifier — the DISCRIMINATIVE filter of
    * web-pretraining pipelines (GPT-3's LR-against-curated quality filter,
    * DCLM's fastText classifier): each document scored by the mean
    * per-token log-odds of positive-vs-negative class membership, with the
    * weights trained IN-PLAN by counting. The weight for token `t` is the
    * multinomial-NB log-odds estimate
    * `log((c⁺(t)+α)/(N⁺+α(V+1))) − log((c⁻(t)+α)/(N⁻+α(V+1)))` — exactly a
    * linear text classifier, chosen over SGD-trained logistic weights
    * because count-based training is a deterministic aggregate the DuckDB
    * oracle re-derives end-to-end (an iterative fit would put the model
    * outside the correctness gate entirely). `posPred` labels the training
    * classes from the corpus itself — the curated-vs-crawl recipe, e.g.
    * `col("source").isin(curated: _*)`; rows where it evaluates NULL train
    * neither class.
    *
    * Scale shape: class counts and scoring are token-keyed equality
    * SHUFFLES (the vocabulary is never broadcast or collected — the
    * [[lmQualityBands]] discipline); the normalizer totals ride as a
    * broadcast 1-row frame. Determinism: per-token log-odds rounded to
    * 6 dp and summed as decimals; the per-doc mean emitted UNROUNDED (its
    * inputs are an exact decimal sum and one IEEE divide — rounding the
    * mean is the cross-engine .00005-boundary hazard, see
    * [[lmQualityBands]]). Output: `(idCol, n_tokens, score,
    * pred_pos: int)` — `pred_pos = 1` iff score ≥ 0, the NB decision rule.
    */
  def nbQualityScore(
      df: DataFrame,
      posPred: Column,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val toks = df.select(col(idCol), posPred.as("__pos"),
      explode(tokens(lower(col(textCol)))).as("token"))
    // Materialized once (lmQualityBands note): the class-count table feeds
    // the normalizer totals AND the weight projection — un-cut, the corpus
    // re-tokenized and re-aggregated once per consumer. Vocabulary-sized.
    val cls = toks.groupBy(col("token")).agg(
      count(when(col("__pos"), lit(1))).as("__cp"),
      count(when(!col("__pos"), lit(1))).as("__cn"))
      .narrowCheckpoint()
    val tot = cls.agg(
      sum(col("__cp")).cast("double").as("__np"),
      sum(col("__cn")).cast("double").as("__nn"),
      count(lit(1)).cast("double").as("__v"))
    val w = cls.crossJoin(broadcast(tot))
      .select(col("token"),
        round(
          log((col("__cp").cast("double") + lit(alpha)) /
              (col("__np") + lit(alpha) * (col("__v") + lit(1.0)))) -
          log((col("__cn").cast("double") + lit(alpha)) /
              (col("__nn") + lit(alpha) * (col("__v") + lit(1.0)))), 6)
          .cast("decimal(20,6)").as("__w"))
    toks.join(w, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__w")).cast("double") / count(lit(1)).cast("double"))
          .as("score"))
      .select(col(idCol), col("n_tokens"), col("score"),
        when(col("score") >= 0, lit(1)).otherwise(lit(0)).as("pred_pos"))
  }

  /** Content fingerprint: md5 of the normalized text — the exact-dedup /
    * provenance key. md5 is available verbatim in the oracle engine, making
    * this the one hash the DuckDB gate can check.
    */
  def fingerprint(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol), md5(lower(trim(col(textCol)))).as("fp"))

  /** Rolling 31-bit polynomial fingerprint over tokens (order-sensitive,
    * unlike the md5 of the raw string it tolerates whitespace differences):
    * FNV-1a-64 per token folded as (acc·31 + (h mod 2³¹)) mod 2³¹, in one
    * codegen'd byte pass ([[org.apache.spark.sql.graftfns.RollingFp]]).
    * FNV is plain integer arithmetic, so the DuckDB oracle re-derives it
    * exactly (the xxhash64 HOF this replaces had no oracle — and ANSI mode
    * made its wrapping arithmetic fragile).
    */
  def rollingFingerprint(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      org.apache.spark.sql.graftfns.TextFunctions.rollingFp(col(textCol)).as("rolling_fp"))

  /** Token-budget document packing — the concat-then-chunk shape LLM
    * training pipelines use: documents are laid out in `orderCol` order and
    * the concatenation is split into fixed `budget`-token chunks; each
    * document starts in pack `floor(excl / budget)` at offset
    * `excl mod budget`, where `excl` is the exclusive running token count
    * before it. Built on [[Windowed.runningSumStitched]] — the distributed
    * two-pass prefix sum, so the global order costs a range exchange, never
    * a single-partition window. (Documents longer than `budget` span packs;
    * the chunker downstream splits them — this operator's contract is the
    * deterministic layout, not truncation.)
    */
  def packByBudget(
      df: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // localCheckpoint: the stitched prefix sum consumes its input THREE
    // times (range-boundary sampling, per-partition totals, the final
    // stitched window) — materializing the two-long-column counted frame
    // once keeps the text scan + tokenize from re-running per consumer.
    // The checkpoint is row-per-doc, orders of magnitude narrower than the
    // corpus it summarizes.
    packCountsByBudget(
      df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
        .narrowCheckpoint(),
      budget, idCol, "n_tokens")

  /** [[packByBudget]] over a caller-supplied count column — the hook that
    * lets packing run on REAL tokenizer counts ([[bpeMergeTokenCounts]])
    * instead of whitespace counts. `counted` = `(idCol, countCol)` rows.
    */
  def packCountsByBudget(
      counted: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      countCol: String = "n_tokens"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    Windowed.runningSumStitched(counted, Seq(idCol), countCol, "__cum")
      .withColumn("__excl", (col("__cum") - col(countCol)).cast("long"))
      .select(
        col(idCol), col(countCol),
        floor(col("__excl") / lit(budget.toDouble)).cast("long").as("pack_id"),
        pmod(col("__excl"), lit(budget)).as("pack_offset"))
  }

  /** Corpus-level TF-IDF: sum over documents of tf(term, doc) · ln(N / df(term)),
    * top `k` terms. Per-document term counts are row-local facts, so the
    * [[org.apache.spark.sql.graftfns.TermCounts]] kernel folds them inside
    * the scan (one hash map per document, no explode of raw occurrences) and
    * the per-term corpus rollup is the plan's ONLY aggregation — its partial
    * phase carries one row per distinct term per partition. `idCol` is
    * retained for signature stability; document identity is the row itself.
    */
  def tfidfTopTerms(df: DataFrame, k: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Corpus size N for IDF stays INSIDE the plan: a 1-row broadcast
    // cross-joined onto the per-term rollup. An eager df.count() here would
    // scan the corpus at plan-construction time (even if the result is never
    // executed) and a second time at execution.
    val corpusN = df.agg(count(lit(1)).cast("double").as("__n"))
    // score(term) = Σ_doc tf · ln(N/df) = ln(N/df) · Σ_doc tf, since df is
    // constant per term — one multiply after the rollup instead of a join.
    df.select(explode(org.apache.spark.sql.graftfns.TextFunctions
        .termCounts(col(textCol))).as("tc"))
      .groupBy(col("tc.term").as("term"))
      .agg(count(lit(1)).as("df"), sum(col("tc.tf")).as("tf_sum"))
      .crossJoin(broadcast(corpusN))
      .select(
        col("term"),
        col("df"),
        round(col("tf_sum").cast("double") * log(col("__n") / col("df").cast("double")), 4)
          .as("tfidf"))
      .orderBy(col("tfidf").desc, col("term"))
      .limit(k)
  }

  /** Per-source token-distribution divergence: KL(source ‖ corpus) over
    * unigram distributions — the mixture-drift statistic for training-data
    * curation ("which source's language is furthest from the blend", the
    * aggregate twin of [[lmQualityBands]]'s per-document NLL). KL to the
    * corpus is always finite (every source term is a corpus term —
    * support(p_s) ⊆ support(p_c) — so no smoothing constant to pick).
    *
    * Scale shape: ONE tokenize/explode pass → (source, term) counts (the
    * groupBy partial-aggregates map-side, so the shuffle carries distinct
    * (source, term) pairs per partition, not occurrences); the corpus term
    * counts, per-source totals, and the grand total all derive from that
    * frame — the corpus is never re-scanned. The per-source and grand
    * totals are source-cardinality rows, broadcast back.
    *
    * Determinism: each term's contribution `p_s·ln(p_s/p_c)` is rounded to
    * 10 dp and summed as DECIMAL(30,10) — the repo's exact-sum lattice —
    * so the result is independent of partial-aggregation order and
    * re-derivable by the oracle with identical parenthesization.
    *
    * Output per source: (`source`, `n_tokens`, `n_terms`, `kl`).
    */
  def tokenDivergence(
      df: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // Materialized once (optimization r21): the (source, term) count table
    // has FOUR consumers (blend counts, per-source totals, the global
    // total, and the contribution join) — un-cut, the corpus tokenized and
    // aggregated four times. Vocabulary×sources-sized.
    val st = df.select(col(sourceCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(sourceCol), col("term"))
      .agg(count(lit(1)).as("__c_st"))
      .narrowCheckpoint()
    val ct = st.groupBy(col("term")).agg(sum(col("__c_st")).as("__c_t"))
    val ns = st.groupBy(col(sourceCol))
      .agg(sum(col("__c_st")).as("__n_s"), count(lit(1)).as("__n_terms"))
    val n = st.agg(sum(col("__c_st")).as("__n_tot"))
    val ps = col("__c_st") / col("__n_s")
    val pc = col("__c_t") / col("__n_tot")
    st.join(ct, "term")
      .join(broadcast(ns), sourceCol)
      .crossJoin(broadcast(n))
      .select(col(sourceCol), col("__n_s"), col("__n_terms"),
        round(ps * log(ps / pc), 10).cast("decimal(30,10)").as("__t"))
      .groupBy(col(sourceCol), col("__n_s"), col("__n_terms"))
      .agg(round(sum(col("__t")).cast("double"), 4).as("kl"))
      .select(col(sourceCol), col("__n_s").as("n_tokens"),
        col("__n_terms").as("n_terms"), col("kl"))
      .orderBy(col(sourceCol))
  }

  /** EXACT corpus-wide heavy hitters: every whitespace token whose count is
    * at least `total_tokens / phiDen`, via the two-pass Misra-Gries
    * discipline (Misra & Gries 1982; MAD sketches survey). Pass 1 runs a
    * `phiDen`-counter summary per partition with NO shuffle — a token with
    * global count ≥ N/phiDen must hit count ≥ N_p/phiDen in at least one
    * partition (pigeonhole over Σ), and Misra-Gries keeps every token
    * exceeding N_p/(phiDen+1), so the unioned candidate set is a guaranteed
    * superset of the answer. Pass 2 exact-counts ONLY the candidates (the
    * token stream is semi-joined against them before the groupBy), then
    * filters by the in-plan total. Output is exact, but the shuffle carries
    * at most `phiDen · numPartitions` candidate keys instead of the full
    * vocabulary — the 100 TB shape for "which terms dominate the corpus"
    * when the vocabulary itself is shuffle-hostile. The candidate set is
    * broadcast (bounded by phiDen·P pre-dedup, far less after — heavy
    * tokens repeat across partitions); if P·phiDen ever outgrew a
    * broadcast, the same plan holds with a shuffle semi-join. The corpus is
    * scanned twice by construction (summary pass + verify pass) plus once
    * for the total; all three scans prune to the text column.
    */
  def heavyHitters(df: DataFrame, phiDen: Int, textCol: String = "text"): DataFrame = {
    require(phiDen >= 2, s"phiDen must be >= 2, got $phiDen")
    val toks = df.select(explode(tokens(col(textCol))).as("term"))
    val cand = toks
      .select(col("term"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, java.lang.Long](phiDen * 2)
        it.foreach { t =>
          val cur = m.get(t)
          if (cur != null) m.put(t, cur + 1L)
          else if (m.size < phiDen) m.put(t, 1L)
          else {
            val e = m.entrySet().iterator()
            while (e.hasNext) {
              val x = e.next()
              if (x.getValue == 1L) e.remove() else x.setValue(x.getValue - 1L)
            }
          }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(m.keySet().iterator()).asScala
      }(org.apache.spark.sql.Encoders.STRING)
      .toDF("term")
      .distinct()
    val total = toks.agg(count(lit(1)).as("__n_total"))
    toks
      .join(broadcast(cand), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(phiDen.toLong) >= col("__n_total"))
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Top-k token n-grams by corpus frequency — the language-model corpus
    * statistic (bigram/trigram tables, contamination shingles, vocabulary
    * induction). Grams are built per document with an index-sequence
    * `transform` (no self-join of token positions), exploded, and counted:
    * the groupBy partial-aggregates map-side, so the shuffle carries one row
    * per DISTINCT gram per partition, not one per occurrence; the top-k is
    * `orderBy + limit` = TakeOrderedAndProject (per-partition heaps), never
    * a global sort of the gram table.
    */
  def ngramCounts(df: DataFrame, n: Int, k: Int, textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(wordGrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  /** Word n-gram array over a TEXT column, WITH duplicates and in document
    * order; empty for documents shorter than `n` tokens. One codegen'd byte
    * pass ([[org.apache.spark.sql.graftfns.WordGrams]]) — the declarative
    * `transform(sequence)+slice+concat_ws` chain computes the same grams but
    * interpreted per element (TextExpressionsSpec pins the equivalence; it
    * dominated n-gram counting wall-clock). Shared by [[ngramCounts]] and
    * [[Dedup.shingles]].
    */
  private[ops] def wordGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftfns.TextFunctions.wordGrams(text, n)

  /** Redaction patterns — restricted (like [[BpePattern]]) to syntax Java
    * regex and RE2 agree on: no lookaround, no \\p classes, no backrefs, so
    * the DuckDB oracle applies the IDENTICAL pattern.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitPattern = "[0-9]{7,}"

  /** PII scrubbing: emails → `<EMAIL>` then long digit runs (≥ 7: phone /
    * account / card shapes) → `<NUMBER>`, with per-pattern match counts off
    * the ORIGINAL text — the audit trail a scrub pass reports. Order
    * matters and is part of the contract: the email pass also consumes
    * digit runs inside addresses, so `n_numbers` counts only runs that
    * survive it. One narrow projection, no shuffle, no UDFs — regex
    * replace/extract are codegen'd string expressions, so this scan-scales
    * like the other per-document ops. A production deny-list beyond these
    * two shapes is a `patterns` table driving the same fold.
    */
  def redact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val emailed = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    df.select(
      col(idCol),
      regexp_replace(emailed, LongDigitPattern, "<NUMBER>").as("redacted"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(emailed, lit(LongDigitPattern), lit(0)))
        .cast("long").as("n_numbers"))
  }

  /** Substring-level repeated-span detection (the Lee et al. 2021
    * "Deduplicating Training Data" shape, at n-gram granularity): every
    * position where a document carries an n-gram that occurs in ≥ `minDf`
    * DISTINCT documents — the spans a scrubbing pass would excise, as
    * opposed to [[Dedup]]'s whole-document verdicts. Output one row per
    * occurrence: `(idCol, pos, gram, df)` with `pos` the 0-based token index
    * the gram starts at.
    *
    * Shape at 100 TB: grams are built per document in one codegen'd pass
    * (no position self-join), the document-frequency aggregate partial-
    * aggregates map-side (the shuffle carries distinct grams per partition),
    * and the join back is candidate-by-equality against the `minDf`-filtered
    * hot-gram table only — never an all-pairs pass. For the 50-gram spans of
    * the paper, key the aggregate on a rolling hash ([[rollingFingerprint]]'s
    * kernel) instead of the gram text to keep shuffle rows fixed-width.
    */
  def repeatedNgramSpans(
      df: DataFrame,
      n: Int,
      minDf: Long,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2 (a span repeats across documents), got $minDf")
    val grams = df.select(
      col(idCol),
      posexplode(wordGrams(col(textCol), n)).as(Seq("pos", "gram")))
    val hot = grams
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf)
    grams
      .join(hot, "gram")
      .select(col(idCol), col("pos").cast("long").as("pos"), col("gram"), col("df"))
  }

  /** N-gram-level train/eval contamination (the GPT-3 appendix-C shape,
    * generalizing the exact-fingerprint `contamination_check` gate): for
    * every training document, how many of its n-gram occurrences also
    * appear anywhere in the eval set — `(idCol, n_grams, n_overlap,
    * overlap_ratio)`, zero-filled for clean documents. Scrub (or flag)
    * training docs whose ratio exceeds policy.
    *
    * The eval side is collapsed to DISTINCT grams and broadcast — an eval
    * benchmark is benchmark-sized next to a training corpus, so the corpus
    * never shuffles; it streams past the broadcast set with map-side
    * partial aggregation. For an eval set beyond broadcast reach, the same
    * counts compose from [[Joins.bloomSemiJoin]] (probe pruned before an
    * exact shuffle join) at one extra stage.
    */
  def ngramContamination(
      train: DataFrame,
      evalDf: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val evalGrams = evalDf
      .select(explode(wordGrams(col(textCol), n)).as("gram"))
      .distinct()
    val perDoc = train
      .select(col(idCol), explode(wordGrams(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
    train
      .select(col(idCol), size(wordGrams(col(textCol), n)).cast("long").as("n_grams"))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol), col("n_grams"),
        coalesce(col("__hits"), lit(0L)).as("n_overlap"),
        round(
          coalesce(col("__hits"), lit(0L)).cast("double") /
            greatest(col("n_grams"), lit(1L)).cast("double"),
          4).as("overlap_ratio"))
  }
}
