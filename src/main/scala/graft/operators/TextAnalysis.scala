package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions — per-row, embarrassingly parallel, no shuffle. */
object TextAnalysis {

  /** One-pass counter struct <len,tokens,alpha,punct,w7_12,w13> — every
    * per-row statistic below derives from it, so a SELECT computing several
    * of them scans the text once (native expression) instead of running one
    * regexp pass per counter (the regex formulations remain the DuckDB
    * oracle and the semantic definition — see TextStatsExpr). */
  def textStats(text: Column): Column = graft.functions.text_stats(text)

  /** Word-token count: runs of letters/digits (≡ regexp_count '[A-Za-z0-9]+'). */
  def tokenCount(text: Column): Column = tokenCountFromStats(textStats(text))

  def tokenCountFromStats(stats: Column): Column =
    coalesce(stats.getField("tokens"), lit(0))

  /** BPE-ish subword token estimate: words + punctuation marks count one
    * each, long words pay ~1 extra token per 6 chars beyond the first 6 —
    * a cheap deterministic proxy for a BPE tokenizer's piece count. */
  def tokenEstimate(text: Column): Column = tokenEstimateFromStats(textStats(text))

  def tokenEstimateFromStats(stats: Column): Column =
    coalesce(
      stats.getField("tokens") + stats.getField("punct") +
        stats.getField("w7_12") + stats.getField("w13") * 2,
      lit(0))

  /** Stopword language-ID heuristic: per-language marker-token hit counts;
    * winner = max count with deterministic tie-break on language order;
    * "und" when nothing matches. Native expression — one tokenize pass per
    * row (the equivalent 5-regex formulation is the DuckDB oracle). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por", "para", "con"),
    "it" -> Seq("il", "la", "che", "di", "non", "per", "una", "sono", "con", "del")
  )

  def langId(text: Column): Column = graft.functions.lang_id(text, langMarkers)

  /** Quality score in [0,1]: weighted blend of length band, alpha ratio,
    * punctuation ratio, mean word length band. Deterministic double
    * arithmetic from integer counts. */
  def qualityScore(text: Column): Column = qualityScoreFromStats(textStats(text))

  def qualityScoreFromStats(stats: Column): Column = {
    val len = stats.getField("len").cast("double")
    val nAlpha = stats.getField("alpha").cast("double")
    val nPunct = stats.getField("punct").cast("double")
    val nWords = greatest(stats.getField("tokens").cast("double"), lit(1.0d))
    val alphaRatio = when(len > 0, nAlpha / len).otherwise(0.0d)
    val punctRatio = when(len > 0, nPunct / len).otherwise(0.0d)
    val meanWordLen = nAlpha / nWords
    val lenScore = when(len >= 20 && len <= 5000, 1.0d)
      .when(len > 0, 0.5d).otherwise(0.0d)
    val wordLenScore = when(meanWordLen >= 2.5d && meanWordLen <= 9.0d, 1.0d).otherwise(0.4d)
    val punctScore = when(punctRatio <= 0.2d, 1.0d).otherwise(0.3d)
    // plain left-assoc double arithmetic (no round()): bit-reproducible by
    // any engine evaluating the same formula over the same integer counts
    lenScore * 0.3d + alphaRatio * 0.3d + wordLenScore * 0.2d + punctScore * 0.2d
  }

  // ------------------------------------------------------- PII detection
  // Conservative patterns written in the regex subset Java and RE2 agree on
  // (no \s — Java includes \x0B, RE2 does not; no lookaround). Regexes ARE
  // the semantic spec here, so these stay regexp_count (codegen'd) rather
  // than a hand-rolled scanner that would have to re-prove each pattern.

  /** Count of email-shaped substrings. */
  def emailCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")), lit(0))

  /** Count of IPv4-shaped substrings. */
  def ipv4Count(text: Column): Column =
    coalesce(regexp_count(text,
      lit("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")), lit(0))

  /** Count of US-SSN-shaped substrings (ddd-dd-dddd). */
  def ssnCount(text: Column): Column =
    coalesce(regexp_count(text, lit("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")), lit(0))

  /** Count of phone-number-shaped substrings (9+ digits with separators). */
  def phoneCount(text: Column): Column =
    coalesce(regexp_count(text, lit("\\+?[0-9][0-9()\\- ]{7,}[0-9]")), lit(0))

  /** Count of URL-shaped substrings (http/https). */
  def urlCount(text: Column): Column =
    coalesce(regexp_count(text, lit("https?://[^\\s]+")), lit(0))

  /** Web-text markup cleaning (the C4/CCNet-style pre-filter step): strip
    * HTML/XML tags, drop URLs, then collapse runs of whitespace to one
    * space and trim — so tag/URL removal can't leave double spaces that
    * would skew the downstream word/line statistics. All three patterns
    * are Java∩RE2-safe, so the DuckDB oracle states the identical
    * pipeline; pure per-row rewrite, no shuffle. */
  def stripMarkup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, lit("<[^>]*>"), lit(" ")),
        lit("https?://[^\\s]+"), lit(" ")),
      lit("\\s+"), lit(" ")))

  /** PII REDACTION: the four detector patterns replaced with typed
    * placeholders — the rewrite step a compliance pipeline actually ships
    * (counts gate, redaction cleans). Application order is part of the
    * contract: SSN before phone, because the phone pattern would otherwise
    * consume ddd-dd-dddd; the DuckDB oracle nests the same replaces in the
    * same order. Pure per-row expression — no shuffle, pushes nothing,
    * scales linearly. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("[EMAIL]")),
          lit("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"), lit("[SSN]")),
        lit("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"), lit("[IP]")),
      lit("\\+?[0-9][0-9()\\- ]{7,}[0-9]"), lit("[PHONE]"))

  /** REPETITION CLEANUP: collapse runs of consecutively repeated tokens
    * ("batch batch batch" → "batch") — the rewrite counterpart of the
    * Gopher-style repetition SIGNALS below (dup fractions gate whole
    * documents; this repairs the elongation/stutter artifacts worth
    * keeping). Whitespace-token runs only: non-adjacent repeats are
    * legitimate prose and stay. Split, keep token i iff it differs from
    * token i−1, rejoin — per-row, shuffle-free; the DuckDB oracle states
    * the identical keep rule via `list_filter`'s (element, index) lambda.
    * Normalizes runs of whitespace to one space (the [[stripMarkup]]
    * convention), trims, and preserves NULL.
    *
    * Runs as ONE native scan ([[graft.functions.CollapseRunsExpr]]) — the
    * struct also carries before/after token counts so "how much was
    * removed" costs no re-split. Two earlier higher-order-function
    * formulations live on as [[collapseTokenRunsSplit]], the semantic pin
    * the native expression is spec-tested against; the first of them,
    * `filter(toks, (t, i) => t =!= element_at(toks, i))`, was O(tokens²)
    * per document — everything inside an HOF lambda re-evaluates PER
    * ELEMENT, so the captured `toks` re-ran the full split for every
    * token (q_collapse_runs_docs: 5.6 s quadratic → 2.2 s linear HOF →
    * native). */
  def collapseRunsStats(text: Column): Column = graft.functions.collapse_runs(text)

  def collapseTokenRuns(text: Column): Column =
    collapseRunsStats(text).getField("clean")

  /** The split/HOF formulation of [[collapseTokenRuns]] — kept as the
    * executable semantic definition (native ≡ split spec, DupStatsExpr
    * convention). The previous-token array is built ONCE per row and
    * zipped against the tokens; dropped positions become NULL and
    * `array_join` omits them. */
  def collapseTokenRunsSplit(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    // prev(i) = toks(i−1), NULL at position 0 (null-safe inequality keeps
    // the first token unconditionally and never collides with a real token)
    val prev = slice(concat(array(lit(null).cast("string")), toks), lit(1), size(toks))
    val kept = zip_with(toks, prev, (t, p) => when(!(t <=> p), t))
    array_join(kept, " ")
  }

  // --------------------------------- repetition signals (Gopher/C4-style)

  /** One-pass repetition counter struct
    * <n_lines, n_distinct_lines, n_words, n_distinct_words> — both fractions
    * below derive from it, so computing them together scans the text once
    * (the split/array_distinct formulations — kept as [[dupLineFractionSplit]]
    * / [[dupWordFractionSplit]] — remain the semantic definition and the
    * DuckDB oracle; Catalyst does not CSE the non-cheap `split`, so each
    * fraction paid two of them). */
  def repetitionStats(text: Column): Column = graft.functions.dup_stats(text)

  private def dupFraction(n: Column, d: Column): Column = {
    val nd = n.cast("double")
    when(nd > 0, (nd - d.cast("double")) / nd).otherwise(0.0d)
  }

  /** Duplicate-line fraction: 1 − distinct/total lines. A document that
    * repeats whole lines (boilerplate, navigation, chat-log echo) scores
    * high — the classic Gopher repetition filter signal. */
  def dupLineFraction(text: Column): Column =
    dupLineFractionFromStats(repetitionStats(text))

  def dupLineFractionFromStats(stats: Column): Column =
    dupFraction(stats.getField("n_lines"), stats.getField("n_distinct_lines"))

  /** Duplicate-word fraction: 1 − distinct/total words. */
  def dupWordFraction(text: Column): Column =
    dupWordFractionFromStats(repetitionStats(text))

  def dupWordFractionFromStats(stats: Column): Column =
    dupFraction(stats.getField("n_words"), stats.getField("n_distinct_words"))

  /** Split-based reference formulation of [[dupLineFraction]] (the DuckDB
    * oracle's shape) — kept for the native≡split equivalence spec. */
  private[graft] def dupLineFractionSplit(text: Column): Column = {
    val ls = split(text, "\n")
    dupFraction(size(ls), size(array_distinct(ls)))
  }

  /** Split-based reference formulation of [[dupWordFraction]]. */
  private[graft] def dupWordFractionSplit(text: Column): Column = {
    val ws = array_remove(split(lower(text), "[^a-z0-9]+"), "")
    dupFraction(size(ws), size(array_distinct(ws)))
  }

  /** Stable content fingerprint: md5 of whitespace/case-normalized text —
    * the exact-dedup key (portable: any engine reproduces it). */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing-style rolling fingerprint: the `k` smallest hash values over
    * character shingles, as a sorted array<long> (native expression). Two
    * documents sharing most fingerprint hashes are near-duplicates;
    * mergeable and fixed-size per doc (bottom-k sketch of the shingle set). */
  def rollingFingerprint(text: Column, shingleSize: Int = 8, k: Int = 16): Column =
    graft.functions.rolling_fingerprint(text, shingleSize, k)

  /** Corpus-level top-k frequent word n-grams by document frequency — the
    * boilerplate DETECTOR (license headers, navigation chrome, and template
    * sentences surface as n-grams shared by many documents). Shingles are
    * distinct per document ([[Dedup.wordShingles]]), so a plain count is the
    * document frequency. Plan: explode → map-side-combined hash count →
    * `TakeOrderedAndProject` (each task keeps k rows; only k×tasks rows ever
    * reach the driver — no global sort at any corpus size). Ties broken by
    * ngram ascending for a deterministic, oracle-comparable result. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(Dedup.wordShingles(col(textCol), n)).as("ngram"))
      .filter(col("ngram") =!= "")
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram").asc)
      .limit(k)

  /** Boilerplate REMOVAL at line granularity (the CCNet/RefinedWeb recipe):
    * drop every line that appears in at least `minDocs` documents, keep the
    * rest in original order. Two passes: (1) per-line document frequency —
    * the (line, doc) pairs are deduplicated BEFORE the count so the shuffle
    * carries one row per distinct pair and the count is a plain map-side-
    * combinable `count(*)`, not a `countDistinct` expand; (2) the hot set
    * (small by construction — every member repeats across ≥ minDocs docs)
    * collapses to ONE array row, broadcast-cross-joined onto the corpus,
    * and each document rewrites ITS OWN line array in place. The rewrite
    * pass therefore shuffles NOTHING — corpus rows never leave their
    * partition (an explode → anti-join → groupBy(doc) formulation would
    * re-shuffle the entire corpus bytes to reassemble documents, which is
    * the difference between a cheap cleanup and a full-corpus exchange at
    * 100 TB). Docs whose every line is boilerplate come out as "" (kept,
    * empty) — same as the SQL list_filter formulation used as the oracle.
    *
    * `maxHotLines` guards the single-row/broadcast ceiling: real boilerplate
    * hot sets are small by construction (every member repeats across ≥
    * minDocs docs), but a pathological corpus — tiny minDocs over
    * template-heavy shards — could blow the 8 GB single-row limit with no
    * graceful error. The guard rides the SAME job (a limit bounds what the
    * one collected row can hold; `raise_error` fires if the capped count
    * exceeds the cap) — no second scan of the line mass. Above the cap,
    * use the anti-join formulation instead (explode → anti-join hot lines →
    * groupBy(doc) reassemble): it re-shuffles the corpus, but has no
    * broadcast ceiling. */
  def stripBoilerplateLines(
      df: DataFrame, idCol: String, textCol: String, minDocs: Long,
      maxHotLines: Int = 100000): DataFrame = {
    require(maxHotLines > 0 && maxHotLines < Int.MaxValue)
    val base = df.filter(col(textCol).isNotNull)
    val hot = base
      .select(col(idCol).as("__id"), explode(split(col(textCol), "\n")).as("__line"))
      .filter(col("__line") =!= "")
      .distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .limit(maxHotLines + 1) // bound the materialized row even when raising
      .agg(collect_list(col("__line")).as("__hot"), count(lit(1)).as("__n"))
      .select(
        when(col("__n") > maxHotLines,
          raise_error(lit(
            s"stripBoilerplateLines: hot-line set exceeds maxHotLines=$maxHotLines — " +
              "minDocs is likely misconfigured for this corpus; raise maxHotLines only if " +
              "the set genuinely fits a broadcast, else use an anti-join formulation")))
          .otherwise(col("__hot")).as("__hot"))
    base
      .crossJoin(broadcast(hot))
      .withColumn(textCol, array_join(
        filter(split(col(textCol), "\n"), l => !array_contains(col("__hot"), l)), "\n"))
      .drop("__hot")
  }

  /** LM-lite fluency signal: per-document fraction of its DISTINCT word
    * bigrams that occur in at least `minDf` documents of the corpus —
    * natural-language text re-uses common word transitions, gibberish and
    * word-soup do not (the cheap stand-in for the KenLM-perplexity filter
    * in C4/CCNet-style pipelines, with integer-derived arithmetic so the
    * score is oracle-reproducible bit-for-bit).
    *
    * Plan shape: shingle once (distinct bigrams per doc — df semantics),
    * one map-side-combined groupBy finds the common set, one semi-join of
    * the exploded bigrams against it, one count per doc. Two shuffles of
    * the bigram mass and one of ids — linear in corpus size; the common
    * set is itself a distributed table (never collected/broadcast: unlike
    * a boilerplate hot set it is NOT small by construction).
    * Output: (idCol, n_bigrams, n_common, coverage) where coverage =
    * n_common / n_bigrams (0.0 when the doc has no bigrams). */
  def bigramCoverage(
      df: DataFrame, idCol: String, textCol: String, minDf: Long = 2L,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val docs = scope.cache(df
      .select(col(idCol), Dedup.wordShingles(col(textCol), 2).as("__bi")))
    val exploded = docs
      .select(col(idCol), explode(col("__bi")).as("__b"))
      .filter(col("__b") =!= "")
    val common = exploded
      .groupBy("__b").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("__b")
    // shuffle-hash on the build side: a semi join never needs sorted
    // inputs, and sort-merge would SORT the exploded corpus bigram mass —
    // the most expensive possible thing to do with it
    val covered = exploded
      .join(common.hint("shuffle_hash"), Seq("__b"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_common"))
    docs
      .select(col(idCol),
        // coalesce: a NULL text shingles to NULL → 0 real bigrams
        coalesce(size(array_remove(col("__bi"), "")), lit(0))
          .cast("long").as("n_bigrams"))
      .join(covered, Seq(idCol), "left")
      .na.fill(0L, Seq("n_common"))
      .select(col(idCol), col("n_bigrams"), col("n_common"),
        when(col("n_bigrams") > 0,
          col("n_common").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(0.0).as("coverage"))
  }

  /** Convenience: attach the full text-analysis column family. The counter
    * struct is projected ONCE (its alias is non-cheap, so CollapseProject
    * will not inline it into each consumer) — one text scan feeds
    * token_count, token_estimate and quality_score. */
  def enrich(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("__stats", textStats(t))
      .withColumn("token_count", tokenCountFromStats(col("__stats")))
      .withColumn("token_estimate", tokenEstimateFromStats(col("__stats")))
      .withColumn("lang_id", langId(t))
      .withColumn("quality_score", qualityScoreFromStats(col("__stats")))
      .withColumn("fingerprint", contentFingerprint(t))
      .drop("__stats")
  }
}
