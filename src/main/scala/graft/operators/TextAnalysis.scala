package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions — per-row, embarrassingly parallel, no shuffle. */
object TextAnalysis {

  /** Word-token count: runs of letters/digits (engine-portable regex). */
  def tokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[A-Za-z0-9]+")), lit(0))

  /** BPE-ish subword token estimate: words + punctuation marks count one
    * each, long words pay ~1 extra token per 6 chars beyond the first 6 —
    * a cheap deterministic proxy for a BPE tokenizer's piece count. */
  def tokenEstimate(text: Column): Column = {
    val words = regexp_count(text, lit("[A-Za-z0-9]+"))
    val punct = regexp_count(text, lit("[^A-Za-z0-9\\s]"))
    val longWordExtra = regexp_count(text, lit("[A-Za-z0-9]{7,12}")) +
      regexp_count(text, lit("[A-Za-z0-9]{13,}")) * 2
    coalesce(words + punct + longWordExtra, lit(0))
  }

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
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nAlpha = regexp_count(text, lit("[A-Za-z]")).cast("double")
    val nPunct = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double")
    val nWords = greatest(tokenCount(text).cast("double"), lit(1.0d))
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

  /** Convenience: attach the full text-analysis column family. */
  def enrich(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("token_count", tokenCount(t))
      .withColumn("token_estimate", tokenEstimate(t))
      .withColumn("lang_id", langId(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("fingerprint", contentFingerprint(t))
  }
}
