package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge (via the org.apache.spark.sql.graft
  * shim — Spark 4 scopes its conversion helpers private[sql]) plus the
  * user-facing Column builders for graft's native expressions. */
package object functions {

  def toColumn(e: Expression): Column = org.apache.spark.sql.graft.bridge.column(e)
  def toExpr(c: Column): Expression = org.apache.spark.sql.graft.bridge.expression(c)

  /** Distinct word n-gram shingles of a text column. */
  def word_shingles(text: Column, n: Int): Column =
    toColumn(ShinglesExpr(toExpr(text), n, charGrams = false))

  /** Distinct character n-gram shingles. */
  def char_shingles(text: Column, n: Int): Column =
    toColumn(ShinglesExpr(toExpr(text), n, charGrams = true))

  /** MinHash signature (array<long>, length k) of a shingle-array column. */
  def minhash_signature(shingles: Column, k: Int): Column =
    toColumn(MinHashSigExpr(toExpr(shingles), k))

  /** LSH band hashes of a minhash signature. */
  def band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toColumn(BandHashesExpr(toExpr(sig), bands, rowsPerBand))

  /** 64-bit SimHash of a text column. */
  def simhash64(text: Column): Column = toColumn(SimHash64Expr(toExpr(text)))

  /** Training-window chunks of a text column (array<string>). */
  def chunk_texts(text: Column, maxTokens: Int, overlap: Int = 0): Column =
    toColumn(ChunksExpr(toExpr(text), maxTokens, overlap))

  /** Bottom-k rolling fingerprint (sorted array<long>). */
  def rolling_fingerprint(text: Column, shingleSize: Int, k: Int): Column =
    toColumn(RollingFingerprintExpr(toExpr(text), shingleSize, k))

  /** Stopword-set language ID (argmax, ties to earliest language). */
  def lang_id(text: Column, markers: Seq[(String, Seq[String])]): Column =
    toColumn(LangIdExpr(toExpr(text), markers))

  /** Fast `can this string cast to bigint` (no exception churn). */
  def long_castable(c: Column): Column = toColumn(LongCastableExpr(toExpr(c)))

  /** One-pass text statistics struct<len,tokens,alpha,punct,w7_12,w13>. */
  def text_stats(text: Column): Column = toColumn(TextStatsExpr(toExpr(text)))

  /** One-pass repetition counters
    * struct<n_lines,n_distinct_lines,n_words,n_distinct_words>. */
  def dup_stats(text: Column): Column = toColumn(DupStatsExpr(toExpr(text)))

  /** One-pass token-run collapse struct<clean,total,kept>. */
  def collapse_runs(text: Column): Column = toColumn(CollapseRunsExpr(toExpr(text)))

  /** Exact Jaccard of two distinct-element string arrays (one-pass). */
  def jaccard_sim(a: Column, b: Column): Column =
    toColumn(JaccardSimExpr(toExpr(a), toExpr(b)))

  /** Exact Jaccard of two SORTED distinct-element string arrays (merge
    * walk, no per-pair allocation) — hoist the sort to the doc side. */
  def jaccard_sim_sorted(a: Column, b: Column): Column =
    toColumn(JaccardSortedExpr(toExpr(a), toExpr(b)))

  /** PPJoin prefix of a shingle array under the (df, hash, shingle) order. */
  def prefix_shingles(shingles: Column, hotDf: Map[String, Long],
      cap: Long, minJaccard: Double): Column =
    toColumn(PrefixShinglesExpr(toExpr(shingles), hotDf, cap, minJaccard))

  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpr(a), toExpr(b)))

  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpr(a), toExpr(b)))

  def euclidean_dist(a: Column, b: Column): Column =
    toColumn(EuclideanDistExpr(toExpr(a), toExpr(b)))

  def hyperplane_sig(v: Column, planes: Seq[Seq[Double]]): Column =
    toColumn(HyperplaneSigExpr(toExpr(v), planes))

  def nearest_cells(v: Column, centroids: Seq[(Long, Seq[Double])], nprobe: Int): Column =
    toColumn(NearestCellsExpr(toExpr(v), centroids, nprobe))

  /** Exact greedy-merge BPE token count (see [[Bpe]]); the default merge
    * vocabulary unless one is given (load model vocabs via
    * [[Bpe.Vocab.fromFile]] and pass `v.mergeSurfaces`). */
  def bpe_token_count(text: Column,
      merges: Seq[(String, String)] = Bpe.Vocab.default.mergeSurfaces): Column =
    toColumn(BpeCountExpr(toExpr(text), merges))

  /** The BPE token surfaces (array<string>) — inspection face of
    * [[bpe_token_count]]. */
  def bpe_tokens(text: Column,
      merges: Seq[(String, String)] = Bpe.Vocab.default.mergeSurfaces): Column =
    toColumn(BpeTokensExpr(toExpr(text), merges))

  /** Symmetric int8 quantization: array<float|double> → struct<scale, q>. */
  def quantize_vec(v: Column): Column = toColumn(QuantizeExpr(toExpr(v)))

  /** struct<scale, q> → array<float>. */
  def dequantize_vec(q: Column): Column = toColumn(DequantizeExpr(toExpr(q)))

  /** Cosine over two quantized structs (scales cancel; int arithmetic). */
  def cosine_sim_q(a: Column, b: Column): Column =
    toColumn(CosineSimQExpr(toExpr(a), toExpr(b)))
}
