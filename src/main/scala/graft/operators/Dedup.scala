package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All stages are pure Catalyst expression pipelines (no UDFs): shingling,
  * MinHash signatures and LSH banding are `transform`/`array_min`/`xxhash64`
  * compositions that run inside whole-stage codegen. The only shuffles are
  * the LSH bucket-join (on band hashes — payload is (id, band) pairs, never
  * documents) and the final candidate verification join, which is why the
  * pipeline survives a 100× scale-up: candidate generation is linear in
  * corpus size, quadratic only within an LSH bucket.
  */
object Dedup {

  /** "Broadcast the side that fits" gate, decided from Catalyst plan
    * STATISTICS (no job): true when the optimized-plan size estimate of `df`
    * is inside the session's broadcast threshold. The near-dup pipelines use
    * it to pick join strategy per corpus: a small corpus broadcasts its
    * doc/prefix side (zero exchanges on the candidate and verification
    * joins), a warehouse-scale corpus keeps the shuffle-hash shape whose
    * scale reasoning is documented at each site. The estimate is the scan's
    * file size (conservative: compressed bytes underestimate the in-memory
    * arrays, so the factor-of-a-few blow-up of shingle arrays still lands
    * well inside executor memory at a 10 MB source threshold). */
  private[graft] def fitsBroadcast(df: DataFrame): Boolean = {
    val thr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760") match {
      case s if s.toLowerCase.endsWith("mb") => s.dropRight(2).trim.toLong << 20
      case s if s.toLowerCase.endsWith("kb") => s.dropRight(2).trim.toLong << 10
      case s if s.toLowerCase.endsWith("gb") => s.dropRight(2).trim.toLong << 30
      case s if s.toLowerCase.endsWith("b")  => s.dropRight(1).trim.toLong
      case s => s.trim.toLong
    }
    thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)
  }

  /** Apply the adaptive strategy to a verification/docs side: broadcast when
    * the corpus fits, otherwise the documented shuffle-hash hint. */
  private def sideHint(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df.hint("shuffle_hash")

  /** Small-corpus parallelism fix: a corpus under the broadcast threshold is
    * typically one or two input splits, so every derived stage — shingling,
    * the candidate join, verification — would run as a SINGLE task while the
    * rest of the cluster idles (and AQE coalesces the tiny-byte shuffles to
    * one partition even though the per-row verification work is heavy).
    * Spreading it across `defaultParallelism` costs one exchange of a corpus
    * that fits in a broadcast — noise — and parallelizes the whole pipeline.
    * At warehouse scale `small` is false and no exchange is added. */
  private def spread(df: DataFrame, small: Boolean): DataFrame =
    if (small) df.repartition(df.sparkSession.sparkContext.defaultParallelism) else df

  /** Distinct candidate pairs, kept parallel for verification. At scale the
    * classic `distinct()` (partial agg → exchange → final agg) dedupes
    * before the shuffle — every shared shingle/band emits one candidate
    * occurrence, so map-side combine is what bounds the exchange. On a
    * small corpus those occurrences are byte-noise and each exchange is
    * pure latency: repartition BY THE PAIR KEY and let the dedupe ride that
    * same exchange (the aggregate's clustering requirement is already
    * satisfied → one exchange, one stage, same rows), which also replaces
    * the round-robin spread — diverse pair keys spread just as evenly. */
  private def distinctPairs(cands: DataFrame, left: String, right: String,
      small: Boolean): DataFrame =
    if (small)
      cands.repartition(cands.sparkSession.sparkContext.defaultParallelism,
        col(left), col(right)).dropDuplicates(Seq(left, right))
    else cands.distinct()

  // ------------------------------------------------------------- shingling
  // Native expressions (graft.functions) — the higher-order-function
  // formulation (`transform`+`slice`+`concat_ws`) is interpreted per element
  // in Spark and measured ~70x slower; semantics are identical and pinned by
  // the DuckDB oracle on q_ngram_dups_docs.

  /** Distinct word n-gram shingles of `text`. */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.word_shingles(text, n)

  /** Distinct character n-gram shingles (robust for CJK / no-whitespace). */
  def charShingles(text: Column, n: Int): Column =
    graft.functions.char_shingles(text, n)

  // ---------------------------------------------------------- exact dedup

  /** Exact duplicate groups by content hash: (text_hash, dup_count) with
    * count > 1. Hash-groupBy shuffles only (hash, 1) pairs, map-side
    * combined — the canonical exact-dedup plan at any scale. */
  def exactDuplicateGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Keep one row per distinct text (first by `orderCol` — deterministic). */
  def dedupExact(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------- MinHash

  /** MinHash signature of a shingle array: k permutations via the two-hash
    * affine scheme (native expression — one pass over the shingles, 2 string
    * hashes each). Returns array<long> of length `numHashes`; null when the
    * doc has no usable shingles. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.minhash_signature(shingles, numHashes)

  /** LSH band hashes: signature split into `bands` bands of `rowsPerBand`,
    * each band hashed to one long. Two docs sharing ANY band hash become a
    * candidate pair; with b bands of r rows the match probability is the
    * classic 1-(1-s^r)^b S-curve over true Jaccard s. */
  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.band_hashes(signature, bands, rowsPerBand)

  /** The (id, shingles) frame every near-dup pipeline starts from, spread
    * for small corpora like the operators themselves do. Exposed so a
    * caller running SEVERAL pipelines over one corpus (the certification
    * queries run MinHash AND the exact PPJoin) can shingle once: cache the
    * result and hand it to the `*FromShingles` variants. */
  def shingleDocs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, charGrams: Boolean = false): DataFrame = {
    val sh = if (charGrams) charShingles(col(textCol), shingleSize)
             else wordShingles(col(textCol), shingleSize)
    spread(df, fitsBroadcast(df)).select(col(idCol).as("id"), sh.as("shingles"))
  }

  /** End-to-end MinHash+LSH near-duplicate pairs.
    *
    * Plan shape: shingle+sign (narrow, codegen) → posexplode bands →
    * self-join on (band_idx, band_hash) = the LSH bucket join → distinct
    * candidate (a,b) pairs → exact-Jaccard verification join against the
    * shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= minJaccard.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      minJaccard: Double = 0.5, charGrams: Boolean = false,
      scope: CacheScope = CacheScope.ambient): DataFrame =
    minHashLshPairsFromShingles(
      shingleDocs(df, idCol, textCol, shingleSize, charGrams),
      numHashes, bands, minJaccard, fitsBroadcast(df), scope)

  /** [[minHashLshPairs]] over a PRE-SHINGLED (id, shingles) frame — the
    * caller owns shingling (and should cache the frame when several
    * pipelines share it). `small` is the broadcast-strategy gate the caller
    * evaluated on the source corpus. */
  def minHashLshPairsFromShingles(
      shingled: DataFrame, numHashes: Int, bands: Int,
      minJaccard: Double, small: Boolean,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val rowsPerBand = numHashes / bands
    // the signature "index" feeds the band join (both sides) and the
    // verification join (both sides) — under an active CacheScope it is
    // persisted once instead of re-shingling up to 4x, and the scope owner
    // releases the blocks (see CacheScope contract). At warehouse scale this
    // table is what you'd materialize to storage once per corpus snapshot.
    val docs = scope.cache(shingled
      .filter(col("shingles").isNotNull && size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes)))

    val banded = docs.select(col("id"),
      posexplode(bandHashes(col("sig"), bands, rowsPerBand)).as(Seq("band_idx", "band_hash")))

    val a = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_b"))
    // small corpus: broadcast the build side of the band self-join — the
    // bucket join and its two exchanges vanish (fitsBroadcast gate above);
    // spread(candidates) keeps verification parallel (AQE would coalesce
    // the byte-small pair set to one task despite its per-row cost)
    val candidates = distinctPairs(
      a.join(if (small) broadcast(b) else b, Seq("band_idx", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b"), "id_a", "id_b", small)

    // sorted once per DOC so verification pays a merge walk per pair, not
    // a hash-set build (see JaccardSortedExpr)
    val shA = docs.select(col("id").as("id_a"), sort_array(col("shingles")).as("sh_a"))
    val shB = docs.select(col("id").as("id_b"), sort_array(col("shingles")).as("sh_b"))
    // verification joins carry the full shingle arrays — broadcast when the
    // corpus fits (guide's "broadcast the side that fits": no exchange at
    // all), else shuffle-hash, not sort-merge: sorting array payloads costs
    // more than hashing the doc side, and the per-partition doc slice
    // always fits an executor (the referential large-dim reasoning)
    candidates.join(sideHint(shA, small), "id_a")
      .join(sideHint(shB, small), "id_b")
      .withColumn("jaccard", graft.functions.jaccard_sim_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------ exact n-gram Jaccard

  /** Exact all-pairs n-gram Jaccard with PPJoin-style prefix filtering
    * (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW 2008).
    *
    * Candidate generation indexes only each document's PREFIX — its
    * |A| − ⌈t·|A|⌉ + 1 first shingles under the global
    * (known-df, hash, shingle) order computed per row by
    * [[graft.functions.PrefixShinglesExpr]]. Any pair with true Jaccard ≥ t
    * must share a prefix shingle, so the result is EXACT while the inverted
    * index shrinks ~2× at t=0.5, and because HOT shingles (the only ones
    * whose df is collected) sort last, stop-shingle buckets vanish from the
    * self-join — the Σ|bucket|² blow-up the naive index suffers at scale.
    * A length filter (t ≤ |A|/|B| ≤ 1/t) prunes candidates further;
    * survivors are verified with the exact Jaccard over the full shingle
    * arrays.
    *
    * `maxShingleDf` (0 = off) additionally drops shingles with document
    * frequency above the cap from the index — a belt-and-braces guard for
    * adversarial corpora. With the cap on, a pair sharing ONLY above-cap
    * shingles is missed, so results are exact only for pairs below it
    * (route such corpora to [[minHashLshPairs]]). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minJaccard: Double = 0.5,
      maxShingleDf: Long = 0L, hotDfThreshold: Long = 64L,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    // the shingle-set "index" feeds the hot-shingle pass, the prefix build
    // and the verification join (both sides); persisted only under an
    // active CacheScope, whose owner releases the blocks
    val small = fitsBroadcast(df)
    ngramJaccardPairsFromShingles(
      scope.cache(spread(df, small)
        .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("shingles"))),
      minJaccard, maxShingleDf, hotDfThreshold, small, scope)
  }

  /** [[ngramJaccardPairs]] over a PRE-SHINGLED (id, shingles) frame the
    * caller already CACHED (it feeds the hot-shingle pass, the prefix build
    * and both verification sides) — lets a certification query share one
    * shingle scan with the MinHash pipeline. `small` is the caller's
    * broadcast-strategy gate for the source corpus. */
  def ngramJaccardPairsFromShingles(
      docs: DataFrame, minJaccard: Double,
      maxShingleDf: Long, hotDfThreshold: Long, small: Boolean,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    // ONE map-side-combined groupBy finds the hot shingles; only they need a
    // real df for the prefix order (everything colder sorts by hash), so the
    // collected map is tiny and ships as a plan constant — no df-join-back,
    // no per-doc window, no extra index shuffle. The pass runs
    // UNCONDITIONALLY: its cost is one linear scan of the shingle mass the
    // pipeline already materializes (map-side combine collapses it to
    // distinct shingles), always cheaper than the quadratic bucket a single
    // stop-shingle would otherwise build — earlier doc-count/mass gates
    // each left a corpus-shape window where the bucket blow-up ran anyway.
    // Exactness never depends on the df info (any consistent global order
    // satisfies the prefix theorem); hot ordering is pruning only.
    val hotFloor = if (maxShingleDf > 0) math.min(hotDfThreshold, maxShingleDf) else hotDfThreshold
    // With no hard cap the df info is PRUNING-ONLY (ordering), so it can be
    // ESTIMATED from a deterministic 1/8 doc sample (md5-rank predicate —
    // run/partitioning-invariant): a shingle hot enough to build a
    // quadratic bucket has df ≫ threshold and appears in the sample with
    // tight concentration, while a misclassified marginal shingle only
    // shifts the prefix order. Cuts the heaviest full-corpus scan of the
    // pipeline to 1/8 of the shingle mass. With maxShingleDf set the cap
    // affects which pairs are comparable (documented), so the exact full
    // pass runs.
    val sampled = maxShingleDf == 0
    val dfSource =
      if (sampled)
        docs.filter(substring(md5(col("id").cast("string")), 1, 1).isin("0", "1"))
      else docs
    val dfScale = if (sampled) 8L else 1L
    val hotDf: Map[String, Long] = dfSource
      .select(explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") * dfScale > hotFloor)
      .orderBy(col("df").desc, col("sh"))
      .limit(100000)
      .collect().map(r => r.getString(0) -> r.getLong(1) * dfScale).toMap
    // posexplode: a prefix element's index IS its rank in the doc's full
    // sorted shingle order (the prefix is the head of that order), which
    // enables PPJoin's POSITIONAL filter below. Cached under the scope:
    // BOTH sides of the candidate self-join scan it, and the prefix sort is
    // the pipeline's per-doc hot spot — without the cache each side paid it
    // again (two identical 1.3 s single-task stages in the job probe).
    val prefix = scope.cache(docs.select(col("id"), size(col("shingles")).as("n_sh"),
      posexplode(graft.functions.prefix_shingles(col("shingles"), hotDf, maxShingleDf, minJaccard))
        .as(Seq("pos", "sh"))))
    val a = prefix.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"), col("pos").as("p_a"))
    val b = prefix.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"), col("pos").as("p_b"))
    // Jaccard ≥ t ⟺ |A∩B| ≥ t·(|A|+|B|)/(1+t); the POSITIONAL filter bounds
    // the achievable overlap from the matched element's sorted positions:
    // at the FIRST shared element (i,j) no earlier common elements exist, so
    // |A∩B| ≤ 1 + min(|A|−i−1, |B|−j−1). Filtering every occurrence with
    // this bound and keeping pairs that pass ANY occurrence is exact: the
    // first occurrence carries the loosest (valid) bound, and later
    // occurrences only ever have tighter remainders — a pair is dropped
    // only when its first-occurrence bound already proves Jaccard < t.
    // (Xiao et al., WWW'08, the ppjoin position filter.)
    val requiredOverlap =
      ceil((col("n_a") + col("n_b")) * lit(minJaccard / (1.0 + minJaccard)) - lit(1e-9))
    // spread(candidates): keep verification parallel — AQE coalesces the
    // byte-small distinct pair set to one task despite its per-row cost
    val candidates = distinctPairs(
      a.join(if (small) broadcast(b) else b, "sh")
        .filter(col("id_a") < col("id_b"))
        .filter(col("n_b") >= col("n_a") * lit(minJaccard) - lit(1e-9) &&
          col("n_a") >= col("n_b") * lit(minJaccard) - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - 1 - col("p_a"), col("n_b") - 1 - col("p_b"))
          >= requiredOverlap)
        .select("id_a", "id_b"), "id_a", "id_b", small)
    // sorted once per DOC so verification pays a merge walk per pair, not
    // a hash-set build (see JaccardSortedExpr)
    val shA = docs.select(col("id").as("id_a"), sort_array(col("shingles")).as("sh_a"))
    val shB = docs.select(col("id").as("id_b"), sort_array(col("shingles")).as("sh_b"))
    // verification joins carry the full shingle arrays — broadcast when the
    // corpus fits (fitsBroadcast: no exchange), else shuffle-hash, not
    // sort-merge: sorting array payloads costs more than hashing the doc
    // side, and the per-partition doc slice always fits an executor (the
    // referential large-dim reasoning)
    candidates.join(sideHint(shA, small), "id_a")
      .join(sideHint(shB, small), "id_b")
      .withColumn("jaccard", graft.functions.jaccard_sim_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------- materialized signature index

  /** Build the MinHash signature index as a TABLE: (id, shingles, sig,
    * bands array). At warehouse scale this is written once per corpus
    * snapshot (bucketed by id) and reused by every subsequent dedup run —
    * shingling+signing is the dominant per-doc cost and never needs to run
    * twice for the same snapshot. */
  def buildSignatureIndex(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      charGrams: Boolean = false): DataFrame = {
    val sh = if (charGrams) charShingles(col(textCol), shingleSize)
             else wordShingles(col(textCol), shingleSize)
    // spread: shingle+sign is the dominant per-doc cost — don't run it as
    // one task when the batch is a single small split (identity at scale)
    spread(df, fitsBroadcast(df)).select(col(idCol).as("id"), sh.as("shingles"))
      .filter(col("shingles").isNotNull && size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes))
      .withColumn("bands", bandHashes(col("sig"), bands, numHashes / bands))
  }

  /** Persist a signature index ([[buildSignatureIndex]]) to `dir` in the
    * warehouse-scale layout — the shape a 100 TB ingest pipeline actually
    * reads, written ONCE per corpus snapshot:
    *
    *  - `dir/bands`: the EXPLODED (band_hash, id) pairs, BUCKETED by
    *    band_hash — the incremental candidate join then reads
    *    pre-distributed data and plans NO exchange on the (huge) index
    *    side. band_idx is deliberately dropped from the key: a cross-band
    *    band_hash equality is a 64-bit hash collision (~2⁻⁶⁴), and a false
    *    candidate only costs one exact-Jaccard verification — it can never
    *    produce a wrong pair — while a single-column bucket key is what
    *    makes the at-rest layout line up with the join.
    *  - `dir/docs`: (id, shingles) bucketed by id — the verification join
    *    reads the heavy shingle arrays without shuffling them.
    *  - schema-DDL sidecars + a bucket-count file, so ANY later session
    *    re-declares the external bucketed tables with no metastore (the
    *    external-bucketed-table pattern used by the bench layout,
    *    `bench/TranscriptSuite.scala`).
    */
  def writeSignatureIndex(index: DataFrame, dir: String, buckets: Int = 64): Unit = {
    val spark = index.sparkSession
    val suffix = suffixOf(dir)
    val bands = index
      .select(explode(col("bands")).as("band_hash"), col("id"))
    val docs = index.select(col("id"), col("shingles"))
    spark.sql(s"DROP TABLE IF EXISTS graft_sig_bands_$suffix")
    spark.sql(s"DROP TABLE IF EXISTS graft_sig_docs_$suffix")
    // the two bucketed writes are INDEPENDENT jobs over the same index
    // frame — submitted concurrently so the second doesn't idle behind the
    // first's write tail (overlap independent jobs). Callers that didn't
    // cache `index` would otherwise also serialize two full shingle+sign
    // passes back to back.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val bandsF = Future {
      // repartition on the bucket key first: same murmur3 hash as the bucket
      // spec → one file per bucket, no small-file explosion
      bands.repartition(buckets, col("band_hash"))
        .write.bucketBy(buckets, "band_hash")
        .option("path", s"$dir/bands").mode("overwrite")
        .saveAsTable(s"graft_sig_bands_$suffix")
    }
    val docsF = Future {
      docs.repartition(buckets, col("id"))
        .write.bucketBy(buckets, "id")
        .option("path", s"$dir/docs").mode("overwrite")
        .saveAsTable(s"graft_sig_docs_$suffix")
    }
    Await.result(bandsF, Duration.Inf)
    Await.result(docsF, Duration.Inf)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bands_schema.ddl"), bands.schema.toDDL)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/docs_schema.ddl"), docs.schema.toDDL)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/buckets"), buckets.toString)
  }

  /** Open a stored signature index: (bands, docs) DataFrames over the
    * bucketed files, re-declaring the external tables in this session's
    * catalog when absent. */
  def openSignatureIndex(spark: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) = {
    val suffix = suffixOf(dir)
    val buckets = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/buckets")).trim.toInt
    def declare(table: String, sub: String, ddlFile: String, key: String): Unit =
      if (!spark.catalog.tableExists(table)) {
        val ddl = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/$ddlFile"))
        spark.sql(
          s"""CREATE TABLE $table ($ddl) USING parquet
             |CLUSTERED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$dir/$sub'""".stripMargin)
      }
    declare(s"graft_sig_bands_$suffix", "bands", "bands_schema.ddl", "band_hash")
    declare(s"graft_sig_docs_$suffix", "docs", "docs_schema.ddl", "id")
    (spark.table(s"graft_sig_bands_$suffix"), spark.table(s"graft_sig_docs_$suffix"))
  }

  /** Absorb a new batch into an existing on-disk signature index — the
    * second half of the ingest loop ([[minHashLshPairsAgainstStoredIndex]]
    * detects the batch's near-dups, this makes the batch visible to every
    * FUTURE batch). Appends to the same bucketed tables, repartitioned on
    * the bucket keys first so each append lands one file per bucket (no
    * small-file explosion across ingests). Signature parameters must match
    * the ones the index was built with; ids must stay unique across
    * batches (both are the caller's snapshot contract). */
  def appendToSignatureIndex(
      newDocs: DataFrame, idCol: String, textCol: String, dir: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      charGrams: Boolean = false): Unit =
    appendIndexFrame(buildSignatureIndex(newDocs, idCol, textCol,
      shingleSize, numHashes, bands, charGrams), dir)

  /** [[appendToSignatureIndex]] with a PREBUILT index frame — pairs with
    * [[storedIndexPairs]] so one materialized batch index feeds detect and
    * absorb without re-shingling. */
  def appendIndexFrame(fresh: DataFrame, dir: String): Unit = {
    val spark = fresh.sparkSession
    openSignatureIndex(spark, dir) // declare the tables if this session hasn't
    val buckets = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/buckets")).trim.toInt
    val suffix = suffixOf(dir)
    fresh.select(explode(col("bands")).as("band_hash"), col("id"))
      .repartition(buckets, col("band_hash"))
      .write.mode("append").bucketBy(buckets, "band_hash")
      .option("path", s"$dir/bands")
      .saveAsTable(s"graft_sig_bands_$suffix")
    fresh.select(col("id"), col("shingles"))
      .repartition(buckets, col("id"))
      .write.mode("append").bucketBy(buckets, "id")
      .option("path", s"$dir/docs")
      .saveAsTable(s"graft_sig_docs_$suffix")
  }

  /** Rewrite an appended-to signature index back to ONE file per bucket —
    * the maintenance half of the incremental-ingest lifecycle (seed →
    * detect → absorb → COMPACT): every [[appendIndexFrame]] lands one file
    * per bucket, so after thousands of micro-batches each bucket holds
    * thousands of small files and the candidate join pays a per-file open
    * cost the bucketing was supposed to avoid. Compaction reads each
    * bucketed table, rewrites it (same bucket spec — content-identical by
    * construction) into a staging directory beside the live one, then
    * swaps directories via Hadoop FS rename and refreshes the catalog
    * tables. Same single-writer contract as the ingest ledger: never
    * compact while an ingest query is mid-batch — enforced by refusing
    * when the newest ledger intent lacks its commit marker (a crashed
    * batch's recovery diffs against a PRE-compaction file listing and
    * would classify every compacted file as debris).
    * Returns (dataFilesBefore, dataFilesAfter). */
  def compactSignatureIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Int, Int) = {
    import org.apache.hadoop.fs.{Path => HPath}
    val suffix = suffixOf(dir)
    val buckets = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/buckets")).trim.toInt
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-writer guard: a pending (uncommitted) ingest intent means a
    // crashed batch may still be replayed — its recovery must see the
    // pre-crash files, not a compacted directory
    val ledger = new HPath(root, "_ingest_ledger")
    if (fs.exists(ledger)) {
      val names = fs.listStatus(ledger).map(_.getPath.getName).toSeq.sorted
      val intents = names.filter(_.endsWith(".intent")).map(_.stripSuffix(".intent"))
      intents.lastOption.foreach(last => require(names.contains(s"$last.commit"),
        s"ingest batch $last has an intent but no commit — a crashed ingest " +
          "is pending replay; run (or clean) it before compacting"))
    }
    def countFiles(sub: String): Int = {
      val p = new HPath(root, sub)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) n += 1
        }
        n
      }
    }
    val before = countFiles("bands") + countFiles("docs")
    openSignatureIndex(spark, dir) // ensure the catalog tables exist for the post-swap refresh
    // read the FILES, not the catalog tables: a bucketed-table scan's
    // claimed output partitioning can elide the repartition while its
    // actual task layout spans generations — the plain file scan gives the
    // same aligned one-file-per-bucket write as writeSignatureIndex
    val bands = spark.read.parquet(s"$dir/bands")
    val docs = spark.read.parquet(s"$dir/docs")
    def rewrite(df: DataFrame, key: String, sub: String): Unit = {
      val tmpTable = s"graft_sig_compact_${suffix}_$sub"
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
      // materialize into the staging dir while READING the live one (two
      // distinct paths — never a self-overwrite)
      df.repartition(buckets, col(key))
        .write.bucketBy(buckets, key)
        .option("path", s"$dir/${sub}_compacting").mode("overwrite")
        .saveAsTable(tmpTable)
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable") // external: files remain
    }
    rewrite(bands, "band_hash", "bands")
    rewrite(docs, "id", "docs")
    Seq("bands", "docs").foreach { sub =>
      val live = new HPath(root, sub)
      val staged = new HPath(root, s"${sub}_compacting")
      val retired = new HPath(root, s"${sub}_retired")
      fs.delete(retired, true)
      require(fs.rename(live, retired), s"compaction: cannot retire $live")
      require(fs.rename(staged, live), s"compaction: cannot swap in $staged")
      fs.delete(retired, true)
    }
    // the external tables point at the swapped paths — drop any cached
    // file listings
    spark.catalog.refreshTable(s"graft_sig_bands_$suffix")
    spark.catalog.refreshTable(s"graft_sig_docs_$suffix")
    (before, countFiles("bands") + countFiles("docs"))
  }

  /** Stable name suffix for per-directory/per-input artifacts (catalog
    * tables, temp dirs): two must not collide within a session, and the
    * name must be deterministic across runs (String.hashCode is
    * spec-fixed). Shared by the harness queries for their temp paths. */
  private[graft] def stableSuffix(s: String): String =
    java.lang.Long.toHexString(s.hashCode.toLong & 0xffffffffL)

  private def suffixOf(dir: String): String = stableSuffix(dir)

  /** [[minHashLshPairsAgainstIndex]] against an ON-DISK index written by
    * [[writeSignatureIndex]] — the real incremental-ingest path at scale:
    * only the new batch is shingled and signed; the corpus index stays at
    * rest. The candidate join keys on band_hash alone (see
    * [[writeSignatureIndex]] for why band_idx is droppable), so the bucketed
    * bands table joins WITHOUT an index-side exchange; verification joins
    * the bucketed docs table on id, so the heavy shingle arrays never
    * shuffle either. Returns (id_new, id_index, jaccard), self-pairs
    * excluded. */
  def minHashLshPairsAgainstStoredIndex(
      newDocs: DataFrame, idCol: String, textCol: String,
      indexDir: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      minJaccard: Double = 0.5, charGrams: Boolean = false,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val fresh = scope.cache(buildSignatureIndex(newDocs, idCol, textCol,
      shingleSize, numHashes, bands, charGrams))
    storedIndexPairs(fresh, indexDir, minJaccard)
  }

  /** [[minHashLshPairsAgainstStoredIndex]] with a PREBUILT batch index
    * frame — the caller owns shingling, so one [[buildSignatureIndex]]
    * materialization can feed detect AND absorb explicitly (instead of
    * relying on the cache manager's plan matching to deduplicate two
    * independent builds). */
  def storedIndexPairs(
      fresh: DataFrame, indexDir: String, minJaccard: Double): DataFrame = {
    val (idxBands, idxDocs) = openSignatureIndex(fresh.sparkSession, indexDir)
    val a = fresh.select(explode(col("bands")).as("band_hash"), col("id").as("id_new"))
    val candidates = a
      .join(idxBands.select(col("band_hash"), col("id").as("id_index")), Seq("band_hash"))
      .filter(col("id_new") =!= col("id_index"))
      .select("id_new", "id_index").distinct()
    candidates
      .join(fresh.select(col("id").as("id_new"), sort_array(col("shingles")).as("sh_a")), "id_new")
      .join(idxDocs.select(col("id").as("id_index"), sort_array(col("shingles")).as("sh_b")), "id_index")
      .withColumn("jaccard", graft.functions.jaccard_sim_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_new", "id_index", "jaccard")
  }

  /** Near-dup pairs WITHIN one signature-index frame (band self-join +
    * exact-Jaccard verification) — the intra-batch complement of
    * [[storedIndexPairs]] in an ingest loop: two near-dups arriving in the
    * SAME batch pair here, since neither is in the stored index yet.
    * Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def pairsWithinIndex(index: DataFrame, minJaccard: Double): DataFrame = {
    val small = fitsBroadcast(index)
    val banded = index.select(col("id"), explode(col("bands")).as("band_hash"))
    val a = banded.select(col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band_hash"), col("id").as("id_b"))
    val candidates = a.join(if (small) broadcast(b) else b, Seq("band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(sideHint(index.select(col("id").as("id_a"), sort_array(col("shingles")).as("sh_a")), small), "id_a")
      .join(sideHint(index.select(col("id").as("id_b"), sort_array(col("shingles")).as("sh_b")), small), "id_b")
      .withColumn("jaccard", graft.functions.jaccard_sim_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup pairs of NEW documents against an EXISTING signature index —
    * the incremental-ingest path: only the new docs are shingled; the
    * corpus index is read as-is. Candidates come from the band-bucket join
    * (new × index), verification is the exact Jaccard on shingle arrays.
    * Returns (id_new, id_index, jaccard); a new doc matching nothing is
    * genuinely new. Self-pairs (same id in both sides) are excluded. */
  def minHashLshPairsAgainstIndex(
      newDocs: DataFrame, idCol: String, textCol: String,
      index: DataFrame,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      minJaccard: Double = 0.5, charGrams: Boolean = false,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val fresh = scope.cache(buildSignatureIndex(newDocs, idCol, textCol,
      shingleSize, numHashes, bands, charGrams))
    val a = fresh.select(posexplode(col("bands")).as(Seq("band_idx", "band_hash")),
      col("id").as("id_new"))
    val b = index.select(posexplode(col("bands")).as(Seq("band_idx", "band_hash")),
      col("id").as("id_index"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_new") =!= col("id_index"))
      .select("id_new", "id_index").distinct()
    candidates
      .join(fresh.select(col("id").as("id_new"), sort_array(col("shingles")).as("sh_a")), "id_new")
      .join(index.select(col("id").as("id_index"), sort_array(col("shingles")).as("sh_b")), "id_index")
      .withColumn("jaccard", graft.functions.jaccard_sim_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_new", "id_index", "jaccard")
  }

  // ------------------------------------------- duplicate-cluster grouping

  /** Connected components over a near-duplicate pair list: every document
    * reachable through any chain of pairs lands in one cluster, labeled by
    * the cluster's minimum id. This is the step a production dedup pipeline
    * runs AFTER pair generation — near-duplication is transitive in effect
    * (A≈B≈C must collapse together even when A,C were never compared).
    *
    * Algorithm: min-label propagation with POINTER JUMPING. Each round a
    * node takes the minimum of (its label, its neighbors' labels, and its
    * label's label — the jump), so the minimum spreads ≥2× the distance per
    * round and rounds are O(log diameter), not O(diameter) — the same
    * round bound as large-star/small-star (Kiveris et al., SoCC'14) with
    * simpler per-round plans (two key-only shuffle joins + one count).
    * Every round `localCheckpoint`s the labels: iterative DataFrames grow
    * their logical plan linearly otherwise, which turns Catalyst analysis
    * quadratic — the checkpoint truncates lineage so round N's plan cost
    * equals round 1's. Terminates when a round changes nothing, or at
    * `maxIter` (a safety bound, not a tuning knob).
    *
    * Sizing: a near-dup PAIR list is orders of magnitude smaller than its
    * corpus, so up to `maxDriverEdges` edges the component computation runs
    * as driver-local union-find (one collect, O(E·α) — the iterative
    * dataframe loop would spend seconds of pure job overhead on a graph
    * that fits in one array). Beyond the threshold the distributed
    * pointer-jumping loop below takes over; both paths produce identical
    * labels (asserted in DedupSpec). Ids must be (castable to) long.
    *
    * Input: pairs (id_a, id_b). Output: (id, cluster) for every id present
    * in at least one pair — singletons never enter the edge list and keep
    * themselves as canonical by definition (see [[dedupByClusters]]). */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 30, maxDriverEdges: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // the pair pipeline (often an expensive candidate+verify join chain) is
    // materialized ONCE here and every consumer — the path decision, the
    // driver collect, the distributed edge list — reads the blocks: the
    // former limit-before-collect ran executeTake's incremental partition
    // ramp (1, 4, 16, … = a chain of sequential mini-jobs over the final
    // stage) and the over-threshold path re-executed the whole pipeline for
    // the edge list. Released in the finally.
    val p = pairs.select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // ONE clean parallel count decides the path (no take ramp); the collect
    // below reads the already-materialized blocks. Collected through the
    // TYPED encoder into specialized Tuple2[Long,Long] (32 B/edge with
    // headers — ~32 MB at the default threshold), not boxed Rows. The real
    // driver footprint is the union-find map below: worst case every edge
    // introduces two NEW ids → up to 2·maxDriverEdges boxed HashMap entries
    // ≈ 90 B each ≈ 180 MB at the default — sized for a 4 GB driver with
    // headroom, which is why the threshold is 1M edges (a near-dup pair
    // list this large usually means the thresholds are wrong, not that the
    // corpus has 1M genuine dups).
    if (p.count() <= maxDriverEdges) {
      val head = p.as[(Long, Long)].collect()
      // union-by-min with path compression: the root of every set stays the
      // component minimum because union always attaches the larger root
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.get(x) != x) { parent.put(x, parent.get(parent.get(x))); x = parent.get(x) }
        x
      }
      head.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      import scala.jdk.CollectionConverters._
      return parent.keySet().asScala.toSeq.sorted
        .map(id => (id, find(id))).toDF("id", "cluster")
    }
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster")).as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
      // pointer jump: follow my label to ITS label and take the minimum
      val jump = stepped.select(col("id").as("cluster"), col("cluster").as("jumped"))
      val next = stepped.join(jump, Seq("cluster"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("jumped"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
    } finally p.unpersist(false)
  }

  /** Collapse a corpus by near-duplicate clusters: every doc maps to its
    * cluster's canonical (minimum) id; docs in no pair are their own
    * canonical. Keep rows where `id === canonical_id` to deduplicate. */
  def dedupByClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = connectedComponents(pairs)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: bit i set iff the majority of token
    * hashes have bit i set (native expression, single pass per row). */
  def simHash(text: Column): Column = graft.functions.simhash64(text)

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming.
    * Pigeonhole banding: the 64-bit simhash splits into `maxHamming+1`
    * chunks; any pair within the Hamming radius must agree on at least one
    * full chunk, so candidates are an equi-join on (chunk_idx, chunk_value)
    * — a linear-cost bucket join, verified by `bit_count(xor) <= k`. */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val small = fitsBroadcast(df)
    val docs = spread(df, small).select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val banded = docs.select(col("id"), col("sim"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("sim"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))): _*)).as(Seq("chunk_idx", "chunk_val")))
    val a = banded.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    // small corpus: broadcast the build side — the chunk-bucket join's two
    // exchanges vanish (fitsBroadcast gate; scale keeps the shuffle join)
    a.join(if (small) broadcast(b) else b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine >= threshold. Candidates via
    * random-hyperplane LSH buckets (see [[Similarity.hyperplaneSignature]]),
    * verified with the exact cosine — same candidate-then-verify shape as
    * MinHash, so the all-pairs cross join never materializes. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95,
      planes: Int = 12, seed: Long = 42L): DataFrame = {
    val small = fitsBroadcast(df)
    val docs = spread(df, small).select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.hyperplaneSignature(col("v"), dim, planes, seed))
    val a = docs.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = docs.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    // small corpus: broadcast the build side (fitsBroadcast gate) — the
    // bucket self-join runs exchange-free; scale keeps the shuffle join
    a.join(if (small) broadcast(b) else b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }

  /** SemDeDup-style semantic near-dup pairs: k-means cells as the blocking
    * structure instead of hyperplane buckets (Abbas et al. 2023 — cluster
    * the embedding space, compare only within a cluster). Centroids come
    * from [[Similarity.kMeansCentroids]] (sampled + Lloyd-refined,
    * broadcast constants); the within-cell self-join is an equi-join on
    * `cell`, so the all-pairs structure never materializes and the
    * worst-case candidate count is Σ|cell|². Complements
    * [[embeddingNearDups]]: data-adaptive cells catch dense regions a
    * fixed random-hyperplane grid splits, at the cost of the index build.
    * Pairs split across neighboring cells are missed (recall < 1, like any
    * single-assignment blocking) — [[embeddingNearDups]] with multi-probe
    * or a second seed is the recall complement. */
  def semanticNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      cells: Int = 64, threshold: Double = 0.95, iters: Int = 2): DataFrame = {
    val small = fitsBroadcast(df)
    val centroids = Similarity.kMeansCentroids(df, idCol, vecCol, cells, iters)
    val assigned = Similarity.ivfAssign(spread(df, small), idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("cell"))
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    // small corpus: broadcast the build side (fitsBroadcast gate) — the
    // cell self-join runs exchange-free; scale keeps the shuffle join
    a.join(if (small) broadcast(b) else b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
