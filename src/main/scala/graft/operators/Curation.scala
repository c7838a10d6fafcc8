package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic sampling and
  * token-budget sequence packing.
  *
  * These are the selection/layout steps between "validated, deduplicated
  * corpus" and "training batches". Both are designed for reproducibility
  * first: a curation run over 100 TB must be re-runnable to the same rows
  * regardless of cluster size, partition layout, or Spark version —
  * which rules out `df.sample()` (its RNG is partition-dependent). */
object Curation {

  /** Assemble ordered parts into ONE document per key — the step that
    * renders a transcripts table (conv_id, turn_idx, role, text) into
    * trainable conversation documents ("role: text" lines in turn order,
    * the chat-template shape). One grouped aggregate: `collect_list` of
    * (order, fields) structs, `array_sort` (lexicographic over ALL struct
    * fields — so order ties break by the remaining fields and the result
    * is DETERMINISTIC even with duplicate turn indexes), then a per-row
    * render (NULL fields render as '' with the separator KEPT — 'user: ' —
    * never silently skipped). The shuffled payload is exactly the surviving columns, the
    * aggregate is map-side combined, and under a key-bucketed at-rest
    * layout the whole pipeline plans ZERO exchange. NULL order rows are
    * excluded (completeness owns them); a group's document length is
    * bounded by the conversation, not the table — the transcripts
    * invariant that makes collect_list safe here (a 10^6-turn "conversation"
    * would be a validation failure upstream: see the sequence/row_count
    * rules). */
  def assembleByKey(
      df: DataFrame, keyCol: String, orderCol: String,
      renderCols: Seq[String], fieldSep: String = ": ",
      lineSep: String = "\n"): DataFrame = {
    // positional field aliases: renderCols may repeat the order column (or
    // each other) — by-name extraction on duplicate struct fields would be
    // ambiguous. NULL render fields rendered as '' EXPLICITLY: concat_ws
    // would silently SKIP them ('user' with no separator — ambiguous with a
    // one-field line) where SQL '||' nullifies the whole line — coalesce
    // pins one deterministic, oracle-expressible semantics.
    val fields = (orderCol +: renderCols).zipWithIndex.map {
      case (c, i) => col(c).as(s"_$i")
    }
    df.filter(col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_parts"),
        array_join(
          transform(array_sort(collect_list(struct(fields: _*))),
            x => concat_ws(fieldSep,
              renderCols.indices.map(i =>
                coalesce(x(s"_${i + 1}").cast("string"), lit(""))): _*)),
          lineSep).as("document"))
  }

  /** [[assembleByKey]] with the transcripts schema defaults: one
    * "role: text" line per turn in turn_idx order, one document per
    * conversation. */
  def assembleConversations(df: DataFrame): DataFrame =
    assembleByKey(df, "conv_id", "turn_idx", Seq("role", "text"))

  /** Deterministic hash sample: keep rows whose `md5(key)` leading hex
    * digit falls in the first `sixteenths` of "0123456789abcdef" — a
    * sixteenths/16 sample that is bit-reproducible across engines, runs
    * and repartitionings. Pure per-row predicate: pushes into the scan,
    * no shuffle, no RNG state. */
  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16,
      s"sixteenths must be in [0,16], got $sixteenths")
    val allowed = "0123456789abcdef".take(sixteenths).map(_.toString)
    if (allowed.isEmpty) df.limit(0)
    else df.filter(substring(md5(col(keyCol).cast("string")), 1, 1).isin(allowed: _*))
  }

  /** Stratified deterministic sample: a DIFFERENT sixteenths/16 keep-rate
    * per stratum (e.g. downsample the dominant language, keep the long tail
    * whole — the standard rebalancing step for a training mix). Same
    * md5-rank predicate as [[hashSample]], with the per-stratum threshold
    * selected by a `CASE` chain over `strataCol` — still a pure per-row
    * scan predicate: no shuffle, no RNG state, bit-reproducible across
    * engines and partitionings, and a row keeps/drops identically whether
    * sampled via its stratum's rate here or via [[hashSample]] at that
    * rate. Strata not in `rates` fall back to `defaultSixteenths`. */
  def stratifiedHashSample(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultSixteenths: Int): DataFrame = {
    (rates.values.toSeq :+ defaultSixteenths).foreach(s =>
      require(s >= 0 && s <= 16, s"sixteenths must be in [0,16], got $s"))
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultSixteenths)) { case (acc, (stratum, s)) =>
        when(col(strataCol) === stratum, lit(s)).otherwise(acc)
      }
    val rank = instr(lit("0123456789abcdef"),
      substring(md5(col(keyCol).cast("string")), 1, 1))
    df.filter(rank <= threshold)
  }

  /** Deterministic fixed-size slice: the `n` rows with the smallest
    * `md5(key)` — a pseudo-random but run/engine/partitioning-stable
    * selection (held-out eval sets, spot-check samples). Plans as
    * `TakeOrderedAndProject`: each task keeps n rows, only n×tasks rows
    * reach the driver — no global sort at any scale. */
  def hashTopN(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.withColumn("__hk", md5(col(keyCol).cast("string")))
      .orderBy(col("__hk").asc, col(keyCol).asc)
      .limit(n)
      .drop("__hk")

  /** Deterministic token-budget selection: the documents that come first in
    * md5(key) order, taken while the running token total stays ≤ `budget` —
    * i.e. "a pseudo-random `budget`-token slice of the corpus", the
    * train-mix sizing step (sample N tokens of corpus X), reproducible at
    * any parallelism.
    *
    * Semantically this is a prefix of a GLOBAL running sum over hash order,
    * but it is computed WITHOUT a global sort: (1) one map-side-combined
    * aggregate sums tokens per `prefixLen`-hex-char bucket of the hash
    * (16^prefixLen buckets — 65536 at the default 4, a bounded driver
    * collect; lexicographic bucket order ≡ hash order since the bucket IS
    * the hash's leading characters); (2) the driver prefix-sums the bucket
    * totals to find the boundary bucket — buckets before it are taken
    * whole with a pure RANGE predicate (`bucket < boundary`, codegen'd, no
    * giant isin list), buckets after dropped; (3) only the boundary bucket
    * — 1/65536 of the corpus (~1.5 GB per 100 TB) — pays a windowed
    * running sum. The output is row-identical to the single-window
    * formulation, which is what the DuckDB oracle runs. */
  def tokenBudgetSample(
      df: DataFrame, keyCol: String, tokenCol: String, budget: Long,
      prefixLen: Int = 4): DataFrame = {
    require(budget >= 0)
    val base = budgetBase(df, keyCol, tokenCol)
    tokenBudgetSampleFrom(base, keyCol, tokenCol, budget, prefixLen,
      bucketTotals(base, keyCol, tokenCol, prefixLen))
  }

  /** Null keys/tokens are excluded up front (matching hashSample's implicit
    * null-drop): a null key has no hash position in the global order and a
    * null token count cannot be budgeted — and downstream they would NPE
    * the driver-side bucket walk (null bucket string / null bucket sum). */
  private def budgetBase(df: DataFrame, keyCol: String, tokenCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull && col(tokenCol).isNotNull)

  /** One map-side-combined scan: token total per hash-prefix bucket, in
    * hash (= lexicographic) order. The corpus's TOTAL token mass is the sum
    * — callers needing both never scan twice. */
  private def bucketTotals(
      base: DataFrame, keyCol: String, tokenCol: String, prefixLen: Int): Array[(String, Long)] = {
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen in [1,8], got $prefixLen")
    val bucket = substring(md5(col(keyCol).cast("string")), 1, prefixLen)
    base.groupBy(bucket.as("__b"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // lexicographic = hash order for fixed-length lowercase hex
  }

  private def tokenBudgetSampleFrom(
      base: DataFrame, keyCol: String, tokenCol: String, budget: Long,
      prefixLen: Int, totals: Array[(String, Long)]): DataFrame = {
    val hk = md5(col(keyCol).cast("string"))
    val bucket = substring(hk, 1, prefixLen)
    // walk buckets in hash order until the cumulative total would exceed
    var before = 0L
    var boundary: Option[String] = None
    val it = totals.iterator
    while (boundary.isEmpty && it.hasNext) {
      val (b, t) = it.next()
      if (before + t > budget) boundary = Some(b) else before += t
    }
    boundary match {
      case None => base // whole corpus fits the budget
      case Some(bp) =>
        val whole = base.filter(bucket < lit(bp))
        val remaining = budget - before
        val w = Window.partitionBy(bucket)
          .orderBy(hk.asc, col(keyCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val edge = base.filter(bucket === lit(bp))
          .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
        whole.unionByName(edge)
    }
  }

  /** Deterministic TRAINING MIX: sample each corpus down so its share of
    * the mixed corpus's token mass matches `weights` (relative), never
    * upsampling — the "mix web 75% / code 15% / books 10%" sizing step.
    * The mix is the LARGEST one satisfying the proportions: the binding
    * corpus (smallest tokens-per-weight) is taken WHOLE — structurally,
    * its budget is its integer token total — and the rest are cut to
    * match its weight ratio.
    *
    * Each corpus pays ONE map-side-combined scan (the hash-bucket totals,
    * whose sum is the token total), submitted concurrently across corpora;
    * the cut is the exact hash-order token-budget prefix of
    * [[tokenBudgetSample]] over those same totals, so the selected rows
    * are reproducible at any parallelism/engine and the achieved budgets
    * are exact (no row-rate approximation of token share). Output = union
    * of the slices with a `source` tag column.
    * Every corpus must have a positive token total (a corpus that cannot
    * contribute its share makes the proportional mix empty — drop it or
    * fix its weight instead). */
  def weightedTokenMix(
      corpora: Seq[(String, DataFrame, Double)],
      keyCol: String, tokenCol: String): DataFrame = {
    require(corpora.nonEmpty, "need at least one corpus")
    require(corpora.forall(_._3 > 0), "weights must be positive")
    // ONE scan per corpus (the bucket totals ARE the token total) and the
    // independent per-corpus jobs are submitted concurrently — sequential
    // submission would idle the cluster through N job tails. Totals count
    // exactly the mass tokenBudgetSample can SELECT (null keys/tokens
    // excluded on both sides), so the achieved shares match the requested
    // weights instead of being inflated by unbudgetable rows.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.global
    val sized = Await.result(Future.sequence(corpora.map { case (name, df, w) =>
      Future {
        val base = budgetBase(df, keyCol, tokenCol)
        val totals = bucketTotals(base, keyCol, tokenCol, 4)
        (name, base, w, totals, totals.map(_._2).sum)
      }
    }), Duration.Inf)
    sized.foreach { case (name, _, _, _, total) =>
      require(total > 0,
        s"corpus '$name' has no token mass — it cannot contribute its share")
    }
    // The BINDING corpus (smallest tokens-per-RAW-weight; first on ties)
    // anchors the mix: its budget is its integer total EXACTLY, every
    // other corpus gets floor(bindingTotal · w_i / w_binding) — only RAW
    // weight ratios appear, never normalized shares. Deriving budgets from
    // a floating "mix size M = total/share" instead loses the binding
    // corpus's boundary document whenever M rounds down (share 0.07 of 21
    // tokens computes floor((21/0.07)·0.07) = 20). Anchoring on the
    // integer total makes "binding corpus taken whole" structural, not a
    // rounding accident.
    val bindIdx = sized.indices.minBy { i =>
      val (_, _, w, _, total) = sized(i); total / w
    }
    val (_, _, bindW, _, bindTotal) = sized(bindIdx)
    sized.zipWithIndex.map { case ((name, base, w, totals, _), i) =>
      val budget =
        if (i == bindIdx) bindTotal
        else math.floor(bindTotal * w / bindW).toLong
      tokenBudgetSampleFrom(base, keyCol, tokenCol, budget, 4, totals)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Finer-grained variant: keep `permille`/1000 of rows by comparing the
    * first 8 md5 hex chars (as a number) against the threshold. */
  def hashSamplePermille(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    df.filter(
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 1000L
        < permille)
  }

  /** Deterministic shard assignment in [0, nShards): the first 8 md5 hex
    * chars of the key, mod n — the same engine/run/partitioning-stable
    * hash family as [[hashSamplePermille]], so shard membership is
    * reproducible by ANY engine (the export manifest can be re-derived in
    * SQL) and stable across re-exports. A pure per-row expression. */
  def shardAssignment(keyCol: String, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % nShards
  }

  /** Export the corpus as `nShards` deterministic shards under `outDir`
    * (`shard=k` partitions) — the training-data handoff: each trainer
    * reads its own shard with partition pruning, membership never moves
    * between exports (hash-assigned, not round-robin — appending documents
    * later leaves every existing document's shard unchanged), and one
    * output file per shard (each shuffle task owns exactly the shard it
    * writes). Returns the per-shard (shard, docs) manifest — integer
    * facts any engine re-derives from the same md5 formula. */
  def exportShards(df: DataFrame, keyCol: String, nShards: Int,
      outDir: String): DataFrame = {
    val sharded = df.withColumn("shard", shardAssignment(keyCol, nShards))
    sharded
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    sharded.groupBy("shard").agg(count(lit(1)).as("docs")).orderBy("shard")
  }

  /** Ids of corpus documents sharing at least one word n-gram with a
    * held-out TEST set — train/test decontamination, the standard guard
    * against benchmark leakage in LLM training corpora (GPT-3/PaLM use
    * 13-gram overlap; `n` is a parameter here).
    *
    * Plan shape: the test set's distinct shingles are the SMALL side —
    * broadcast; the corpus shingles explode into a left-semi join against
    * them, then distinct ids. One corpus scan, no all-pairs structure, and
    * the corpus side never shuffles under the broadcast — linear at any
    * corpus size as long as the test set fits in a broadcast (it does: test
    * sets are fixed-size by construction). Empty-text pseudo-shingles are
    * excluded on both sides. */
  def contaminatedIds(
      corpus: DataFrame, idCol: String, textCol: String,
      testSet: DataFrame, testTextCol: String, n: Int = 13): DataFrame = {
    val testShingles = testSet
      .select(explode(graft.operators.Dedup.wordShingles(col(testTextCol), n)).as("__sh"))
      .filter(col("__sh") =!= "").distinct()
    corpus
      .select(col(idCol), explode(graft.operators.Dedup.wordShingles(col(textCol), n)).as("__sh"))
      .filter(col("__sh") =!= "")
      .join(broadcast(testShingles), Seq("__sh"), "left_semi")
      .select(idCol).distinct()
  }

  /** The corpus with contaminated documents removed (left-anti against
    * [[contaminatedIds]]). */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      testSet: DataFrame, testTextCol: String, n: Int = 13): DataFrame =
    corpus.join(contaminatedIds(corpus, idCol, textCol, testSet, testTextCol, n),
      Seq(idCol), "left_anti")

  /** Split documents into training-window chunks of at most `maxTokens`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens — the
    * standard context-window preparation step (and the RAG/embedding
    * chunker). One row out per (doc, chunk) with a deterministic
    * `chunk_idx`; inter-token whitespace normalizes to single spaces
    * (tokenizer-side contract, see [[graft.functions.ChunksExpr]]).
    * Pure per-row native expression + posexplode: embarrassingly parallel,
    * no shuffle, codegen-friendly surroundings — linear at any corpus
    * size. Rows with NULL text drop out (no tokens, nothing to train on). */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame =
    df.select(col(idCol),
      posexplode(graft.functions.chunk_texts(col(textCol), maxTokens, overlap))
        .as(Seq("chunk_idx", "chunk")))

  /** Pack documents into token-budget groups (sequence packing for
    * training): first-fit-decreasing within each partition. One row out
    * per row in, with a globally unique `pack_id`; a later
    * `groupBy(pack_id)` assembles batches.
    *
    * Packing is loop-carried per-partition state (open bins) that no
    * relational operator expresses — this is the one operator class where
    * `mapPartitions` is the right Spark tool. The pass is streaming:
    * at most `maxOpenBins` bins stay open (oldest is sealed when the list
    * overflows), so memory is O(maxOpenBins) regardless of partition size.
    * Documents alone exceeding the budget get a singleton pack. Packing is
    * partition-local by design — bins never span executors, so the
    * operator scales linearly and needs no shuffle beyond what the caller
    * already has (sortWithinPartitions is a local sort). */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, maxOpenBins: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(budget > 0)
    df.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .sortWithinPartitions(col(tokenCol).cast("long").desc)
      .mapPartitions { it =>
        val base = TaskContext.getPartitionId().toLong << 40
        var nextPack = 0L
        def newPack(): Long = { val p = base | nextPack; nextPack += 1; p }
        val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        it.map { case (id, tok) =>
          val pk =
            if (tok >= budget) newPack() // singleton; never enters the open list
            else {
              val fit = open.indexWhere(_._2 + tok <= budget)
              if (fit >= 0) { val (p, used) = open(fit); open(fit) = (p, used + tok); p }
              else {
                if (open.size >= maxOpenBins) open.remove(0) // seal the oldest
                val p = newPack(); open += ((p, tok)); p
              }
            }
          (id, tok, pk)
        }
      }
      .toDF(idCol, tokenCol, "pack_id")
  }
}
