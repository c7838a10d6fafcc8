package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Three tiers:
  *
  *  - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross join of
  *    the (small) query set against the corpus. The correctness baseline;
  *    linear in corpus × queries, no shuffle of the corpus itself.
  *  - [[lshTopK]] — random-hyperplane LSH with multi-probe: corpus bucketed
  *    once by sign-signature, queries probe their own bucket plus all
  *    1-bit-flip neighbors. Sub-linear candidate sets; the scale path.
  *  - [[ivfTopK]] — IVF: corpus assigned to nearest of k sampled centroids;
  *    queries scan the `nprobe` nearest cells. Centroids are tiny →
  *    broadcast; the cell assignment is the only corpus-wide shuffle.
  *
  * All vector math is `zip_with` + `aggregate` expressions (codegen'd); no
  * UDFs anywhere.
  */
object Similarity {

  // Native expressions (graft.functions): zip_with/aggregate lambdas are
  // interpreted per element in Spark — compiled loops measured ~50x faster
  // on 64-dim embeddings, which is the difference between an ANN sweep and
  // a stalled stage at corpus scale.

  /** Dot product of two array<numeric> columns. */
  def dot(a: Column, b: Column): Column = graft.functions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero vectors (guarded, no NaN). */
  def cosine(a: Column, b: Column): Column = graft.functions.cosine_sim(a, b)

  def euclidean(a: Column, b: Column): Column = graft.functions.euclidean_dist(a, b)

  /** Rank scored candidates to (query_id, id, cosine, rank): bounded-heap
    * top-k aggregate (see [[graft.functions.TopKByScore]]) instead of a
    * `row_number` window — map-side partial aggregation caps the shuffle at
    * k entries per (query, input partition) and no query's candidate set
    * ever funnels through a single reducer task. Ordering identical to the
    * window formulation: cosine desc, ties by ascending id. NULL cosines
    * (null or malformed corpus vectors) are dropped before aggregation: the
    * typed Aggregator's input encoder is non-nullable, and a window would
    * only have sorted them last anyway — out of the top-k either way. */
  private def rankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val agg = graft.functions.TopK.topKAgg(k)
    candidates
      .filter(col("cosine").isNotNull && col("id").isNotNull)
      .groupBy(col("query_id"))
      .agg(agg(col("id"), col("cosine")).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__sc")))
      .select(col("query_id"), col("__sc.id").as("id"), col("__sc.cosine").as("cosine"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Exact cosine top-k for each query row. `queries` must be small enough
    * to broadcast (the `broadcast` hint is applied); corpus ids must be
    * (castable to) long. Deterministic: ties broken by corpus id.
    * Output: (query_id, id, cosine, rank). */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus
      .select(col(corpusId).cast("long").as("id"), col(corpusVec).as("v"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .withColumn("cosine", cosine(col("v"), col("qv")))
    rankTopK(joined, k)
  }

  /** Symmetric int8 quantization of an embedding column: struct<scale, q>
    * is 4× smaller at rest than float32 — at the 100 TB design point the
    * embedding table is usually the largest artifact after raw text, so this
    * is the storage format the corpus would actually ship in. Cosine is
    * invariant to per-vector scale, so ranking quality survives (bounded in
    * SimilaritySpec). */
  def quantize(v: Column): Column = graft.functions.quantize_vec(v)

  def dequantize(q: Column): Column = graft.functions.dequantize_vec(q)

  /** Cosine directly over two quantized structs (integer dot/norms). */
  def cosineQ(a: Column, b: Column): Column = graft.functions.cosine_sim_q(a, b)

  /** Exact cosine top-k over an int8-QUANTIZED corpus: same plan shape as
    * [[bruteForceTopK]] (broadcast queries, bounded-heap ranking), but the
    * corpus side carries 1/4 the bytes and the scoring loop is integer
    * arithmetic. Queries are quantized on the fly. */
  def bruteForceTopKQuantized(
      corpus: DataFrame, corpusId: String, corpusQuant: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus
      .select(col(corpusId).cast("long").as("id"), col(corpusQuant).as("qv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"),
        quantize(col(queryVec)).as("qq"))))
      .withColumn("cosine", cosineQ(col("qv"), col("qq")))
    rankTopK(joined, k)
  }

  /** Deterministic random hyperplanes: `planes` vectors of `dim` components
    * drawn from a seeded RNG (tiny constants — ship with the plan). */
  private def planeVectors(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-signature bucket id: bit p set iff dot(v, plane_p) >= 0 (native
    * expression; the plane matrix ships as compiled constants). */
  def hyperplaneSignature(v: Column, dim: Int, planes: Int, seed: Long): Column =
    graft.functions.hyperplane_sig(v, planeVectors(dim, planes, seed))

  /** All bucket ids within Hamming distance 1 of the signature (multi-probe:
    * the query's own bucket plus each 1-bit flip). */
  def probeBuckets(sig: Column, planes: Int): Column =
    array((sig +: (0 until planes).map(i => sig.bitwiseXOR(lit(1L << i)))): _*)

  /** LSH ANN top-k: corpus bucketed by hyperplane signature; each query
    * probes its bucket + 1-bit neighbors; exact cosine ranks candidates.
    * Recall < 1.0 by construction — [[bruteForceTopK]] is the oracle. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, planes: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = corpus
      .select(col(corpusId).cast("long").as("id"), col(corpusVec).as("v"))
      .withColumn("bucket", hyperplaneSignature(col("v"), dim, planes, seed))
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("sig", hyperplaneSignature(col("qv"), dim, planes, seed))
      .select(col("query_id"), col("qv"),
        explode(probeBuckets(col("sig"), planes)).as("bucket"))
    val candidates = bucketed.join(broadcast(probed), "bucket")
      .withColumn("cosine", cosine(col("v"), col("qv")))
    rankTopK(candidates, k)
  }

  /** IVF index: assign every corpus vector to its nearest centroid.
    * Centroids are sampled deterministically from the corpus (every
    * `corpusSize/k`-th row by id order) — k-means would drop in here
    * unchanged. Returns the corpus with a `cell` column. */
  def ivfAssign(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Seq[(Long, Seq[Double])]): DataFrame =
    corpus.withColumn("cell",
      graft.functions.nearest_cells(col(corpusVec), centroids, 1).getItem(0))

  /** Sample `k` centroids deterministically (small collect — index build
    * time only, never per-query). */
  def sampleCentroids(corpus: DataFrame, corpusId: String, corpusVec: String, k: Int): Seq[(Long, Seq[Double])] = {
    val n = corpus.count()
    val step = math.max(n / k, 1L)
    corpus.select(col(corpusId).cast("long").as("id"), col(corpusVec).cast("array<double>").as("v"))
      .filter(pmod(col("id"), lit(step)) === 0)
      .orderBy("id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
  }

  /** Lloyd refinement of IVF centroids: `iters` rounds of assign-then-mean.
    * Each round is ONE scan — cells assigned by the (broadcast-constant)
    * current centroids, element-wise means via posexplode + groupBy
    * (cell, dim): map-side partial aggregation collapses every task to at
    * most k×dim rows, so the shuffle is O(k·dim·tasks) regardless of corpus
    * size, and the collected result is k×dim values. Cells that lose all
    * members keep their previous centroid. SSE is non-increasing per Lloyd;
    * asserted in SimilaritySpec. */
  def refineCentroids(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Seq[(Long, Seq[Double])], iters: Int = 2): Seq[(Long, Seq[Double])] = {
    var cur = centroids
    for (_ <- 1 to iters) {
      val means = corpus
        .select(graft.functions.nearest_cells(col(corpusVec), cur, 1).getItem(0).as("cell"),
          posexplode(col(corpusVec).cast("array<double>")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cur = cur.map { case (cell, prev) => cell -> means.getOrElse(cell, prev) }
    }
    cur
  }

  /** Sampled centroids + Lloyd refinement — the full IVF index build. */
  def kMeansCentroids(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, iters: Int = 2): Seq[(Long, Seq[Double])] =
    refineCentroids(corpus, corpusId, corpusVec,
      sampleCentroids(corpus, corpusId, corpusVec, k), iters)

  /** IVF ANN top-k with `nprobe` probed cells per query. */
  def ivfTopK(
      corpusWithCells: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Seq[(Long, Seq[Double])], k: Int, nprobe: Int = 2): DataFrame = {
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(graft.functions.nearest_cells(col("qv"), centroids, nprobe)).as("cell"))
    val candidates = corpusWithCells
      .select(col(corpusId).cast("long").as("id"), col(corpusVec).as("v"), col("cell"))
      .join(broadcast(probed), "cell")
      .withColumn("cosine", cosine(col("v"), col("qv")))
    rankTopK(candidates, k)
  }
}
