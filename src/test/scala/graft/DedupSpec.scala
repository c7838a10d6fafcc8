package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with planted near-dup pair (1,2), exact-dup pair (3,4), and
    * unrelated docs. */
  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (3L, "completely identical text body"),
    (4L, "completely identical text body"),
    (5L, "an entirely different document about spark query optimization and shuffles"),
    (6L, "yet another unrelated piece of text mentioning neither foxes nor dogs at all")
  ).toDF("doc_id", "text")

  test("exact duplicate groups by content hash") {
    val groups = Dedup.exactDuplicateGroups(docs, "text").collect()
    groups.length shouldBe 1
    groups.head.getLong(1) shouldBe 2
  }

  test("dedupExact keeps one row per distinct text") {
    Dedup.dedupExact(docs, "text", "doc_id").count() shouldBe 5
    // deterministic: keeps the lowest doc_id
    Dedup.dedupExact(docs, "text", "doc_id")
      .filter(col("text") === "completely identical text body")
      .head().getLong(0) shouldBe 3L
  }

  test("exact n-gram Jaccard finds the planted near-dup pair with the exact value") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.keySet should contain((1L, 2L))
    pairs.keySet should contain((3L, 4L))
    pairs((3L, 4L)) shouldBe 1.0
    // doc1/doc2: 14 tokens each → 12 shingles each, 11 shared → 11/13
    pairs((1L, 2L)) shouldBe (11.0 / 13.0) +- 1e-12
  }

  test("hot-shingle df cap drops pairs whose only shared shingle exceeds it") {
    // "x y z" occurs in all five docs (df=5); docs 1 and 2 overlap ONLY on it
    val hot = Seq(
      (1L, "x y z"),
      (2L, "x y z w"),
      (3L, "x y z a b c d e f"),
      (4L, "x y z g h i j k l"),
      (5L, "x y z m n o p q r")).toDF("doc_id", "text")
    val noCap = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    noCap shouldBe Set((1L, 2L)) // J(1,2) = 1/2 exactly; all other pairs < 0.5
    // cap below the hot shingle's df: the only connecting shingle leaves the
    // index, so the pair is (documentedly) missed — the adversarial-corpus
    // guard trades that tail for bounded bucket sizes
    val capped = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.5, maxShingleDf = 4L)
      .collect()
    capped shouldBe empty
    // cap above every df: exact results unchanged
    val highCap = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.5, maxShingleDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    highCap shouldBe Set((1L, 2L))
  }

  test("incremental near-dup: new docs matched against a materialized signature index") {
    val index = Dedup.buildSignatureIndex(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16)
    index.columns.toSet shouldBe Set("id", "shingles", "sig", "bands")
    // doc 101 is a near-dup of corpus doc 1 (one word changed); 102 is new
    val newDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (102L, "completely novel content that resembles nothing in the corpus at all today")
    ).toDF("doc_id", "text")
    val hits = Dedup.minHashLshPairsAgainstIndex(newDocs, "doc_id", "text", index,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    hits.map(_._1) should contain(101L)
    hits.filter(_._1 == 101L).map(_._2) should contain(1L)
    hits.map(_._1) should not contain 102L
  }

  test("signature index round-trips through disk and serves the incremental join exchange-free") {
    val dir = java.nio.file.Files.createTempDirectory("sig_index").toString
    val index = Dedup.buildSignatureIndex(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16)
    Dedup.writeSignatureIndex(index, dir, buckets = 4)
    // simulate a FRESH session: drop the catalog entries, keep the files —
    // openSignatureIndex must re-declare the external bucketed tables from
    // the DDL sidecars alone
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_sig_")).foreach(t => spark.sql(s"DROP TABLE $t"))
    val newDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (102L, "completely novel content that resembles nothing in the corpus at all today")
    ).toDF("doc_id", "text")
    val stored = Dedup.minHashLshPairsAgainstStoredIndex(newDocs, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
    val storedHits = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same pairs as the in-memory index path
    val memHits = Dedup.minHashLshPairsAgainstIndex(newDocs, "doc_id", "text", index,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    storedHits shouldBe memHits
    storedHits.map(_._1) should contain(101L)
    // the at-rest layout serves the candidate join WITHOUT re-hashing the
    // index side: no Exchange over band_hash in the executed plan
    stored.collect()
    val plan = stored.queryExecution.executedPlan.toString
    plan should not include "Exchange hashpartitioning(band_hash"
    // ingest-loop second half: absorb batch 1 into the index, then a LATER
    // batch near-dupping an ABSORBED doc (101) must find it via the index
    Dedup.appendToSignatureIndex(newDocs, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    val later = Seq(
      (201L, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
      .toDF("doc_id", "text")
    val hits2 = Dedup.minHashLshPairsAgainstStoredIndex(later, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    hits2.map(_._2) should contain(101L) // the appended doc is now indexed
    hits2.map(_._2) should contain(1L)   // the original corpus still is

    // lifecycle's maintenance half: more appends → one file per bucket per
    // append; compaction rewrites back to one file per bucket, preserving
    // content AND the exchange-free join, atomically (directory swap)
    Dedup.appendToSignatureIndex(
      Seq((301L, "yet another batch about storage engines and databases tonight"))
        .toDF("doc_id", "text"), "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    val (filesBefore, filesAfter) = Dedup.compactSignatureIndex(spark, dir)
    filesBefore should be > filesAfter
    filesAfter should be <= 8 // ≤ one file per bucket × 2 tables (empty buckets write none)
    val afterCompact = Dedup.minHashLshPairsAgainstStoredIndex(later, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
    afterCompact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe hits2
    afterCompact.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning(band_hash"
  }

  test("connected components merge transitive near-dup chains; singletons keep themselves") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L)
    // dedupByClusters: docs absent from any pair are their own canonical
    val corpus = Seq(1L, 2L, 3L, 7L, 10L, 11L, 99L).toDF("doc_id")
    val canon = Dedup.dedupByClusters(corpus, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon(99L) shouldBe 99L
    canon(11L) shouldBe 10L
    canon(7L) shouldBe 1L
    // keeping canonical rows only deduplicates to one doc per cluster
    Dedup.dedupByClusters(corpus, "doc_id", pairs)
      .filter(col("doc_id") === col("canonical_id")).count() shouldBe 3 // 1, 10, 99
  }

  test("long-chain components converge (diameter > a few hops)") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.values.toSet shouldBe Set(1L)
    cc.size shouldBe 40
  }

  test("distributed and driver-local component paths agree") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distributed = Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    distributed shouldBe local
    // equivalence AT the threshold boundary: 6 edges — run once exactly at
    // the cap (driver path takes it) and once just below (distributed path
    // takes over because head.length > maxDriverEdges)
    Dedup.connectedComponents(pairs, maxDriverEdges = 6L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe local
    Dedup.connectedComponents(pairs, maxDriverEdges = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe local
  }

  test("MinHash LSH finds planted near-dups and no false positives above threshold") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should contain((3L, 4L))
    pairs.size shouldBe 2 // verification join kills sub-threshold candidates
  }

  test("MinHash LSH pairs are a subset of exact Jaccard pairs (no false positives)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Dedup.minHashLshPairs(d, "doc_id", "text", 3, 64, 16, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh.subsetOf(exact) shouldBe true
    // recall on strong near-dups (jaccard >= .9) should be complete at 64x16
    val strong = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    strong.diff(lsh) shouldBe empty
  }

  test("SimHash: identical docs distance 0; near-dups within radius") {
    val hashes = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hashes(3L) shouldBe hashes(4L)
    java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) should be <= 12
    val nd = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nd should contain((3L, 4L))
  }

  test("embedding near-dups via hyperplane LSH buckets") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.05f, 0.0f, 0.0f)), // near-dup of 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.95, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nd shouldBe Set((1L, 2L))
  }

  test("semantic near-dups (k-means cells): sound, and complete within a cell") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Dedup.semanticNearDups(emb, "vec_id", "embedding",
      cells = 8, threshold = 0.4)
    // soundness: every reported pair really clears the threshold
    val wrong = pairs.filter(col("cosine") < 0.4).count()
    wrong shouldBe 0
    // completeness within blocking: reported pairs ⊆ true pairs, and every
    // CO-CELLED true pair is reported
    val centroids = graft.operators.Similarity.kMeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val assigned = graft.operators.Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
      .select(col("vec_id").as("id"), col("cell"))
    val cellOf = assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val all = a.crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.operators.Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= 0.4)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.subsetOf(all) shouldBe true
    val coCelled = all.filter { case (x, y) => cellOf(x) == cellOf(y) }
    got shouldBe coCelled
  }

  test("operators leak no cached blocks: bare calls persist nothing; CacheScope releases") {
    import graft.operators.CacheScope
    def cachedRdds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = cachedRdds
    // bare calls (no scope): persist-free by contract — a long-lived session
    // (notebook, streaming driver) can loop these without accumulating blocks
    Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).collect()
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).collect()
    val index = Dedup.buildSignatureIndex(docs, "doc_id", "text", 3, 64, 16)
    val newDocs = Seq((101L, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
      .toDF("doc_id", "text")
    Dedup.minHashLshPairsAgainstIndex(newDocs, "doc_id", "text", index,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5).collect()
    cachedRdds shouldBe before
    // ambient scope: blocks live inside, ALL released on exit
    CacheScope.cached {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).collect()
      (cachedRdds -- before) should not be empty
    }
    cachedRdds shouldBe before
    // explicit scope: caller owns unpersist()
    val scope = CacheScope()
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, scope = scope).collect()
    (cachedRdds -- before) should not be empty
    scope.unpersist()
    cachedRdds shouldBe before
  }

  test("hot-df pass is unconditional: stop-shingle buckets shrink at every corpus size") {
    // a stop-shingle in every doc (df = corpus size) must sort LAST in the
    // prefix order so it falls out of every doc's prefix — the earlier
    // doc-count (<100k skip) and index-mass gates each left a corpus shape
    // where the quadratic bucket ran anyway; now the pass always runs.
    // Exactness never depends on it (any consistent global order satisfies
    // the prefix theorem): a corpus whose ONLY link is a hot shingle still
    // pairs exactly when Jaccard clears the threshold.
    val hot = Seq(
      (1L, "x y z a b"),
      (2L, "x y z a c"),
      (3L, "x y z d e f g h i"),
      (4L, "x y z j k l m n o")).toDF("doc_id", "text")
    // hotDfThreshold=1 forces even df=2 shingles into the collected map —
    // the pass is exercised, not just compiled
    val pairs = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.4,
        hotDfThreshold = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // docs 1,2: shingles {xyz,yza,zab|zac} → J = 2/4
    pairs.keySet shouldBe Set((1L, 2L))
    pairs((1L, 2L)) shouldBe 0.5 +- 1e-12
  }

  test("rankTopK tolerates NULL embeddings in the corpus (dropped, not fatal)") {
    val corpus = Seq(
      (1L, Some(Seq(1.0f, 0.0f))),
      (2L, Some(Seq(0.9f, 0.1f))),
      (3L, None: Option[Seq[Float]]) // malformed row — must not kill the job
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("q_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "embedding", k = 5)
      .collect().map(r => r.getLong(1)).toSet
    top shouldBe Set(1L, 2L)
  }

  test("shingling edge cases: short and empty texts don't explode") {
    val edge = Seq((1L, "one two"), (2L, ""), (3L, "single")).toDF("doc_id", "text")
    noException should be thrownBy
      Dedup.ngramJaccardPairs(edge, "doc_id", "text", 3, 0.1).collect()
    noException should be thrownBy
      Dedup.minHashLshPairs(edge, "doc_id", "text", 3, 16, 4, 0.1).collect()
  }
}
