package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("decontamination: docs sharing a test-set n-gram are flagged; rest survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // shares 5-gram with test
      (2L, "completely unrelated text about spark query planning here"),
      (3L, "short doc"), // < n tokens: whole-doc shingle, no test match
      (4L, "the quick brown fox jumps high") // shares the same 5-gram prefix
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, "benchmark says the quick brown fox jumps over obstacles")
    ).toDF("doc_id", "text")
    val bad = graft.operators.Curation
      .contaminatedIds(corpus, "doc_id", "text", test, "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    bad shouldBe Set(1L, 4L) // both contain "the quick brown fox jumps"
    val clean = graft.operators.Curation
      .decontaminate(corpus, "doc_id", "text", test, "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    clean shouldBe Set(2L, 3L)
    // the broadcast side is the TEST set: plan must not shuffle the corpus
    val plan = graft.operators.Curation
      .contaminatedIds(corpus, "doc_id", "text", test, "text", n = 5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("assembleByKey renders ordered parts into one deterministic document per key") {
    import spark.implicits._
    val turns = Seq(
      ("c1", Some(1), "assistant", "hi there"),
      ("c1", Some(0), "user", "hello"),
      ("c1", Some(2), "user", "bye"),
      ("c2", Some(0), "user", "solo"),
      ("c2", None, "system", "dropped"),           // NULL order excluded
      ("c3", Some(0), "user", "b-text"),           // duplicate turn_idx: tie
      ("c3", Some(0), "assistant", "a-text")       // broken by (role, text)
    ).toDF("conv_id", "turn_idx", "role", "text")
    val docs = Curation.assembleConversations(turns)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    docs("c1") shouldBe ((3L, "user: hello\nassistant: hi there\nuser: bye"))
    docs("c2") shouldBe ((1L, "user: solo"))
    // tie on turn_idx: lexicographic struct sort breaks by remaining fields
    docs("c3") shouldBe ((2L, "assistant: a-text\nuser: b-text"))
    // partitioning-invariant (the determinism contract)
    val re = Curation.assembleConversations(turns.repartition(7))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    re shouldBe docs.view.mapValues(_._2).toMap
    // NULL render field renders as '' with the separator kept (concat_ws
    // alone would silently drop it, making 'user' ambiguous)
    val withNull = Seq(("c", Some(0), "user", null: String)).toDF("conv_id", "turn_idx", "role", "text")
    Curation.assembleConversations(withNull).collect().head.getString(2) shouldBe "user: "
    // renderCols may repeat the order column (positional struct aliases)
    val withIdx = Curation.assembleByKey(turns.filter($"conv_id" === "c1"),
      "conv_id", "turn_idx", Seq("turn_idx", "role"), fieldSep = "|", lineSep = ";")
      .collect().head.getString(2)
    withIdx shouldBe "0|user;1|assistant;2|user"
  }

  test("hash sample is deterministic and partitioning-invariant") {
    val a = Curation.hashSample(docs, "doc_id", 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(docs.repartition(17), "doc_id", 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    a shouldBe b
    // 3/16 of 500 docs, binomial tolerance
    a.size.toDouble shouldBe (500 * 3.0 / 16) +- 40
    // edges
    Curation.hashSample(docs, "doc_id", 0).count() shouldBe 0
    Curation.hashSample(docs, "doc_id", 16).count() shouldBe 500
  }

  test("stratified sample applies each stratum's rate and matches hashSample per stratum") {
    val rates = Map("en" -> 4, "zh" -> 16)
    val sampled = Curation.stratifiedHashSample(docs, "doc_id", "lang", rates, 8)
    // per stratum, the kept set must equal hashSample at that stratum's rate
    // over the stratum alone (same predicate, same md5 rank)
    for ((lang, s) <- rates + ("fr" -> 8)) {
      val viaStrat = sampled.filter(col("lang") === lang)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val direct = Curation.hashSample(docs.filter(col("lang") === lang), "doc_id", s)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      viaStrat shouldBe direct
    }
    // rate-16 stratum is kept whole
    sampled.filter(col("lang") === "zh").count() shouldBe
      docs.filter(col("lang") === "zh").count()
    // partitioning-invariant
    val re = Curation.stratifiedHashSample(docs.repartition(13), "doc_id", "lang", rates, 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    re shouldBe sampled.select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("hashTopN returns a deterministic fixed-size slice via TakeOrdered") {
    val a = Curation.hashTopN(docs, "doc_id", 50)
    a.count() shouldBe 50
    a.columns.toSeq shouldBe docs.columns.toSeq // helper column dropped
    val ids = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.hashTopN(docs.repartition(23), "doc_id", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    b shouldBe ids
    // no global sort: the plan must be TakeOrderedAndProject, not Sort+Limit
    Curation.hashTopN(docs, "doc_id", 50)
      .queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
  }

  test("tokenBudgetSample: bucket-wise prefix equals the global-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val budget = 30000L
    val got = Curation.tokenBudgetSample(docs, "doc_id", "n_chars", budget)
    // reference: single global running-sum window
    val w = Window.orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("__cum", sum(col("n_chars").cast("long")).over(w))
      .filter(col("__cum") <= budget).drop("__cum")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe ref
    // budget respected; adding any excluded doc would exceed it (maximality
    // of the hash-order prefix): total + smallest excluded > budget is NOT
    // guaranteed (prefix, not knapsack) — assert the prefix property instead
    val total = got.agg(sum(col("n_chars"))).head().getLong(0)
    total should be <= budget
    // partitioning-invariant
    Curation.tokenBudgetSample(docs.repartition(19), "doc_id", "n_chars", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe ref
    // bucket granularity is an implementation knob, not a semantic one
    Curation.tokenBudgetSample(docs, "doc_id", "n_chars", budget, prefixLen = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe ref
    // degenerate budgets
    Curation.tokenBudgetSample(docs, "doc_id", "n_chars", 0L).count() shouldBe 0
    Curation.tokenBudgetSample(docs, "doc_id", "n_chars", Long.MaxValue).count() shouldBe docs.count()
  }

  test("tokenBudgetSample excludes null keys/tokens instead of NPEing the bucket walk") {
    import spark.implicits._
    val mixed = Seq(
      (Option(1L), Option(10L)), (None, Option(20L)),
      (Option(2L), None), (Option(3L), Option(5L)))
      .toDF("doc_id", "n_chars")
    // a null key would put a null bucket into the driver-side sortBy and a
    // null-token bucket a null sum — both NPE'd before the guard
    val out = Curation.tokenBudgetSample(mixed, "doc_id", "n_chars", budget = 100L)
    out.collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
    // binding budget still walks cleanly
    Curation.tokenBudgetSample(mixed, "doc_id", "n_chars", 0L).count() shouldBe 0
  }

  test("chunkDocuments: windows, overlap, edge shapes") {
    import spark.implicits._
    val text10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, Option(text10)),           // 10 tokens
      (2L, Option("a  b\t c\nd")),    // messy whitespace → 4 tokens
      (3L, Option("")),               // empty → one empty chunk
      (4L, Option.empty[String]))     // null → dropped
      .toDF("doc_id", "text")
    // maxTokens=8, overlap=4 → stride 4: chunks [w1..w8], [w5..w10]; a
    // third window starting at 8 would be pure overlap — not emitted
    val out = Curation.chunkDocuments(df, "doc_id", "text", maxTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    out.filter(_._1 == 1L).map(_._3) shouldBe Array(
      (1 to 8).map(i => s"w$i").mkString(" "),
      (5 to 10).map(i => s"w$i").mkString(" "))
    out.filter(_._1 == 2L).map(_._3) shouldBe Array("a b c d") // normalized
    out.filter(_._1 == 3L).map(_._3) shouldBe Array("")
    out.map(_._1) should not contain 4L
    // overlap coverage invariant: concatenating chunks with the overlap
    // removed reconstructs the token stream
    val chunks1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    (chunks1.head ++ chunks1.tail.flatMap(_.drop(4))) shouldBe
      (1 to 10).map(i => s"w$i")
    // no-overlap chunking partitions exactly
    Curation.chunkDocuments(df.filter($"doc_id" === 1L), "doc_id", "text", 4)
      .collect().map(_.getString(2)).flatMap(_.split(" ")) shouldBe
      (1 to 10).map(i => s"w$i")
    // pure per-row pipeline: no exchange anywhere in the plan
    Curation.chunkDocuments(df, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("weightedTokenMix: proportional token shares, binding corpus kept whole") {
    import spark.implicits._
    // A: 10 docs × 100 tokens = 1000; B: 3 docs × 100 = 300. Weights 1:3 →
    // B binds (300/0.75 = 400 < 1000/0.25) → targets: A 100, B 300.
    val a = (1L to 10L).map(i => (i, 100L)).toDF("doc_id", "tokens")
    val b = (101L to 103L).map(i => (i, 100L)).toDF("doc_id", "tokens")
    val mix = Curation.weightedTokenMix(
      Seq(("a", a, 1.0), ("b", b, 3.0)), "doc_id", "tokens")
    val bySource = mix.groupBy("source").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource("b") shouldBe 300L // the binding corpus is taken whole
    bySource("a") shouldBe 100L // exactly the proportional share (1 doc)
    // deterministic under repartitioning
    val again = Curation.weightedTokenMix(
      Seq(("a", a.repartition(7), 1.0), ("b", b.repartition(5), 3.0)), "doc_id", "tokens")
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    again shouldBe mix.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // a zero-mass corpus is a config error, not a silent empty mix
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "tokens")
    val e = intercept[IllegalArgumentException] {
      Curation.weightedTokenMix(Seq(("a", a, 1.0), ("z", empty, 1.0)), "doc_id", "tokens")
    }
    e.getMessage should include("'z'")
    // null-key token mass is excluded from the totals TOO (not just the
    // cut), so the achieved shares stay true to the weights
    val aWithNulls = a.unionByName(
      Seq((Option.empty[Long], Option(100000L))).toDF("doc_id", "tokens"))
    val mixN = Curation.weightedTokenMix(
      Seq(("a", aWithNulls, 1.0), ("b", b, 3.0)), "doc_id", "tokens")
      .groupBy("source").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mixN shouldBe bySource // identical to the null-free mix
    // floating-point floor edge: share 0.07 of a 21-token binding corpus
    // computes floor((21/0.07)*0.07) = 20 — the clamp keeps it whole
    val tiny = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("doc_id", "tokens")
    val big = (1L to 100L).map(i => (1000L + i, 100L)).toDF("doc_id", "tokens")
    val edge = Curation.weightedTokenMix(
      Seq(("tiny", tiny, 7.0), ("big", big, 93.0)), "doc_id", "tokens")
      .groupBy("source").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    edge("tiny") shouldBe 21L // whole binding corpus, no boundary-doc loss
  }

  test("ChunksExpr property grid: bounds, stride, reconstruction at every shape") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.StringType
    for (max <- 1 to 10; ov <- 0 until max; n <- 0 to 40) {
      val toks = (1 to n).map(i => s"t$i")
      val text = toks.mkString(" ")
      val out = graft.functions.ChunksExpr(Literal.create(text, StringType), max, ov)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString)
      val clue = s"max=$max ov=$ov n=$n"
      withClue(clue) {
        if (n == 0) out.toSeq shouldBe Seq("")
        else {
          val chunks = out.map(_.split(" ").toSeq)
          // every chunk within the window bound, none empty
          chunks.foreach(_.length should be <= max)
          chunks.foreach(_.length should be > 0)
          // stride contract: chunk k starts at token k*(max-ov)
          chunks.zipWithIndex.foreach { case (c, k) =>
            c.head shouldBe toks(k * (max - ov))
          }
          // reconstruction: overlap removed, the token stream comes back
          (chunks.head ++ chunks.tail.flatMap(_.drop(ov))) shouldBe toks
          // no pure-overlap tail: a non-first chunk carries new tokens
          chunks.tail.foreach(_.length should be > ov)
        }
      }
    }
  }

  test("permille sample hits the requested rate") {
    val n = Curation.hashSamplePermille(docs, "doc_id", 200).count()
    n.toDouble shouldBe 100.0 +- 35 // 20% of 500
    Curation.hashSamplePermille(docs, "doc_id", 0).count() shouldBe 0
    Curation.hashSamplePermille(docs, "doc_id", 1000).count() shouldBe 500
  }

  test("sequence packing: every doc once, no multi-doc pack over budget") {
    val sized = Seq(
      (1L, 900L), (2L, 800L), (3L, 700L), (4L, 600L), (5L, 500L),
      (6L, 400L), (7L, 300L), (8L, 200L), (9L, 100L), (10L, 1500L)
    ).toDF("doc_id", "tokens").repartition(1)
    val packed = Curation.packSequences(sized, "doc_id", "tokens", budget = 1024L)
    packed.count() shouldBe 10 // one row out per row in
    packed.select("doc_id").distinct().count() shouldBe 10
    val packs = packed.groupBy("pack_id")
      .agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .collect()
    // packs with >1 doc respect the budget; the 1500-token doc is a singleton
    packs.filter(_.getLong(2) > 1).foreach(_.getLong(1) should be <= 1024L)
    val total = 900 + 800 + 700 + 600 + 500 + 400 + 300 + 200 + 100
    // pack count is near the bin-packing lower bound ceil(total/budget) + singleton
    val lowerBound = math.ceil(total / 1024.0).toInt + 1
    packs.length should be >= lowerBound
    packs.length should be <= lowerBound + 2 // FFD is within a small factor here
  }

  test("packing over real token counts stays under budget and covers the corpus") {
    val sized = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).as("tokens"))
    val packed = Curation.packSequences(sized, "doc_id", "tokens", budget = 2048L)
    packed.count() shouldBe 500
    val over = packed.groupBy("pack_id").agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("t") > 2048L).count()
    over shouldBe 0
  }

  test("shard export: hash-stable membership, complete partition layout, one file per shard") {
    import spark.implicits._
    val docs = (0 until 400).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    val manifest = Curation.exportShards(docs, "doc_id", 8, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    manifest.values.sum shouldBe 400L
    // the exported layout holds every row exactly once, in its hash shard
    val back = spark.read.parquet(dir)
    back.count() shouldBe 400L
    back.filter(col("shard") =!=
      Curation.shardAssignment("doc_id", 8)).count() shouldBe 0L
    // membership is STABLE under later appends: re-exporting a superset
    // keeps every original document in its original shard (hash-assigned,
    // not round-robin)
    val more = (0 until 500).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString + "/out"
    Curation.exportShards(more, "doc_id", 8, dir2)
    val a = spark.read.parquet(dir).select("doc_id", "shard")
    val b = spark.read.parquet(dir2).select("doc_id", "shard")
    a.join(b, "doc_id").filter(a("shard") =!= b("shard")).count() shouldBe 0L
    // one data file per shard directory (each shuffle task owns its shard)
    new java.io.File(dir).listFiles.filter(_.getName.startsWith("shard=")).foreach { d =>
      d.listFiles.count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")) shouldBe 1
    }
    // a single-shard read prunes at the source (partition filter, no scan
    // of the other shards)
    val one = spark.read.parquet(dir).filter(col("shard") === 3)
    one.queryExecution.executedPlan.toString should include ("PartitionFilters")
  }
}
