package graft

import graft.engine.{RulePlanner, Validator}
import graft.io.{TranscriptConfig, Transcripts}
import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end composition of the training-data pipeline over the synthetic
  * transcripts table — the chain a 100 TB deployment runs:
  *
  *   validate → clean (filter mode) → assemble conversations → strip
  *   markup → exact dedup → token-budget slice → pack
  *
  * Each stage is oracle/spec-verified on its own elsewhere; this spec pins
  * the CONTRACTS BETWEEN stages (schemas compose, invariants survive, no
  * stage silently drops or duplicates mass) so a refactor of one operator
  * cannot quietly break its neighbors.
  */
class PipelineSpec extends SparkSpec {

  test("transcripts → clean → assemble → dedup → budget → pack composes with conserved invariants") {
    val turns = Transcripts.turns(spark, TranscriptConfig(numConvs = 400L, hotConvExtraTurns = 40L))

    // 1. validation verdicts on the raw table (the gate)
    val v = new Validator(spark, ValidationConfig())
    val rules = Seq(
      ValidationRule("text_complete", RuleType.Completeness, Seq("text"), threshold = Some(0.5)),
      ValidationRule("seq", RuleType.Sequence, Seq("conv_id"),
        parameters = Map("index" -> "turn_idx", "start" -> "0"), threshold = Some(0.5)),
      ValidationRule("mono", RuleType.Monotonic, Seq("conv_id"),
        parameters = Map("order_by" -> "turn_idx", "value" -> "ts"), threshold = Some(0.5)))
    val summary = v.executeRules(turns, rules, "transcripts")
    summary.results.foreach(_.failed_count should be >= 0L) // no error sentinels

    // 2. clean: completeness filter + monotone walk (chained filter mode)
    val cleaned = RulePlanner.applyFilters(turns, rules)
    val nCleaned = cleaned.count()
    nCleaned should be > 0L
    nCleaned should be <= turns.count()
    // the cleaned table re-validates perfectly on the filterable rules
    val re = v.executeRules(cleaned, rules.filter(_.name != "seq"), "cleaned")
    re.results.foreach(_.failed_count shouldBe 0L)

    // 3. assemble: one document per conversation, all cleaned turns covered
    val docs = Curation.assembleConversations(cleaned)
      .withColumn("text", TextAnalysis.stripMarkup(col("document")))
      .select(col("conv_id").as("doc_id"), col("text"), col("n_parts"))
    docs.agg(sum("n_parts")).head().getLong(0) shouldBe
      cleaned.filter(col("turn_idx").isNotNull).count() // every turn rendered exactly once
    val nDocs = docs.count()
    nDocs shouldBe cleaned.select("conv_id").distinct().count()

    // 4. exact dedup on the assembled documents (deterministic fingerprint)
    val deduped = Dedup.dedupExact(docs, "text", "doc_id")
    val nDeduped = deduped.count()
    nDeduped should be <= nDocs
    deduped.select("text").distinct().count() shouldBe
      docs.select("text").distinct().count() // dedup keeps every distinct text

    // 5. token-budget slice: conserve the selection contract
    val withTokens = deduped.withColumn("tokens", TextAnalysis.tokenCount(col("text")))
    val budget = 2000L
    val slice = Curation.tokenBudgetSample(withTokens, "doc_id", "tokens", budget)
    val sliceTokens = slice.agg(coalesce(sum("tokens"), lit(0L))).head().getLong(0)
    sliceTokens should be <= budget

    // 6. pack the slice into training batches (numeric doc ids via hash —
    // packSequences contracts a long id): coverage + budget invariants
    val packable = slice.withColumn("id", xxhash64(col("doc_id")))
    val packed = Curation.packSequences(packable, "id", "tokens", budget = 256L)
    packed.count() shouldBe packable.filter(col("tokens").isNotNull).count() // every doc exactly once
    val overBudget = packed.groupBy("pack_id")
      .agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 256L && col("n") > 1L)
    overBudget.count() shouldBe 0L // no multi-doc pack exceeds the budget
  }

  test("day-over-day observability loop: profile → author → validate → drift vs state → diff vs snapshot") {
    import spark.implicits._
    import graft.engine.Profiler
    val dir = java.nio.file.Files.createTempDirectory("obs_loop").toString

    // DAY 1 — a healthy ingest slice: profile it ONCE (state persisted),
    // author the starter config ZERO-SCAN from the profile, and the
    // authored rules validate the same slice green — the cross-surface
    // self-consistency contract
    val day1 = (1 to 100).map(i =>
      (i.toLong, if (i % 3 == 0) "assistant" else "user", (i % 10) + 1.0))
      .toDF("id", "role", "score")
    Profiler.profileRun(day1, s"$dir/profiles/t", "day1")
    val cfgPath = s"$dir/suggested.yaml"
    Cli.writeSuggestedConfigFromProfiles(s"$dir/profiles", Seq("t"), Map.empty, cfgPath)
    val authored = graft.config.ConfigLoader.fromYamlFile(cfgPath, env = Map.empty)
      .enabledRules("t")
    authored should not be empty
    new Validator(spark, ValidationConfig())
      .executeRules(day1, authored, "t").results.filterNot(_.passed) shouldBe empty

    // DAY 2 — a corrupted ingest: the role vocabulary shifts toward a
    // foreign label, scores mutate on some keys, a block of keys vanishes
    // and new ones (outside yesterday's id range) appear
    val day2 = (11 to 110).map(i => (i.toLong,
        if (i % 2 == 0) "tool" else "user",
        if (i % 5 == 0) 99.0 else (i % 10) + 1.0))
      .toDF("id", "role", "score")
    val stateFile = new java.io.File(s"$dir/profiles/t").listFiles()
      .map(_.getPath).find(_.matches(".*state_.*\\.bin")).get
    val ops = Seq(
      // drift vs YESTERDAY'S PERSISTED STATE — no day-1 scan
      ValidationRule("role_drift", RuleType.drift, Seq("role"),
        parameters = Map("method" -> "tvd", "ref_state" -> stateFile,
          "critical" -> "0.2")),
      // keyed diff vs yesterday's snapshot, with column attribution
      ValidationRule("vs_yesterday", RuleType.Diff, Seq("id"),
        parameters = Map("ref_table" -> "day1", "attribute_columns" -> "true")))
    val v2 = new Validator(spark, ValidationConfig(),
      n => if (n == "day1") Some(day1) else None)
    val res2 = v2.executeRules(day2, authored ++ ops, "t")
      .results.map(r => r.rule_name -> r).toMap

    // each surface catches its own face of the corruption:
    res2("suggested_role_allowed_values").passed shouldBe false // foreign label
    res2("suggested_id_range").passed shouldBe false // ids beyond yesterday's bounds
    res2("suggested_role_completeness").passed shouldBe true // not missingness
    res2("role_drift").passed shouldBe false // distribution moved vs the state

    // and the diff NAMES the damage exactly: shared keys 11..100, of which
    // role changed on (i%3==0 ∨ i%2==0) and score on i%5==0; 10 keys
    // removed, 10 added, union universe 1..110
    val shared = 11 to 100
    val roleChanged = shared.count(i => i % 3 == 0 || i % 2 == 0)
    val scoreChanged = shared.count(_ % 5 == 0)
    val changedKeys = shared.count(i => i % 3 == 0 || i % 2 == 0 || i % 5 == 0)
    val d = res2("vs_yesterday")
    d.passed shouldBe false
    d.total_count shouldBe 110L
    d.failed_count shouldBe (changedKeys + 20).toLong
    d.metadata("changed_columns") shouldBe s"role=$roleChanged;score=$scoreChanged"
  }
}
