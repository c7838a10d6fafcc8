package graft

import graft.config.ConfigLoader
import graft.engine.{Suggest, Validator}

/** Constraint suggestion: the rules derived from a table must (a) name
  * exactly the contracts the data supports, (b) PASS when executed on the
  * same data (self-consistency — the Deequ suggestion contract), and
  * (c) round-trip through the YAML config surface. */
class SuggestSpec extends SparkSpec {
  import spark.implicits._

  private def byKey(s: Seq[Suggest.Suggestion]) =
    s.map(x => (x.column, x.ruleType) -> x).toMap

  test("suggests the contracts the data supports, and only those") {
    val df = Seq(
      (1L, "a", 10.0, "7", Option("x")),
      (2L, "b", 20.0, "8", Option("y")),
      (3L, "a", 30.0, "9", Option.empty[String])
    ).toDF("id", "cat", "amt", "num_str", "opt")
    val s = byKey(Suggest.suggest(df))

    // id: complete, unique, bounded
    s((("id"), RuleType.Completeness)).reason should include("no NULLs")
    s(("id", RuleType.Uniqueness)).reason shouldBe "all 3 rows distinct"
    s(("id", RuleType.Range)).minValue shouldBe Some(1.0)
    s(("id", RuleType.Range)).maxValue shouldBe Some(3.0)
    // cat: complete, small closed vocabulary; NOT unique, NOT numeric-castable
    s(("cat", RuleType.AllowedValues)).allowed shouldBe Some("a,b")
    s.get(("cat", RuleType.Uniqueness)) shouldBe None
    s.get(("cat", RuleType.TypeConformance)) shouldBe None
    s.get(("cat", RuleType.Range)) shouldBe None
    // amt: numeric bounds + uniqueness (all values distinct)
    s(("amt", RuleType.Range)).minValue shouldBe Some(10.0)
    s(("amt", RuleType.Range)).maxValue shouldBe Some(30.0)
    s.get(("amt", RuleType.Uniqueness)) shouldBe defined
    // num_str: a string column that is secretly integers
    s(("num_str", RuleType.TypeConformance)).reason should include("bigint")
    s(("num_str", RuleType.AllowedValues)).allowed shouldBe Some("7,8,9")
    // opt: 1/3 NULL is above the default 5% budget → no completeness rule,
    // but the non-null vocabulary is still a valid set contract
    s.get(("opt", RuleType.Completeness)) shouldBe None
    s(("opt", RuleType.AllowedValues)).allowed shouldBe Some("x,y")

    // SELF-CONSISTENCY: every suggested rule passes on the data it came from
    val v = new Validator(spark, ValidationConfig())
    val summary = v.executeRules(df, Suggest.suggestRules(df), "t")
    summary.results.filterNot(_.passed) shouldBe empty
    summary.results should not be empty
  }

  test("gates: NaN suppresses range, commas and cardinality suppress allowed_values") {
    val nan = Seq(1.0, Double.NaN, 3.0).toDF("x")
    val sn = byKey(Suggest.suggest(nan))
    sn.get(("x", RuleType.Range)) shouldBe None // NaN would fail its own rule
    sn.get(("x", RuleType.Completeness)) shouldBe None // NaN counts as missing (1/3 > 5%)

    val commas = Seq("a,b", "c").toDF("v")
    byKey(Suggest.suggest(commas)).get(("v", RuleType.AllowedValues)) shouldBe None
    // the validator's comma-list parser TRIMS entries: a value with outer
    // whitespace would round-trip different and fail its own rule
    val padded = Seq("a ", "b").toDF("v")
    byKey(Suggest.suggest(padded)).get(("v", RuleType.AllowedValues)) shouldBe None

    val wide = (1 to 100).map(i => s"v$i").toDF("v")
    byKey(Suggest.suggest(wide)).get(("v", RuleType.AllowedValues)) shouldBe None

    // a tolerable NULL rate becomes a FLOORED threshold that still passes
    val mostly = (1 to 99).map(i => Option(i.toLong)).toDF("k")
      .union(Seq(Option.empty[Long]).toDF("k"))
    val sm = byKey(Suggest.suggest(mostly))
    sm(("k", RuleType.Completeness)).threshold shouldBe Some(0.99)
    val v = new Validator(spark, ValidationConfig())
    v.executeRules(mostly, Suggest.suggestRules(mostly), "t")
      .results.filterNot(_.passed) shouldBe empty

    Suggest.suggest(spark.emptyDataFrame.limit(0)) shouldBe empty
    Suggest.suggest(Seq.empty[(Long, String)].toDF("a", "b")) shouldBe empty

    // the default sweep SKIPS only map-containing columns (xxhash64 /
    // approx_count_distinct reject maps — one would kill the authoring
    // run); arrays and structs stay in, completeness is a valid contract
    // for them
    val withMap = Seq((1L, Map("k" -> "v"), Seq("a"), ("x", 1)),
        (2L, Map("k" -> "w"), Seq("b"), ("y", 2)))
      .toDF("id", "attrs", "tags", "pair")
    val sMap = Suggest.suggest(withMap)
    sMap.map(_.column).toSet shouldBe Set("id", "tags", "pair")
    sMap.filter(_.column == "tags").map(_.ruleType) should
      contain(RuleType.Completeness)
  }

  test("zero-scan suggestion from a persisted profile state") {
    import graft.engine.Profiler
    val df = Seq((1L, "a", "7"), (2L, "b", "8"), (3L, "a", "9"))
      .toDF("id", "cat", "num_str")
    val dir = java.nio.file.Files.createTempDirectory("suggest_state")
    val path = dir.resolve("state.bin").toString
    Profiler.writeState(Profiler.profileState(df), path)

    // the state travels: suggest from the REOPENED file, no data scan
    val s = byKey(Suggest.fromState(Profiler.readState(path)))
    s(("id", RuleType.Completeness)).reason should include("no NULLs")
    s(("id", RuleType.Range)).minValue shouldBe Some(1.0)
    s(("id", RuleType.Range)).maxValue shouldBe Some(3.0)
    s(("cat", RuleType.AllowedValues)).allowed shouldBe Some("a,b")
    s(("num_str", RuleType.TypeConformance)).reason should include("bigint")
    // exactness contract: uniqueness is never emitted from a state (HLL
    // cannot certify it)
    s.keys.map(_._2) should not contain RuleType.Uniqueness

    // self-consistency holds for state-derived rules too
    val rules = Suggest.fromState(Profiler.readState(path)).map(_.rule("state"))
    val v = new graft.engine.Validator(spark, ValidationConfig())
    v.executeRules(df, rules, "t").results.filterNot(_.passed) shouldBe empty

    // a purged value sketch (too many distinct values) yields NO
    // allowed_values / type_conformance — never an approximate one
    val wide = (1 to 2000).map(i => s"v$i").toDF("v")
    val sw = byKey(Suggest.fromState(Profiler.profileState(wide)))
    sw.get(("v", RuleType.AllowedValues)) shouldBe None
    sw.get(("v", RuleType.TypeConformance)) shouldBe None
    sw.get(("v", RuleType.Completeness)) shouldBe defined
  }

  test("fromState with a baseline path authors drift monitoring rules (the profile IS the baseline)") {
    import graft.engine.{Profiler, Validator}
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("id", "cat", "score")
    val dir = java.nio.file.Files.createTempDirectory("suggest_drift")
    val path = dir.resolve("baseline.bin").toString
    Profiler.writeState(Profiler.profileState(df), path)
    val s = byKey(Suggest.fromState(Profiler.readState(path), refStatePath = Some(path)))
    // categorical face: exact value sketch → tvd vs the state itself
    val catDrift = s(("cat", RuleType.drift))
    catDrift.extraParams("method") shouldBe "tvd"
    catDrift.extraParams("ref_state") shouldBe path
    // integral with an exact sketch prefers the categorical face
    s(("id", RuleType.drift)).extraParams("method") shouldBe "tvd"
    // floating column: value spellings diverge → ks over the KLL CDF
    val scoreDrift = s(("score", RuleType.drift))
    scoreDrift.extraParams("method") shouldBe "ks"
    scoreDrift.extraParams("lo").toDouble shouldBe 1.5
    scoreDrift.extraParams("hi").toDouble shouldBe 3.5
    // a purged integral sketch falls back to ks
    val wideNum = spark.range(200000).selectExpr("id AS n")
    val p2 = dir.resolve("wide.bin").toString
    Profiler.writeState(Profiler.profileState(wideNum), p2)
    byKey(Suggest.fromState(Profiler.readState(p2), refStatePath = Some(p2)))(
      ("n", RuleType.drift)).extraParams("method") shouldBe "ks"
    // self-consistency: every authored rule (incl. drift vs the state's
    // own data) passes on the source
    val rules = Suggest.fromState(Profiler.readState(path),
      refStatePath = Some(path)).map(_.rule("state"))
    rules.map(_.ruleType) should contain (RuleType.drift)
    new Validator(spark, ValidationConfig())
      .executeRules(df, rules, "t").results.filterNot(_.passed) shouldBe empty
    // no path → no drift rules (unchanged zero-scan surface)
    Suggest.fromState(Profiler.readState(path)).map(_.ruleType) should
      not contain RuleType.drift
  }

  test("lifetimeState anchors the lineage on the newest state by mtime, not filename order") {
    import graft.engine.Profiler
    import java.nio.file.{Files => F, Paths}
    import java.nio.file.attribute.FileTime
    val dir = F.createTempDirectory("lineage").toString
    // run ids are random UUIDs: the RETIRED schema's file can sort last by
    // name — the anchor must follow recency (mtime), not the name walk
    val oldSchema = Seq((1, "x")).toDF("a", "b")
    val newSchema = Seq((1L, 2L)).toDF("a", "c")
    Profiler.writeState(Profiler.profileState(oldSchema), s"$dir/state_zzz.bin")
    Profiler.writeState(Profiler.profileState(newSchema), s"$dir/state_aaa.bin")
    F.setLastModifiedTime(Paths.get(s"$dir/state_zzz.bin"), FileTime.fromMillis(1000000L))
    F.setLastModifiedTime(Paths.get(s"$dir/state_aaa.bin"), FileTime.fromMillis(2000000L))
    Profiler.lifetimeState(dir).get.columns shouldBe Seq("a", "c")
    Profiler.lifetimeState(F.createTempDirectory("empty").toString) shouldBe None

    // flattened mtimes + mixed name generations (legacy unpadded vs
    // padded): the digit-normalized tie-break compares runs NUMERICALLY,
    // so batch 150 beats legacy batch 9 even though '9' > '0' lexically
    val dir2 = F.createTempDirectory("lineage2").toString
    Profiler.writeState(Profiler.profileState(oldSchema), s"$dir2/state_batch-9.bin")
    Profiler.writeState(Profiler.profileState(newSchema), s"$dir2/state_batch-000000000150.bin")
    Seq("state_batch-9.bin", "state_batch-000000000150.bin").foreach(n =>
      F.setLastModifiedTime(Paths.get(s"$dir2/$n"), FileTime.fromMillis(5000000L)))
    Profiler.lifetimeState(dir2).get.columns shouldBe Seq("a", "c")
  }

  test("suggested rules round-trip through the YAML config surface") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val rules = Suggest.suggestRules(df, prefix = "auto")
    val cfg = ValidationConfig(tables = Seq(TableConfig("t", rules)))
    val back = ConfigLoader.fromYamlString(ConfigLoader.toYamlString(cfg), env = Map.empty)
    back.enabledRules("t") shouldBe rules
    // and the reloaded config still validates green on the source data
    val v = new Validator(spark, back)
    v.executeRules(df, back.enabledRules("t"), "t")
      .results.filterNot(_.passed) shouldBe empty
  }

  test("fromSnapManifest: zero-read suggestions, evolution NULLs counted, all-null file can't block range") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("snap-suggest").toString
    // v1: 100 rows without 'extra'; v2 appends 100 rows with it, 4 nulls
    graft.io.SnapTable.create(spark, dir,
      spark.range(0, 100).select(col("id"),
        concat(lit("u"), col("id")).as("name")))
    graft.io.SnapTable.append(spark, dir,
      spark.range(100, 200).select(col("id"),
        concat(lit("u"), col("id")).as("name"),
        when(col("id") % 25 === 0, lit(null)).otherwise(col("id") * 2).as("extra")))
    // v3: a file that is ALL-null for 'extra' — bounds nothing, blocks nothing
    graft.io.SnapTable.append(spark, dir,
      spark.range(200, 210).select(col("id"),
        concat(lit("u"), col("id")).as("name"),
        lit(null).cast("long").as("extra")))
    val snap = graft.io.SnapTable.snapshot(spark, dir)
    val by = Suggest.fromSnapManifest(snap, maxNullRate = 0.9)
      .map(g => (g.column, g.ruleType) -> g).toMap
    // id: complete + bounded
    by(("id", RuleType.Completeness)).threshold shouldBe None
    by(("id", RuleType.Range)).minValue shouldBe Some(0.0)
    by(("id", RuleType.Range)).maxValue shouldBe Some(209.0)
    // extra: evolution nulls (100) + real nulls (4) + all-null file (10) of 210
    val extra = by(("extra", RuleType.Completeness))
    extra.threshold shouldBe Some(math.floor(100.0 * 96 / 210) / 100.0)
    // range from the one bounded file only — the stat-less v1 files and the
    // all-null v3 file bound nothing and block nothing
    by(("extra", RuleType.Range)).minValue shouldBe Some(202.0)
    by(("extra", RuleType.Range)).maxValue shouldBe Some(398.0)
    // string column: completeness only, never a range
    by.get(("name", RuleType.Range)) shouldBe None
    // the authored rules validate green on the table itself (suggestion
    // self-consistency, the family contract)
    val rules = Suggest.fromSnapManifest(snap, maxNullRate = 0.9).map(_.rule("m"))
    new Validator(spark, ValidationConfig())
      .executeRules(graft.io.SnapTable.read(spark, dir), rules, "t")
      .results.filterNot(_.passed) shouldBe empty
  }

  test("transitionGrammar: learns the DFA from data, prunes with a floored threshold, refuses non-grammar columns") {
    import spark.implicits._
    val df = Seq(
      ("a", 0, "u"), ("a", 1, "v"), ("a", 2, "u"), // u→v→u
      ("b", 0, "u"), ("b", 1, "v"),                // u→v
      ("c", 0, "u"), ("c", 1, "x")                 // u→x: the rare edge
    ).toDF("k", "i", "r")
    val v = new Validator(spark, ValidationConfig())

    // minSupport=1: every observed fact is allowed — exact grammar, no
    // threshold, and the rule passes on its own source with zero failures
    val full = Suggest.transitionGrammar(df, Seq("k"), "i", "r").get
    full.ruleType shouldBe RuleType.Transition
    full.parameters("pairs") shouldBe "u->v,u->x,v->u"
    full.parameters("first") shouldBe "u"
    full.parameters("last") shouldBe "u,v,x"
    full.threshold shouldBe None
    val r1 = v.executeRules(df, Seq(full), "t").results.head
    r1.passed shouldBe true
    r1.failed_count shouldBe 0L

    // minSupport=2 prunes u→x and every last state (all support 1): the
    // grammar keeps u→v + first=u, omits last, and the threshold floors to
    // the observed pass rate under the PRUNED grammar (a: v→u bad, c: u→x
    // bad → 1 of 3 groups pass → floor(100/3)/100)
    val pruned = Suggest.transitionGrammar(df, Seq("k"), "i", "r", minSupport = 2L).get
    pruned.parameters("pairs") shouldBe "u->v"
    pruned.parameters("first") shouldBe "u"
    pruned.parameters.get("last") shouldBe None
    pruned.threshold shouldBe Some(0.33)
    val r2 = v.executeRules(df, Seq(pruned), "t").results.head
    r2.passed shouldBe true // self-consistency survives pruning
    r2.failed_count shouldBe 2L
    r2.total_count shouldBe 3L

    // refusals — None, never an unusable rule
    Suggest.transitionGrammar(df, Seq("k"), "i", "r", maxStates = 2) shouldBe None
    Suggest.transitionGrammar(df.limit(0), Seq("k"), "i", "r") shouldBe None
    Suggest.transitionGrammar(df, Seq("k"), "i", "r", minSupport = 100L) shouldBe None
    Suggest.transitionGrammar(
      Seq(("a", 0, "p->q"), ("a", 1, "z")).toDF("k", "i", "r"),
      Seq("k"), "i", "r") shouldBe None
    Suggest.transitionGrammar(
      Seq(("a", 0, "p,q"), ("a", 1, "z")).toDF("k", "i", "r"),
      Seq("k"), "i", "r") shouldBe None
  }
}
