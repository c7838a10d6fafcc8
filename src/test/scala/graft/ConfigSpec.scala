package graft

import graft.config.ConfigLoader
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ConfigSpec extends AnyFunSuite with Matchers {

  val yaml: String =
    """engine:
      |  type: spark
      |  options:
      |    spark.sql.adaptive.enabled: "true"
      |global_rules:
      |  - name: global_not_empty
      |    rule_type: custom
      |    expression: "SELECT COUNT(*) FROM {table} HAVING COUNT(*) = 0"
      |    severity: error
      |tables:
      |  - name: customers
      |    rules:
      |      - name: id_complete
      |        rule_type: completeness
      |        column: customer_id
      |        threshold: 0.9
      |      - name: disabled_rule
      |        rule_type: completeness
      |        column: x
      |        enabled: false
      |      - name: key_unique
      |        rule_type: uniqueness
      |        columns: [customer_id, region]
      |        severity: warning
      |""".stripMargin

  test("YAML parses into the full model") {
    val c = ConfigLoader.fromYamlString(yaml, env = Map.empty)
    c.engine.engineType shouldBe "spark"
    c.engine.options("spark.sql.adaptive.enabled") shouldBe "true"
    c.globalRules.map(_.name) shouldBe Seq("global_not_empty")
    c.tables.head.rules.size shouldBe 3
    c.tables.head.rules(2).columns shouldBe Seq("customer_id", "region")
  }

  test("enabled rules: global first, then table, disabled dropped (config.py:161-180)") {
    val c = ConfigLoader.fromYamlString(yaml, env = Map.empty)
    c.enabledRules("customers").map(_.name) shouldBe
      Seq("global_not_empty", "id_complete", "key_unique")
    c.enabledRules("unknown_table").map(_.name) shouldBe Seq("global_not_empty")
  }

  test("env override with VALIDATOR_ prefix and __ nesting (settings.py:54-63)") {
    val c = ConfigLoader.fromYamlString(yaml,
      env = Map("VALIDATOR_ENGINE__TYPE" -> "duckdb", "UNRELATED" -> "x"))
    c.engine.engineType shouldBe "duckdb"
  }

  test("caller override map beats env beats YAML (widget precedence, test_settings.py:8-41)") {
    // YAML says spark; env says duckdb; the caller map (the reference's
    // dbutils.widgets counterpart) says polars — widgets win
    val c = ConfigLoader.fromYamlString(yaml,
      env = Map("VALIDATOR_ENGINE__TYPE" -> "duckdb"),
      overrides = Map("engine__type" -> "polars"))
    c.engine.engineType shouldBe "polars"
    // without the caller map, env wins over YAML (unchanged)
    ConfigLoader.fromYamlString(yaml,
      env = Map("VALIDATOR_ENGINE__TYPE" -> "duckdb")).engine.engineType shouldBe "duckdb"
    // nested override paths expand like env keys
    ConfigLoader.expandKeys(Map("engine__type" -> "x")) shouldBe
      Map("engine" -> Map("type" -> "x"))
    // key case is preserved: overrides can target case-sensitive nested
    // keys (Spark conf names) — lowercasing would add a dead sibling
    val c2 = ConfigLoader.fromYamlString(
      "engine:\n  type: spark\n  options:\n    spark.executorEnv.FOO: old\n",
      env = Map.empty,
      overrides = Map("engine__options__spark.executorEnv.FOO" -> "new"))
    c2.engine.options("spark.executorEnv.FOO") shouldBe "new"
  }

  test("invalid engine type rejected (config.py:85-90)") {
    val e = intercept[IllegalArgumentException](EngineConfig(engineType = "invalid_engine"))
    e.getMessage should include("Engine type must be one of")
    // the reference's engine names plus this library's native one all pass
    Seq("spark", "pyspark", "databricks", "duckdb", "polars")
      .foreach(t => EngineConfig(engineType = t).engineType shouldBe t)
  }

  test("tableConfig accessor finds tables by name (config.py:154-159)") {
    val c = ConfigLoader.fromYamlString(yaml, env = Map.empty)
    c.tableConfig("customers").map(_.rules.size) shouldBe Some(3)
    c.tableConfig("missing") shouldBe None
  }

  test("config round-trips through YAML (save_to_yaml, config.py:144-151)") {
    val c = ConfigLoader.fromYamlString(yaml, env = Map.empty)
      .copy(stateFile = Some("/tmp/state.json"), requireSqlRules = false)
    val dumped = ConfigLoader.toYamlString(c)
    ConfigLoader.fromYamlString(dumped, env = Map.empty) shouldBe c
    // and a config with the full field surface survives too
    val full = ValidationConfig(
      engine = EngineConfig("duckdb", Map("path" -> ":memory:"), Map("threads" -> "4")),
      tables = Seq(TableConfig("t", Seq(
        ValidationRule("r1", RuleType.Range, Seq("v"),
          parameters = Map("min" -> "0", "max" -> "10"), threshold = Some(0.9)),
        ValidationRule("r2", RuleType.Custom, Nil,
          expression = Some("SELECT 1"), enabled = false)),
        source = Some("parquet:/tmp/x"), filterMode = true)),
      globalRules = Seq(ValidationRule("g", RuleType.Completeness, Seq("id"))),
      requireSqlRules = false, stateFile = None)
    ConfigLoader.fromYamlString(ConfigLoader.toYamlString(full), env = Map.empty) shouldBe full
  }

  test("rule tags: parse, round-trip, and selectTags scheduled-subset semantics") {
    val c = ConfigLoader.fromYamlString(
      """tables:
        |  - name: t1
        |    rules:
        |      - { name: fast, rule_type: completeness, column: id, tags: [hourly, critical] }
        |      - { name: slow, rule_type: uniqueness, column: id, tags: [nightly] }
        |      - { name: untagged, rule_type: row_count, parameters: { min_rows: "1" } }
        |  - name: t2
        |    rules:
        |      - { name: deep, rule_type: uniqueness, column: k, tags: [nightly] }
        |global_rules:
        |  - { name: g_fast, rule_type: completeness, column: id, tags: [hourly] }
        |""".stripMargin, env = Map.empty)
    c.tables.head.rules.head.tags shouldBe Seq("hourly", "critical")
    // round-trip identity includes tags
    ConfigLoader.fromYamlString(ConfigLoader.toYamlString(c), env = Map.empty) shouldBe c
    // hourly tier: tagged rules only; t2 (no hourly rules, but the hourly
    // GLOBAL rule applies to it) is kept
    val hourly = c.selectTags(Set("hourly"))
    hourly.globalRules.map(_.name) shouldBe Seq("g_fast")
    hourly.tables.map(_.name) shouldBe Seq("t1", "t2")
    hourly.tables.head.rules.map(_.name) shouldBe Seq("fast")
    // nightly tier: no matching global rule → t1/t2 keep only their own
    val nightly = c.selectTags(Set("nightly"))
    nightly.globalRules shouldBe empty
    nightly.tables.map(t => t.name -> t.rules.map(_.name)) shouldBe
      Seq("t1" -> Seq("slow"), "t2" -> Seq("deep"))
    // a tag nothing carries → no tables at all (run validates nothing,
    // loads nothing); empty selection is a config error, never silent
    c.selectTags(Set("weekly")).tables shouldBe empty
    intercept[IllegalArgumentException] { c.selectTags(Set.empty[String]) }
    intercept[IllegalArgumentException] { c.selectTags(" , ") } // csv form, all blank
    // the csv overload both CLIs share selects identically
    c.selectTags("hourly").tables.head.rules.map(_.name) shouldBe Seq("fast")
    // untagged rules run only in the unfiltered config
    c.enabledRules("t1").map(_.name) should contain ("untagged")
    hourly.enabledRules("t1").map(_.name) should not contain "untagged"
  }

  test("require_sql_rules rejects enabled rules without expression (config.py:182-193)") {
    val c = ConfigLoader.fromYamlString(yaml, env = Map.empty)
      .copy(requireSqlRules = true)
    val ex = intercept[IllegalArgumentException](c.validateSqlRules())
    ex.getMessage should include("id_complete")
    // config with only SQL rules passes
    val ok = ValidationConfig(
      globalRules = Seq(ValidationRule("r", RuleType.Custom, Seq(),
        expression = Some("SELECT 1"))),
      requireSqlRules = true)
    noException should be thrownBy ok.validateSqlRules()
  }

  test("threshold outside [0,1] rejected (config.py:51-55)") {
    intercept[IllegalArgumentException] {
      ValidationRule("bad", RuleType.Completeness, Seq("c"), threshold = Some(1.5))
    }
  }

  test("shipped example config parses and covers the full rule vocabulary") {
    val c = ConfigLoader.fromYamlFile("examples/transcripts_config.yaml", env = Map.empty)
    c.tables.map(_.name) shouldBe Seq("transcripts")
    val types = c.enabledRules("transcripts").map(_.ruleType).toSet
    types shouldBe Set(RuleType.Custom, RuleType.Completeness, RuleType.Pattern,
      RuleType.Range, RuleType.TypeConformance, RuleType.Uniqueness,
      RuleType.Referential, RuleType.drift, RuleType.Outlier, RuleType.SchemaDrift,
      RuleType.AllowedValues, RuleType.Freshness, RuleType.Sequence,
      RuleType.Monotonic, RuleType.RowCount, RuleType.Cardinality,
      RuleType.Predicate, RuleType.Correlation, RuleType.Entropy,
      RuleType.Reconciliation, RuleType.FunctionalDependency, RuleType.Quantile,
      RuleType.Diff, RuleType.Transition)
    // the drift rules in the shipped example cover every implemented method
    val methods = c.enabledRules("transcripts").filter(_.ruleType == RuleType.drift)
      .flatMap(_.param("method")).toSet
    methods shouldBe Set("chi_square", "ks", "tvd", "psi", "js")
    c.stateFile shouldBe defined
    // partition verdicts from the config surface
    c.tables.head.partitionBy shouldBe Some("conv_id")
    c.tables.head.partitionBuckets shouldBe 32
    // non-default buckets parse for real (32 is also the fallback, so the
    // shipped assertion above can't see a silently-dropped value) and a
    // negative or non-numeric count fails fast with the key named
    val y = "tables:\n  - name: t\n    partition_by: k\n    partition_buckets: 16\n"
    ConfigLoader.fromYamlString(y, env = Map.empty).tables.head.partitionBuckets shouldBe 16
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYamlString(y.replace("16", "-4"), env = Map.empty)
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYamlString(y.replace("16", "lots"), env = Map.empty)
    }
    // sampled tier from the config surface: parses, round-trips, fails fast
    // on an out-of-range or non-numeric rate
    val sy = "tables:\n  - name: t\n    sample_by: uid\n    sample_permille: 300\n"
    val sc = ConfigLoader.fromYamlString(sy, env = Map.empty)
    sc.tables.head.sampleBy shouldBe Some("uid")
    sc.tables.head.samplePermille shouldBe 300
    val rt = ConfigLoader.fromYamlString(ConfigLoader.toYamlString(sc), env = Map.empty)
    rt.tables.head.sampleBy shouldBe Some("uid")
    rt.tables.head.samplePermille shouldBe 300
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYamlString(sy.replace("300", "1500"), env = Map.empty)
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYamlString(sy.replace("300", "most"), env = Map.empty)
    }
    // a rate without a key is inert — fail loud at parse, not silently
    // validate at full cost
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYamlString(
        "tables:\n  - name: t\n    sample_permille: 300\n", env = Map.empty)
    }
  }

  test("invalid severity rejected (config.py:44-49)") {
    intercept[IllegalArgumentException] {
      ValidationRule("bad", RuleType.Completeness, Seq("c"), severity = "critical")
    }
  }
}
