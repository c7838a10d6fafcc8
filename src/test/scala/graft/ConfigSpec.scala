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
      RuleType.Referential, RuleType.drift, RuleType.Outlier)
    c.stateFile shouldBe defined
  }

  test("invalid severity rejected (config.py:44-49)") {
    intercept[IllegalArgumentException] {
      ValidationRule("bad", RuleType.Completeness, Seq("c"), severity = "critical")
    }
  }
}
