package graft

import graft.engine.Validator
import java.nio.file.Files

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  def df = Seq(
    (Some(1L), "a@x.com", 30),
    (None, "b@x.com", 40),
    (Some(3L), "bad-email", 200),
    (Some(3L), "c@x.com", 50)
  ).toDF("id", "email", "age")

  val rules = Seq(
    ValidationRule("id_complete", RuleType.Completeness, Seq("id")),
    ValidationRule("email_pattern", RuleType.Pattern, Seq("email"),
      expression = Some("^[a-z]+@[a-z.]+$")),
    ValidationRule("age_range", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120")),
    ValidationRule("id_unique", RuleType.Uniqueness, Seq("id")))

  test("violations() returns the exact violating row set per rule") {
    val v = new Validator(spark, ValidationConfig())
    v.violations(df, rules(0)).collect().map(_.getString(1)).toSet shouldBe Set("b@x.com")
    v.violations(df, rules(1)).collect().map(_.getString(1)).toSet shouldBe Set("bad-email")
    v.violations(df, rules(2)).collect().map(_.getInt(2)).toSet shouldBe Set(200)
    v.violations(df, rules(3)).count() shouldBe 2 // both id=3 rows
  }

  test("quarantine writes tagged violation rows for all rules in one pass") {
    val path = Files.createTempDirectory("quarantine").toString + "/q"
    val v = new Validator(spark, ValidationConfig())
    val outcome = v.quarantine(df, rules, path)
    outcome.written shouldBe 5 // 1 null-id + 1 bad-email + 1 age + 2 dup rows
    outcome.ruleErrors shouldBe empty
    val q = spark.read.parquet(path)
    q.columns should contain("__rule_name")
    q.groupBy("__rule_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("id_complete" -> 1L, "email_pattern" -> 1L, "age_range" -> 1L, "id_unique" -> 2L)
  }

  test("second quarantine run against the same sink counts only its own rows") {
    val path = Files.createTempDirectory("quarantine2").toString + "/q"
    val v = new Validator(spark, ValidationConfig())
    v.quarantine(df, rules, path).written shouldBe 5
    // the sink now holds 5 rows; a re-run must report 5 again (this run's
    // rows), not the cumulative 10 a sink re-read would produce
    v.quarantine(df, rules, path).written shouldBe 5
    spark.read.parquet(path).count() shouldBe 10
  }

  test("rules whose violation plan fails surface in ruleErrors, not silently dropped") {
    val path = Files.createTempDirectory("quarantine3").toString + "/q"
    val v = new Validator(spark, ValidationConfig()) // no tableResolver
    val broken = ValidationRule("fk", RuleType.Referential, Seq("id"),
      parameters = Map("ref_table" -> "nope"))
    val outcome = v.quarantine(df, rules :+ broken, path)
    outcome.written shouldBe 5
    outcome.ruleErrors.keySet shouldBe Set("fk")
    outcome.ruleErrors("fk") should include("nope")
  }

  test("drift rules contribute no quarantine rows (table-level verdicts)") {
    val v = new Validator(spark, ValidationConfig())
    val drift = ValidationRule("d", RuleType.drift, Seq("age"),
      parameters = Map("method" -> "chi_square", "ref_table" -> "x", "critical" -> "1"))
    v.violations(df, drift).count() shouldBe 0
  }
}
