package graft

import graft.engine.{RulePlanner, Validator}
import org.apache.spark.sql.DataFrame

/** Ports the reference's integration fixture and asserts identical rule
  * outcomes (see /root/repo/FIXTURES.md §1, derived from
  * /root/reference/tests/test_integration.py:18-123). */
class RuleSemanticsSpec extends SparkSpec {
  import spark.implicits._

  /** 10-row customers frame with seeded defects: row 4 null id, row 5 null
    * name, row 3 invalid email, row 9 age 155. */
  def customers: DataFrame = Seq(
    (Some(1L), Some("Alice"), "alice@example.com", 25, 88, "active"),
    (Some(2L), Some("Bob"), "bob@example.com", 34, 72, "active"),
    (Some(3L), Some("Carol"), "invalid-email", 41, 95, "inactive"),
    (Some(4L), None, "dave@example.com", 29, 60, "active"),
    (None, Some("Eve"), "eve@example.com", 52, 81, "active"),
    (Some(6L), Some("Frank"), "frank@example.com", 47, 77, "inactive"),
    (Some(7L), Some("Grace"), "grace@example.com", 36, 90, "active"),
    (Some(8L), Some("Heidi"), "heidi@example.com", 63, 55, "active"),
    (Some(9L), Some("Ivan"), "ivan@example.com", 155, 66, "active"),
    (Some(10L), Some("Judy"), "judy@example.com", 28, 99, "active")
  ).toDF("customer_id", "name", "email", "age", "score", "status")

  val emailRe = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"

  def rules: Seq[ValidationRule] = Seq(
    ValidationRule("customer_id_completeness", RuleType.Completeness, Seq("customer_id"),
      threshold = Some(0.9), severity = Severity.Error),
    ValidationRule("name_completeness", RuleType.Completeness, Seq("name"),
      threshold = Some(0.8), severity = Severity.Warning),
    ValidationRule("email_pattern", RuleType.Pattern, Seq("email"),
      expression = Some(emailRe), threshold = Some(0.9), severity = Severity.Warning),
    ValidationRule("age_range", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120"), threshold = Some(0.95), severity = Severity.Error),
    ValidationRule("score_range", RuleType.Range, Seq("score"),
      parameters = Map("min" -> "0", "max" -> "100"), threshold = Some(1.0), severity = Severity.Error)
  )

  def runSuite(): Map[String, ValidationResult] = {
    val validator = new Validator(spark, ValidationConfig())
    validator.executeRules(customers, rules, "customers").results
      .map(r => r.rule_name -> r).toMap
  }

  test("reference integration fixture: exact failed counts and verdicts") {
    val r = runSuite()
    r("customer_id_completeness").failed_count shouldBe 1
    r("customer_id_completeness").total_count shouldBe 10
    r("customer_id_completeness").passed shouldBe true // 0.9 >= 0.9
    r("name_completeness").failed_count shouldBe 1
    r("name_completeness").passed shouldBe true
    r("email_pattern").failed_count shouldBe 1
    r("email_pattern").passed shouldBe true
    r("age_range").failed_count shouldBe 1
    r("age_range").passed shouldBe false // 0.9 < 0.95
    r("score_range").failed_count shouldBe 0
    r("score_range").passed shouldBe true
  }

  test("success_rate formula and message format match the reference") {
    val r = runSuite()
    r("age_range").success_rate shouldBe 0.9 +- 1e-12
    r("age_range").message shouldBe
      "Rule 'age_range': 1/10 failed records (success rate: 90.00%, threshold: 95.00%)"
    // threshold None → no suffix
    val noThresh = ValidationResult.verdict(
      ValidationRule("x", RuleType.Completeness, Seq("c")), 3, 10, 0.0)
    noThresh.message shouldBe "Rule 'x': 3/10 failed records"
    noThresh.passed shouldBe false
    // threshold 0.0: the VERDICT compares the rate (`is not None`,
    // pyspark_engine.py:130-133 — rate >= 0.0 is always true, so it passes
    // even with failures); python truthiness suppresses only the MESSAGE
    // suffix (pyspark_engine.py:141-143)
    val zeroThresh = ValidationResult.verdict(
      ValidationRule("x", RuleType.Completeness, Seq("c"), threshold = Some(0.0)), 7, 10, 0.0)
    zeroThresh.message shouldBe "Rule 'x': 7/10 failed records"
    zeroThresh.passed shouldBe true
  }

  test("empty input: success_rate 1.0, passes without threshold") {
    val v = ValidationResult.verdict(ValidationRule("e", RuleType.Range, Seq("c"),
      parameters = Map("min" -> "0", "max" -> "1")), 0, 0, 0.0)
    v.success_rate shouldBe 1.0
    v.passed shouldBe true
  }

  test("summary math matches engines/__init__.py:89-107") {
    val validator = new Validator(spark, ValidationConfig())
    val s = validator.executeRules(customers, rules, "customers")
    s.total_rules shouldBe 5
    s.passed_rules shouldBe 4
    s.failed_rules shouldBe 1
    s.error_rules shouldBe 1 // age_range failed with severity error
    s.warning_rules shouldBe 0 // no failed warnings
    s.overall_success_rate shouldBe 0.8 +- 1e-12
  }

  test("filter mode removes defective rows (6 of 10 remain)") {
    val filtered = RulePlanner.applyFilters(customers, rules)
    filtered.count() shouldBe 6
  }

  test("monotonic filter keeps the monotone walk (greedy, first row survives)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 0, 10L), ("a", 1, 5L), ("a", 2, 12L), ("a", 3, 11L), // keep 10, drop 5, keep 12, drop 11
      ("b", 0, 7L)                                               // single row survives
    ).toDF("k", "o", "v")
    val rule = ValidationRule("m", RuleType.Monotonic, Seq("k"),
      parameters = Map("order_by" -> "o", "value" -> "v"))
    val out = RulePlanner.applyFilters(df, Seq(rule))
    out.orderBy("k", "o").collect().map(r => (r.getString(0), r.getLong(2))).toSeq shouldBe
      Seq(("a", 10L), ("a", 12L), ("b", 7L))
    // the cleaned data re-validates clean under the same rule
    val v = new Validator(spark, ValidationConfig())
    v.executeRules(out, Seq(rule), "t").results.head.failed_count shouldBe 0
    // without order_by/value parameters the rule passes data through
    RulePlanner.applyFilters(df,
      Seq(ValidationRule("m2", RuleType.Monotonic, Seq("k")))).count() shouldBe 5
    // a direction typo is rejected in filter mode too — it must not
    // silently clean against the wrong invariant
    intercept[IllegalArgumentException] {
      RulePlanner.applyFilters(df, Seq(ValidationRule("m3", RuleType.Monotonic, Seq("k"),
        parameters = Map("order_by" -> "o", "value" -> "v", "direction" -> "descending"))))
    }
    // a HALF-specified rule (value key typo'd away) raises rather than
    // silently passing dirty data through as "cleaned"
    intercept[IllegalArgumentException] {
      RulePlanner.applyFilters(df, Seq(ValidationRule("m4", RuleType.Monotonic, Seq("k"),
        parameters = Map("order_by" -> "o", "valu" -> "v"))))
    }
  }

  test("predicate rule: compliance fused into the single pass, NULL fails, blast radius isolated") {
    val validator = new Validator(spark, ValidationConfig())
    // Ivan (155) violates the age clause; Eve's NULL customer_id makes the
    // predicate NULL — which FAILS under compliance semantics
    val pred = ValidationRule("age_sane", RuleType.Predicate, Seq(),
      expression = Some("customer_id < 100 AND age < 150"))
    val completeness = ValidationRule("name_complete", RuleType.Completeness, Seq("name"))
    val rs = validator.executeRules(customers, Seq(pred, completeness), "t").results
    rs(0).failed_count shouldBe 2 // 155 violates; NULL predicate fails (compliance)
    rs(0).metadata.get("fused") shouldBe Some("true") // rode the single pass
    // filter mode keeps satisfying rows (null-rejecting)
    RulePlanner.applyFilters(customers, Seq(pred)).count() shouldBe 8
    // a predicate referencing a missing column fails ITS OWN rule — the
    // other fused rule still gets its real verdict (no blast radius)
    val broken = ValidationRule("typo", RuleType.Predicate, Seq(),
      expression = Some("agee < 150"))
    val rs2 = validator.executeRules(customers, Seq(broken, completeness), "t").results
    rs2(0).failed_count shouldBe -1
    rs2(0).message should include ("Rule execution failed")
    rs2(1).failed_count shouldBe 1 // completeness unharmed, real verdict
    // a non-Boolean expression is likewise isolated
    validator.executeRules(customers, Seq(ValidationRule("notbool", RuleType.Predicate,
      Seq(), expression = Some("age"))), "t").results.head.failed_count shouldBe -1
    // an AGGREGATE predicate analyzes to Boolean in a bare SELECT but is
    // illegal inside the fused sum(when(...)) — the plan-shape guard keeps
    // it out of the shared job, so only ITS rule fails
    val aggPred = ValidationRule("aggpred", RuleType.Predicate, Seq(),
      expression = Some("count(*) >= 1"))
    val rs3 = validator.executeRules(customers, Seq(aggPred, completeness), "t").results
    rs3(0).failed_count shouldBe -1
    rs3(1).failed_count shouldBe 1 // unharmed
    // a predicate that RAISES AT RUNTIME under ANSI (statically clean)
    // fails the shared job — the recovery path re-runs each fused rule in
    // isolation, so the healthy rule still gets its real verdict
    val runtimeBomb = ValidationRule("bomb", RuleType.Predicate, Seq(),
      expression = Some("1/(age-25) > 0")) // Alice's age=25 divides by zero
    val rs4 = validator.executeRules(customers, Seq(runtimeBomb, completeness), "t").results
    rs4(0).failed_count shouldBe -1
    rs4(1).failed_count shouldBe 1 // recovered, real verdict
    // missing expression errors cleanly
    validator.executeRules(customers, Seq(ValidationRule("noexpr", RuleType.Predicate,
      Seq())), "t").results.head.failed_count shouldBe -1
  }

  test("examples: N — failed rules attach sample violating rows to metadata") {
    val validator = new Validator(spark, ValidationConfig())
    val range = ValidationRule("age_range", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120", "examples" -> "2"))
    val r = validator.executeRules(customers, Seq(range), "t").results.head
    r.failed_count should be > 0L
    r.metadata("examples") should include ("age=155") // the seeded defect, named
    // a PASSING rule attaches nothing — including one that passes its
    // THRESHOLD while tolerating violations (no capture job for it)
    val pass = ValidationRule("age_ok", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "-1000", "max" -> "1000", "examples" -> "2"))
    validator.executeRules(customers, Seq(pass), "t")
      .results.head.metadata.contains("examples") shouldBe false
    val tolerated = ValidationRule("age_tolerant", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120", "examples" -> "2"),
      threshold = Some(0.5))
    val tr = validator.executeRules(customers, Seq(tolerated), "t").results.head
    tr.passed shouldBe true
    tr.failed_count should be > 0L
    tr.metadata.contains("examples") shouldBe false
    // examples: "0" disables capture entirely
    val off = ValidationRule("age_off", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120", "examples" -> "0"))
    validator.executeRules(customers, Seq(off), "t")
      .results.head.metadata.contains("examples") shouldBe false
    // a capture error (malformed examples value) degrades to a note and
    // never changes the verdict
    val bad = ValidationRule("age_badn", RuleType.Range, Seq("age"),
      parameters = Map("min" -> "0", "max" -> "120", "examples" -> "two"))
    val br = validator.executeRules(customers, Seq(bad), "t").results.head
    br.failed_count should be > 0L // verdict stands
    br.metadata.contains("examples_error") shouldBe true
    // a drift rule erroring on its own (missing ref_table) is untouched by
    // the examples machinery (sentinel result, no capture attempted)
    val noFace = ValidationRule("drifty", RuleType.drift, Seq("age"),
      parameters = Map("method" -> "chi_square", "ref_table" -> "missing",
        "examples" -> "2"))
    validator.executeRules(customers, Seq(noFace), "t")
      .results.head.failed_count shouldBe -1
  }

  test("error path: bad rule → sentinel result, severity forced to error") {
    val validator = new Validator(spark, ValidationConfig())
    val bad = ValidationRule("broken", RuleType.Custom, Seq(),
      expression = Some("SELECT nonexistent_fn(1) FROM {table}"), severity = Severity.Warning)
    val r = validator.executeRules(customers, Seq(bad), "customers").results.head
    r.passed shouldBe false
    r.failed_count shouldBe -1
    r.total_count shouldBe -1
    r.success_rate shouldBe 0.0
    r.severity shouldBe Severity.Error
    r.message should startWith("Rule execution failed:")
  }

  test("custom rule: pyspark rows-returned vs duckdb first-scalar conventions") {
    val validator = new Validator(spark, ValidationConfig())
    val rows = ValidationRule("neg_rows", RuleType.Custom, Seq(),
      expression = Some("SELECT * FROM {table} WHERE age > 100"))
    val scalar = ValidationRule("neg_scalar", RuleType.CustomAgg, Seq(),
      expression = Some("SELECT COUNT(*) FROM {table} WHERE age > 100"))
    val rs = validator.executeRules(customers, Seq(rows, scalar), "t").results
    rs(0).failed_count shouldBe 1 // one row returned
    rs(1).failed_count shouldBe 1 // scalar count
  }

  test("uniqueness counts NULL as one distinct value (pyspark semantics)") {
    val df = Seq(Some(1), Some(1), Some(2), None, None).toDF("k")
    val validator = new Validator(spark, ValidationConfig())
    val r = validator.executeRules(df,
      Seq(ValidationRule("u", RuleType.Uniqueness, Seq("k"))), "t").results.head
    // distinct values = {1, 2, NULL} = 3 → failed = 5 - 3 = 2
    r.failed_count shouldBe 2
  }

  test("allowed_values: NULLs conform, membership is cast-to-string, fuses") {
    val validator = new Validator(spark, ValidationConfig())
    val rule = ValidationRule("status_allowed", RuleType.AllowedValues, Seq("status"),
      parameters = Map("values" -> "active,inactive"))
    val r = validator.executeRules(customers, Seq(rule), "t").results.head
    r.failed_count shouldBe 0
    r.total_count shouldBe 10
    // a non-member and a NULL: only the non-member fails
    val df = Seq(Some("active"), Some("ACTIVE"), None).toDF("status")
    val r2 = validator.executeRules(df, Seq(rule), "t").results.head
    r2.failed_count shouldBe 1 // exact match: "ACTIVE" is not in the set
    // numeric columns compare via their string form — one config spelling
    // works for integer categoricals too
    val num = Seq(Some(1), Some(2), Some(7), None).toDF("code")
    val r3 = validator.executeRules(num,
      Seq(ValidationRule("code_allowed", RuleType.AllowedValues, Seq("code"),
        parameters = Map("values" -> "1,2,3"))), "t").results.head
    r3.failed_count shouldBe 1 // only 7
    // filter mode keeps members, drops non-members AND nulls (range convention)
    val kept = RulePlanner.applyFilters(df, Seq(rule)).collect().map(_.getString(0))
    kept.toSeq shouldBe Seq("active")
    // missing values parameter surfaces as the rule's error result
    val bad = validator.executeRules(df,
      Seq(ValidationRule("no_values", RuleType.AllowedValues, Seq("status"))), "t").results.head
    bad.failed_count shouldBe -1
  }

  test("freshness: rows older than reference_time - max_age fail; NULL conforms") {
    import java.sql.Timestamp
    val validator = new Validator(spark, ValidationConfig())
    val df = Seq(
      (1L, Some(Timestamp.valueOf("2024-02-28 12:00:00"))), // 1.5 d old: fresh
      (2L, Some(Timestamp.valueOf("2024-02-20 00:00:00"))), // 9 d old: stale
      (3L, Some(Timestamp.valueOf("2024-02-23 00:00:00"))), // exactly 7 d: NOT stale (strict <)
      (4L, None)
    ).toDF("id", "ts")
    val rule = ValidationRule("ts_fresh", RuleType.Freshness, Seq("ts"),
      parameters = Map("max_age_seconds" -> "604800", // 7 days
        "reference_time" -> "2024-03-01T00:00:00Z"))
    val r = validator.executeRules(df, Seq(rule), "t").results.head
    r.failed_count shouldBe 1
    r.total_count shouldBe 4
    // violation rows are exactly the stale ones (quarantine path)
    validator.violations(df, rule).collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    // filter mode keeps fresh rows, drops stale AND null timestamps
    RulePlanner.applyFilters(df, Seq(rule)).collect().map(_.getLong(0)).sorted
      .toSeq shouldBe Seq(1L, 3L)
    // wall-clock mode (no reference_time): everything in the past is fresh
    // against now() with a generous window
    val wall = ValidationRule("wall", RuleType.Freshness, Seq("ts"),
      parameters = Map("max_age_seconds" -> (100L * 365 * 86400).toString))
    validator.executeRules(df, Seq(wall), "t").results.head.failed_count shouldBe 0
  }

  test("dlt expectations: each predicate, applied as a filter, reproduces the rule's pass set") {
    import org.apache.spark.sql.functions.{expr, to_timestamp, concat, lit, col}
    // one rule per renderable family, over a frame that exercises every
    // branch (nulls, out-of-range, bad pattern, stale ts, non-member value)
    val df = customers.withColumn("ts",
      to_timestamp(concat(lit("2024-02-0"), (col("score") % 9 + 1).cast("string")),
        "yyyy-MM-dd"))
    val dltRules = Seq(
      ValidationRule("id_complete", RuleType.Completeness, Seq("customer_id")),
      ValidationRule("age_range", RuleType.Range, Seq("age"),
        parameters = Map("min" -> "0", "max" -> "120")),
      ValidationRule("email_pattern", RuleType.Pattern, Seq("email"),
        expression = Some(emailRe)),
      ValidationRule("status_allowed", RuleType.AllowedValues, Seq("status"),
        parameters = Map("values" -> "active,inactive")),
      ValidationRule("ts_fresh", RuleType.Freshness, Seq("ts"),
        parameters = Map("max_age_seconds" -> "259200",
          "reference_time" -> "2024-02-08T00:00:00Z")),
      ValidationRule("score_floor", RuleType.Predicate,
        expression = Some("score >= 60")),
      ValidationRule("named_rows", RuleType.Custom,
        expression = Some("name IS NOT NULL")),
      ValidationRule("id_numeric", RuleType.TypeConformance, Seq("customer_id"),
        parameters = Map("expected_type" -> "bigint")))
    val exps = RulePlanner.dltExpectations(df.schema, dltRules)
    exps.map(_._1) shouldBe dltRules.map(_.name) // every renderable rule renders, in order
    exps.foreach { case (name, predicate) =>
      val rule = dltRules.find(_.name == name).get
      val viaPredicate = df.filter(expr(predicate))
      val viaRule = RulePlanner.applyFilters(df, Seq(rule))
      withClue(s"$name: $predicate → ") {
        viaPredicate.exceptAll(viaRule).count() shouldBe 0
        viaRule.exceptAll(viaPredicate).count() shouldBe 0
      }
    }
    // a WALL-CLOCK freshness rule (no reference_time) has no static
    // predicate: baking render-time "now" into the artifact would silently
    // stop enforcing recency as time passes — it must not render
    RulePlanner.dltExpectations(df.schema, Seq(
      ValidationRule("wall_fresh", RuleType.Freshness, Seq("ts"),
        parameters = Map("max_age_seconds" -> "3600")))) shouldBe empty
    // non-row-level families render nothing: no static per-row predicate
    // (DLT expectations evaluate row by row)
    RulePlanner.dltExpectations(df.schema, Seq(
      ValidationRule("u", RuleType.Uniqueness, Seq("customer_id")),
      ValidationRule("o", RuleType.Outlier, Seq("age")),
      ValidationRule("m", RuleType.Monotonic, Seq("customer_id"),
        parameters = Map("order_by" -> "customer_id", "value" -> "score")),
      ValidationRule("d", RuleType.drift, Seq("status"),
        parameters = Map("ref_table" -> "x", "critical" -> "1")))) shouldBe empty
    // disabled rules are omitted, like every other execution path
    RulePlanner.dltExpectations(df.schema, Seq(
      ValidationRule("off", RuleType.Completeness, Seq("name"),
        enabled = false))) shouldBe empty
    // the Validator accessor renders the table's configured rules
    val v = new Validator(spark, ValidationConfig(tables = Seq(
      TableConfig("customers", rules = dltRules.take(2)))))
    v.dltExpectations(df, "customers").map(_._1) shouldBe
      Seq("id_complete", "age_range")
  }

  test("annotate: per-row tags agree with the fused verdict predicates") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = RulePlanner.annotate(customers, rules)
    // the appended columns exist and the input schema is untouched
    out.columns.toSeq shouldBe customers.columns.toSeq ++ Seq("_dq_errors", "_dq_warnings")
    // per-rule agreement: the rows tagged with a rule's name are EXACTLY
    // the rows the fused verdict pass would count as that rule's failures
    for (r <- rules) {
      val tagCol = if (r.severity == Severity.Error) "_dq_errors" else "_dq_warnings"
      val tagged = out.filter(expr(s"array_contains($tagCol, '${r.name}')"))
        .select(customers.columns.map(col): _*)
      val failing = customers.filter(RulePlanner.failCondition(customers.schema, r))
      withClue(s"${r.name}: ") {
        tagged.exceptAll(failing).count() shouldBe 0
        failing.exceptAll(tagged).count() shouldBe 0
      }
    }
    // clean rows carry NULL (not an empty array), violating rows carry
    // names in RULE ORDER; severities route to the right column
    val byId = out.collect().map { r =>
      val id = Option(r.getAs[Any]("customer_id")).map(_.toString).getOrElse("null")
      id -> ((Option(r.getAs[Seq[String]]("_dq_errors")),
              Option(r.getAs[Seq[String]]("_dq_warnings"))))
    }.toMap
    byId("1") shouldBe ((None, None))                                   // clean
    byId("null") shouldBe ((Some(Seq("customer_id_completeness")), None)) // Eve
    byId("4") shouldBe ((None, Some(Seq("name_completeness"))))          // Dave
    byId("3") shouldBe ((None, Some(Seq("email_pattern"))))              // Carol
    byId("9") shouldBe ((Some(Seq("age_range")), None))                  // Ivan
    // a row failing several error rules lists them in rule order
    import spark.implicits._
    val multi = Seq((Option.empty[Long], "x", "bad", 999, 50, "active"))
      .toDF("customer_id", "name", "email", "age", "score", "status")
    val tags = RulePlanner.annotate(multi, rules).select("_dq_errors", "_dq_warnings")
      .head()
    tags.getAs[Seq[String]](0) shouldBe Seq("customer_id_completeness", "age_range")
    tags.getAs[Seq[String]](1) shouldBe Seq("email_pattern")
    // only row-level rules participate: group/table families and disabled
    // rules add no tags (here: only the uniqueness rule → all rows clean)
    val grp = RulePlanner.annotate(customers, Seq(
      ValidationRule("uniq", RuleType.Uniqueness, Seq("customer_id")),
      ValidationRule("off", RuleType.Completeness, Seq("name"), enabled = false)))
    grp.filter(col("_dq_errors").isNotNull || col("_dq_warnings").isNotNull)
      .count() shouldBe 0
    // name collision with an input column must raise, never silently clobber
    val boom = intercept[IllegalArgumentException] {
      RulePlanner.annotate(customers.withColumnRenamed("status", "_dq_errors"), rules)
    }
    boom.getMessage should include ("_dq_errors")
    // ... and the two output columns colliding with EACH OTHER raises too
    // (the second withColumn would silently clobber the error tags)
    intercept[IllegalArgumentException] {
      RulePlanner.annotate(customers, rules, "_dq_issues", "_dq_issues")
    }.getMessage should include ("_dq_issues")
    // a rule the fused pass would bounce (missing column / non-Boolean
    // predicate) is OMITTED — it must not poison the shared projection for
    // the healthy rules (the verdict face carries its error result)
    val mixed = RulePlanner.annotate(customers, Seq(
      ValidationRule("ghost", RuleType.Completeness, Seq("no_such_col")),
      ValidationRule("broken_pred", RuleType.Predicate, Seq(),
        expression = Some("count(*) >= 1")),
      ValidationRule("name_completeness", RuleType.Completeness, Seq("name"))))
    mixed.filter(expr("array_contains(_dq_errors, 'name_completeness')"))
      .count() should be > 0L
    mixed.filter(expr("array_contains(_dq_errors, 'ghost') OR " +
      "array_contains(_dq_errors, 'broken_pred')")).count() shouldBe 0
  }
}
