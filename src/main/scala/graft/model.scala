package graft

/** Core data model of the validation engine.
  *
  * Shapes mirror the reference semantics (see /root/reference:
  * `src/data_validator/config.py:17-133` for rules/config and
  * `src/data_validator/engines/__init__.py:11-39` for results), re-expressed
  * as Scala case classes with typed Spark Encoders.
  */
object Severity {
  val Error = "error"
  val Warning = "warning"
  val Info = "info"
  val all: Set[String] = Set(Error, Warning, Info)
  def validate(s: String): String = {
    val v = s.toLowerCase
    require(all.contains(v), s"Severity must be one of $all, got '$s'")
    v
  }
}

object RuleType {
  val Completeness = "completeness" // null (and NaN for numeric) check
  val Uniqueness = "uniqueness" // single- or composite-column key uniqueness
  val Range = "range" // inclusive [min,max] bounds on a numeric column
  val Pattern = "pattern" // unanchored regex match on a string column
  val Custom = "custom" // SQL returning violation ROWS (pyspark convention)
  val CustomAgg = "custom_agg" // SQL returning failed count as first scalar (duckdb convention)
  val Referential = "referential" // FK column must exist in a reference table/column
  val TypeConformance = "type_conformance" // values castable to an expected type
  val drift = "drift" // distribution drift (chi-square / KS) vs a baseline
  val Outlier = "outlier" // |x − mean| > k·std (exact-decimal moments)
  val SchemaDrift = "schema" // schema contract vs a reference table (added/removed/retyped columns)
  val AllowedValues = "allowed_values" // set membership (dbt accepted_values / Deequ isContainedIn)
  val Freshness = "freshness" // event-time staleness vs a reference instant
  val Sequence = "sequence" // per-key dense index integrity (gapless turn_idx per conv_id)
  val Monotonic = "monotonic" // per-key ordering integrity (ts never regresses along turn_idx)
  val Transition = "transition" // per-key value-adjacency grammar (role DFA: allowed prev→next pairs, start/end sets)
  val Predicate = "predicate" // declarative row compliance: SQL predicate, fused into the single pass
  val RowCount = "row_count" // table/partition size within [min_rows, max_rows]
  val Cardinality = "cardinality" // distinct count of a column within [min_distinct, max_distinct]
  val Correlation = "correlation" // Pearson corr of two columns within [min_corr, max_corr]
  val Entropy = "entropy" // Shannon entropy (nats) of a column's distribution within bounds
  val Reconciliation = "reconciliation" // cross-table aggregate match vs a reference table
  val FunctionalDependency = "functional_dependency" // determinant → dependent consistency (one value of B per A)
  val Quantile = "quantile" // a percentile of a numeric column within [min_value, max_value]
  val Diff = "diff" // keyed row-level diff vs a reference table (added/removed/changed keys)
}

/** One validation rule.
  *
  * Reference: `ValidationRule` pydantic model (`config.py:17-55`): threshold in
  * [0,1] (validator at 51-55), severity in {error,warning,info} (44-49).
  *
  * @param columns   target column(s); head is "the" column for single-column
  *                  rules, multiple entries form a composite key for uniqueness
  * @param threshold minimum success rate in [0,1]; None => pass iff 0 failures.
  *                  NOTE the reference treats threshold=0.0 as "unset" in the
  *                  message format (python truthiness) — we reproduce that.
  */
final case class ValidationRule(
    name: String,
    ruleType: String,
    columns: Seq[String] = Nil,
    expression: Option[String] = None,
    threshold: Option[Double] = None,
    severity: String = Severity.Error,
    enabled: Boolean = true,
    parameters: Map[String, String] = Map.empty,
    /** Selection labels for scheduled subsets (dbt `tag:` / GE suite
      * convention): `--tags hourly` runs only rules carrying `hourly`.
      * Orthogonal to `enabled` (a kill switch, not a schedule). */
    tags: Seq[String] = Nil
) {
  require(threshold.forall(t => t >= 0.0 && t <= 1.0),
    s"Threshold must be between 0.0 and 1.0, got $threshold")
  Severity.validate(severity)
  def column: String = columns.headOption.getOrElse(
    throw new IllegalArgumentException(s"Rule '$name' ($ruleType) requires a column"))
  def param(key: String): Option[String] = parameters.get(key)
  def paramDouble(key: String): Option[Double] = parameters.get(key).map(_.toDouble)

  /** Strict boolean parameter: only "true"/"false" (or absent) accepted —
    * a typo'd boolean ("True", "tru") must raise, never silently flip the
    * rule's behavior. One definition for every boolean param
    * (partition_covers_key, broadcast, approx, strict, reject,
    * check_nullability). */
  def paramBool(key: String): Boolean = parameters.get(key) match {
    case None | Some("false") => false
    case Some("true")         => true
    case Some(other) => throw new IllegalArgumentException(
      s"rule '$name': $key must be true or false, got '$other'")
  }
}

/** Per-table config: table name + its rules (reference `config.py:58-71`). */
final case class TableConfig(
    name: String,
    rules: Seq[ValidationRule] = Nil,
    source: Option[String] = None,
    filterMode: Boolean = false,
    // per-partition verdicts from the config surface: partition_by names a
    // column, partition_buckets > 0 buckets it via pmod(xxhash64(col), n)
    // (the recommended shape — a raw high-cardinality column trips the
    // 65536-bucket guard); 0 groups on the raw column (dates, shards)
    partitionBy: Option[String] = None,
    partitionBuckets: Int = 32,
    // sampled-validation tier: sample_by names the key (whole key groups
    // kept/dropped together — md5-deterministic, engine-portable),
    // sample_permille the keep rate; < 1000 runs every sample-compatible
    // rule on the slice (results annotated with Wilson 95% bounds) while
    // absolute families (reconciliation, diff, row_count, cardinality,
    // schema) still see the full table
    sampleBy: Option[String] = None,
    samplePermille: Int = 1000
) {
  require(samplePermille >= 0 && samplePermille <= 1000,
    s"sample_permille must be in [0, 1000], got $samplePermille")
  // fail loud, not inert: a rate without a key samples nothing and would
  // silently validate at full cost (the paramBool/partition_buckets
  // convention — misconfiguration raises at parse)
  require(samplePermille == 1000 || sampleBy.isDefined,
    "sample_permille without sample_by is inert — set sample_by or remove it")
}

final case class EngineConfig(
    engineType: String = "spark",
    connectionParams: Map[String, String] = Map.empty,
    options: Map[String, String] = Map.empty
) {
  // reference `config.py:85-90` (validate_engine_type) — an unknown engine
  // name is a config error, not a pass-through; "spark" is this library's
  // native engine name alongside the reference's four
  require(EngineConfig.AllowedEngines.contains(engineType),
    s"Engine type must be one of ${EngineConfig.AllowedEngines.mkString("{", ", ", "}")}, got '$engineType'")
}

object EngineConfig {
  val AllowedEngines: Set[String] = Set("spark", "pyspark", "databricks", "duckdb", "polars")
}

/** Whole-config (reference `ValidationConfig`, `config.py:113-193`). */
final case class ValidationConfig(
    engine: EngineConfig = EngineConfig(),
    tables: Seq[TableConfig] = Nil,
    globalRules: Seq[ValidationRule] = Nil,
    requireSqlRules: Boolean = false,
    stateFile: Option[String] = None
) {
  /** Table config by name (reference `get_table_config`, `config.py:154-159`). */
  def tableConfig(tableName: String): Option[TableConfig] =
    tables.find(_.name == tableName)

  /** Global rules first, then table rules, enabled only — ordering is
    * observable in the results list (reference `config.py:161-180`,
    * asserted in `tests/test_config.py:238-241`). */
  def enabledRules(tableName: String): Seq[ValidationRule] = {
    val tableRules = tableConfig(tableName).map(_.rules).getOrElse(Nil)
    (globalRules ++ tableRules).filter(_.enabled)
  }
  /** The config restricted to rules carrying ANY of `tags` — the
    * scheduled-subset face (`--tags hourly` at the CLI): an hourly tier
    * runs the cheap fused rules, the nightly run everything. Untagged
    * rules are NOT selected (the dbt `tag:` convention — selection picks
    * tagged work; the unfiltered config remains the run-everything face).
    * Tables left with no rules are dropped entirely, so their scans are
    * never paid; everything else (sampling, partitioning, engine, state)
    * carries over unchanged. Empty `tags` is a misconfiguration, not
    * "select nothing silently". */
  def selectTags(tags: Set[String]): ValidationConfig = {
    require(tags.nonEmpty, "tag selection needs at least one tag")
    def pick(rs: Seq[ValidationRule]) = rs.filter(_.tags.exists(tags))
    copy(
      globalRules = pick(globalRules),
      tables = tables.map(t => t.copy(rules = pick(t.rules)))
        .filter(t => t.rules.nonEmpty || pick(globalRules).nonEmpty))
  }

  /** [[selectTags]] from the CLI flag's comma-separated form — ONE parse
    * shared by both CLIs. */
  def selectTags(csv: String): ValidationConfig =
    selectTags(csv.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  /** `require_sql_rules` check (reference `config.py:182-193`). */
  def validateSqlRules(): Unit =
    if (requireSqlRules) {
      val missing = (globalRules ++ tables.flatMap(_.rules))
        .filter(r => r.enabled && r.expression.forall(_.trim.isEmpty))
      require(missing.isEmpty,
        s"require_sql_rules=true but rules missing SQL expression: ${missing.map(_.name).mkString(", ")}")
    }
}

/** Outcome of one rule (reference `ValidationResult`, `engines/__init__.py:11-24`).
  * Error path sentinel: failed_count = total_count = -1, success_rate = 0.0,
  * severity forced to "error" (`engines/pyspark_engine.py:158-173`). */
final case class ValidationResult(
    rule_name: String,
    rule_type: String,
    passed: Boolean,
    failed_count: Long,
    total_count: Long,
    success_rate: Double,
    message: String,
    severity: String,
    execution_time_ms: Double,
    metadata: Map[String, String] = Map.empty
)

object ValidationResult {
  /** Pass/fail for a (threshold, failed, rate) triple (reference
    * `pyspark_engine.py:130-135`: `if rule.threshold is not None`) — ANY set
    * threshold compares the rate, including 0.0 (which therefore always
    * passes); only an UNSET threshold requires zero failures. Python
    * truthiness affects the MESSAGE suffix alone (see [[verdict]]). */
  def passedOf(threshold: Option[Double], failed: Long, rate: Double): Boolean =
    threshold match {
      case Some(t) => rate >= t
      case None    => failed == 0
    }

  /** Threshold verdict + message (reference `pyspark_engine.py:128-143`):
    *   success_rate = (total - failed) / total, 1.0 when total == 0
    *   passed       = rate >= threshold when threshold set, else failed == 0
    *   message      = "Rule 'name': F/T failed records" and, only when the
    *                  threshold is "truthy" (non-zero!), an appended
    *                  " (success rate: X.XX%, threshold: Y.YY%)".
    */
  def verdict(
      rule: ValidationRule,
      failed: Long,
      total: Long,
      elapsedMs: Double,
      metadata: Map[String, String] = Map.empty
  ): ValidationResult = {
    val rate = if (total == 0) 1.0 else (total - failed).toDouble / total
    val passed = passedOf(rule.threshold, failed, rate)
    val base = s"Rule '${rule.name}': $failed/$total failed records"
    val message = rule.threshold match {
      case Some(t) if t != 0.0 =>
        base + f" (success rate: ${rate * 100}%.2f%%, threshold: ${t * 100}%.2f%%)"
      case _ => base
    }
    ValidationResult(rule.name, rule.ruleType, passed, failed, total, rate,
      message, rule.severity, elapsedMs, metadata)
  }

  def failure(rule: ValidationRule, err: Throwable, elapsedMs: Double): ValidationResult =
    ValidationResult(rule.name, rule.ruleType, passed = false, failed_count = -1L,
      total_count = -1L, success_rate = 0.0,
      message = s"Rule execution failed: ${err.getMessage}",
      severity = Severity.Error, execution_time_ms = elapsedMs)
}

/** Per-table summary (reference `ValidationSummary`, `engines/__init__.py:27-39`;
  * counting semantics at 89-107: warning/error tallies count FAILED rules of
  * that severity; info failures appear in neither). */
final case class ValidationSummary(
    table_name: String,
    total_rules: Int,
    passed_rules: Int,
    failed_rules: Int,
    warning_rules: Int,
    error_rules: Int,
    overall_success_rate: Double,
    total_execution_time_ms: Double,
    results: Seq[ValidationResult]
)

object ValidationSummary {
  def from(tableName: String, results: Seq[ValidationResult], totalMs: Double): ValidationSummary = {
    val total = results.size
    val passed = results.count(_.passed)
    val failed = total - passed
    val warn = results.count(r => !r.passed && r.severity == Severity.Warning)
    val err = results.count(r => !r.passed && r.severity == Severity.Error)
    val rate = if (total == 0) 1.0 else passed.toDouble / total
    ValidationSummary(tableName, total, passed, failed, warn, err, rate, totalMs, results)
  }
}

/** Single-pass per-column statistics (north-rule profiler). */
final case class ColumnProfile(
    column: String,
    dataType: String,
    total_count: Long,
    null_count: Long,
    null_rate: Double,
    min_value: Option[String],
    max_value: Option[String],
    approx_distinct: Long,
    type_conforming: Long,
    /** Approximate p50/p95/p99 for numeric columns (empty otherwise) —
      * KLL sketch on the typed path, `approx_percentile` on the builtin. */
    quantiles: Map[String, Double] = Map.empty,
    /** Heavy hitters (value → estimated count), typed path only — a
      * frequent-items sketch (no false positives tier), mergeable like the
      * HLL/KLL buffers. Empty on the builtin path. */
    top_items: Seq[(String, Long)] = Nil
)

/** Per-partition verdict (north rule: "per-partition pass/fail verdicts"). */
final case class PartitionVerdict(
    partition: String,
    rule_name: String,
    passed: Boolean,
    failed_count: Long,
    total_count: Long,
    success_rate: Double
)
