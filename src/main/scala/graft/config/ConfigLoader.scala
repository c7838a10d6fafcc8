package graft.config

import graft._
import org.yaml.snakeyaml.Yaml
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML config loading with env-var overrides.
  *
  * Mirrors the reference's load path (`/root/reference/src/data_validator/
  * settings.py:66-105`): YAML → deep-merge of environment overrides with
  * prefix `VALIDATOR_` and `__` as the nesting separator
  * (`settings.py:26-63`) → model validation. Uses snakeyaml (present in
  * /opt/spark/jars) — no extra dependency.
  */
object ConfigLoader {

  def fromYamlFile(
      path: String, env: Map[String, String] = sys.env,
      overrides: Map[String, String] = Map.empty): ValidationConfig =
    fromYamlString(Files.readString(Paths.get(path)), env, overrides)

  /** `overrides` is the caller-provided override map — the portable
    * counterpart of the reference's Databricks widget overrides
    * (`settings.py:76-105`, asserted by `tests/test_settings.py:32-41`):
    * merged LAST, so overrides beat env overrides beat YAML, exactly the
    * precedence the reference gives `dbutils.widgets`. Keys nest with
    * `__` like env keys (`engine__type -> duckdb`) but carry no
    * `VALIDATOR_` prefix — a notebook/job wrapper passes its widget or
    * argument map here verbatim. */
  def fromYamlString(
      yamlText: String, env: Map[String, String] = sys.env,
      overrides: Map[String, String] = Map.empty): ValidationConfig = {
    val raw = new Yaml().load[java.util.Map[String, Object]](yamlText)
    val base: Map[String, Any] = if (raw == null) Map.empty[String, Any]
      else toScala(raw).asInstanceOf[Map[String, Any]]
    build(deepMerge(deepMerge(base, envOverrides(env)), expandKeys(overrides)))
  }

  /** `Map("engine__type" -> "duckdb")` → `Map("engine" -> Map("type" ->
    * "duckdb"))` (reference `_expand_keys`, `settings.py:53-62`). Key case
    * is preserved VERBATIM — unlike env keys (which are uppercase by shell
    * convention and lowercased on ingest), caller overrides may target
    * case-sensitive nested keys like `engine__options__spark.executor.cores`;
    * lowercasing them would silently add a non-matching sibling instead of
    * overriding. */
  def expandKeys(m: Map[String, String]): Map[String, Any] =
    m.foldLeft(Map.empty[String, Any]) { case (acc, (k, v)) =>
      mergePath(acc, k.split("__").toList, v)
    }

  /** Config → YAML, the loader's inverse (reference `save_to_yaml`,
    * `config.py:144-151`): `fromYamlString(toYamlString(c)) == c`
    * (round-trip asserted in ConfigSpec). */
  def toYamlString(config: ValidationConfig): String = {
    val root = new java.util.LinkedHashMap[String, Any]()
    val eng = new java.util.LinkedHashMap[String, Any]()
    eng.put("type", config.engine.engineType)
    if (config.engine.connectionParams.nonEmpty)
      eng.put("connection_params", toJavaMap(config.engine.connectionParams))
    if (config.engine.options.nonEmpty)
      eng.put("options", toJavaMap(config.engine.options))
    root.put("engine", eng)
    if (config.globalRules.nonEmpty)
      root.put("global_rules", toJavaList(config.globalRules.map(ruleToMap)))
    root.put("tables", toJavaList(config.tables.map { t =>
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("name", t.name)
      m.put("rules", toJavaList(t.rules.map(ruleToMap)))
      t.source.foreach(m.put("source", _))
      if (t.filterMode) m.put("filter_mode", java.lang.Boolean.TRUE)
      t.partitionBy.foreach(m.put("partition_by", _))
      // emitted whenever non-default so round-trip identity holds even for
      // a config carrying buckets without partition_by
      if (t.partitionBy.isDefined || t.partitionBuckets != 32)
        m.put("partition_buckets", Integer.valueOf(t.partitionBuckets))
      t.sampleBy.foreach(m.put("sample_by", _))
      if (t.sampleBy.isDefined || t.samplePermille != 1000)
        m.put("sample_permille", Integer.valueOf(t.samplePermille))
      m
    }))
    if (config.requireSqlRules) root.put("require_sql_rules", java.lang.Boolean.TRUE)
    config.stateFile.foreach(root.put("state_file", _))
    new Yaml().dump(root)
  }

  def saveYamlFile(config: ValidationConfig, path: String): Unit =
    Files.writeString(Paths.get(path), toYamlString(config))

  private def ruleToMap(r: ValidationRule): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("name", r.name)
    m.put("rule_type", r.ruleType)
    if (r.columns.nonEmpty) m.put("columns", toJavaList(r.columns))
    r.expression.foreach(m.put("expression", _))
    r.threshold.foreach(t => m.put("threshold", java.lang.Double.valueOf(t)))
    m.put("severity", r.severity)
    if (!r.enabled) m.put("enabled", java.lang.Boolean.FALSE)
    if (r.parameters.nonEmpty) m.put("parameters", toJavaMap(r.parameters))
    if (r.tags.nonEmpty) m.put("tags", toJavaList(r.tags))
    m
  }

  private def toJavaMap(m: Map[String, String]): java.util.Map[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    m.foreach { case (k, v) => out.put(k, v) }
    out
  }

  private def toJavaList(s: Seq[Any]): java.util.List[Any] = {
    val out = new java.util.ArrayList[Any]()
    s.foreach(out.add)
    out
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_]   => l.asScala.map(toScala).toList
    case other                  => other
  }

  /** `VALIDATOR_ENGINE__TYPE=duckdb` → Map("engine" -> Map("type" -> "duckdb"))
    * (reference `settings.py:54-63`). Keys lower-cased. */
  def envOverrides(env: Map[String, String]): Map[String, Any] =
    env.collect { case (k, v) if k.startsWith("VALIDATOR_") =>
      k.stripPrefix("VALIDATOR_").toLowerCase.split("__").toList -> (v: Any)
    }.foldLeft(Map.empty[String, Any]) { case (acc, (path, v)) => mergePath(acc, path, v) }

  private def mergePath(m: Map[String, Any], path: List[String], v: Any): Map[String, Any] =
    path match {
      case key :: Nil => m + (key -> v)
      case key :: rest =>
        val sub = m.get(key) match {
          case Some(s: Map[String, Any] @unchecked) => s
          case _ => Map.empty[String, Any]
        }
        m + (key -> mergePath(sub, rest, v))
      case Nil => m
    }

  /** Right-biased deep merge (reference `settings.py:44-51`). */
  def deepMerge(base: Map[String, Any], over: Map[String, Any]): Map[String, Any] =
    over.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(a: Map[String, Any] @unchecked), b: Map[String, Any] @unchecked) =>
          acc + (k -> deepMerge(a, b))
        case _ => acc + (k -> v)
      }
    }

  // ------------------------------------------------------------- model build

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).map(_.toString).filter(_.nonEmpty)

  private def bool(m: Map[String, Any], k: String, dflt: Boolean): Boolean =
    m.get(k).map(_.toString.toBoolean).getOrElse(dflt)

  private def rule(m: Map[String, Any]): ValidationRule = {
    val params: Map[String, String] = m.get("parameters") match {
      case Some(p: Map[String, Any] @unchecked) => p.map { case (k, v) => k -> v.toString }
      case _ => Map.empty
    }
    val cols: Seq[String] = m.get("columns") match {
      case Some(l: List[Any] @unchecked) => l.map(_.toString)
      case _ => str(m, "column").toSeq
    }
    ValidationRule(
      name = str(m, "name").getOrElse(throw new IllegalArgumentException("rule needs a name")),
      ruleType = str(m, "rule_type").orElse(str(m, "type")).getOrElse(
        throw new IllegalArgumentException("rule needs rule_type")),
      columns = cols,
      expression = str(m, "expression"),
      threshold = m.get("threshold").map(_.toString.toDouble),
      severity = str(m, "severity").getOrElse(Severity.Error),
      enabled = bool(m, "enabled", dflt = true),
      parameters = params,
      tags = m.get("tags") match {
        case Some(l: List[Any] @unchecked) => l.map(_.toString)
        case Some(s) => s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None => Nil
      })
  }

  private def rules(m: Map[String, Any], key: String): Seq[ValidationRule] =
    m.get(key) match {
      case Some(l: List[Any] @unchecked) =>
        l.collect { case r: Map[String, Any] @unchecked => rule(r) }
      case _ => Nil
    }

  private def build(m: Map[String, Any]): ValidationConfig = {
    val engine = m.get("engine") match {
      case Some(e: Map[String, Any] @unchecked) =>
        val conn = e.get("connection_params") match {
          case Some(p: Map[String, Any] @unchecked) => p.map { case (k, v) => k -> v.toString }
          case _ => Map.empty[String, String]
        }
        val opts = e.get("options") match {
          case Some(p: Map[String, Any] @unchecked) => p.map { case (k, v) => k -> v.toString }
          case _ => Map.empty[String, String]
        }
        EngineConfig(str(e, "type").getOrElse("spark"), conn, opts)
      case _ => EngineConfig()
    }
    val tables = m.get("tables") match {
      case Some(l: List[Any] @unchecked) =>
        l.collect { case t: Map[String, Any] @unchecked =>
          TableConfig(
            name = str(t, "name").getOrElse(throw new IllegalArgumentException("table needs name")),
            rules = rules(t, "rules"),
            source = str(t, "source"),
            filterMode = bool(t, "filter_mode", dflt = false),
            partitionBy = str(t, "partition_by"),
            partitionBuckets = str(t, "partition_buckets").map { s =>
              val n = try s.toInt catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"partition_buckets must be an integer, got '$s'")
              }
              require(n >= 0, s"partition_buckets must be >= 0, got $n")
              n
            }.getOrElse(32),
            sampleBy = str(t, "sample_by"),
            samplePermille = str(t, "sample_permille").map { s =>
              try s.toInt catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"sample_permille must be an integer, got '$s'")
              } // range enforced by TableConfig itself (fail-fast at parse)
            }.getOrElse(1000))
        }
      case _ => Nil
    }
    ValidationConfig(
      engine = engine,
      tables = tables,
      globalRules = rules(m, "global_rules"),
      requireSqlRules = bool(m, "require_sql_rules", dflt = false),
      stateFile = str(m, "state_file"))
  }
}
