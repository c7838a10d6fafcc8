package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source dispatch (reference `load_data`, `/root/reference/src/
  * data_validator/engines/pyspark_engine.py:52-63` + duckdb/polars variants):
  * path suffix or explicit format → reader. A `TableProvider` seam so a real
  * Iceberg/Delta catalog can slot in unchanged (the sandbox has no Iceberg
  * jar — partitioned Parquet + `graft.state.Checkpoint.snapshotId` stands in
  * for snapshot-aware reads, see SURVEY.md §7).
  */
trait TableProvider {
  def load(spark: SparkSession, source: String): DataFrame
}

object Tables extends TableProvider {

  /** `source` forms: `/path/x.parquet`, `/path/x.csv`, `/path/x.json`,
    * `/path/x.orc`, `parquet:/path`, `csv:/path`, `json:/path`,
    * `orc:/path`, `table:name`, `snap:/path` (transaction-log table,
    * optionally `snap:/path@v7` for time travel),
    * `catalog.schema.table` (dotted, no slash — Unity-style three-part
    * names, reference `databricks_engine.py:150-215`; `spark.table`
    * resolves them against whatever catalog plugin the session carries),
    * bare `name` (catalog/temp view). A dotted relative FILE path needs an
    * explicit `parquet:`/`csv:`/`json:`/`orc:` prefix to disambiguate. */
  override def load(spark: SparkSession, source: String): DataFrame = source match {
    case s if s.startsWith("snap:")    => snap(spark, s.stripPrefix("snap:"))
    case s if s.startsWith("parquet:") => spark.read.parquet(s.stripPrefix("parquet:"))
    case s if s.startsWith("csv:")     => csv(spark, s.stripPrefix("csv:"))
    case s if s.startsWith("json:")    => spark.read.json(s.stripPrefix("json:"))
    case s if s.startsWith("orc:")     => spark.read.orc(s.stripPrefix("orc:"))
    case s if s.startsWith("table:")   => spark.table(s.stripPrefix("table:"))
    case s if s.endsWith(".parquet")   => spark.read.parquet(s)
    case s if s.endsWith(".csv")       => csv(spark, s)
    case s if s.endsWith(".json")      => spark.read.json(s)
    case s if s.endsWith(".orc")       => spark.read.orc(s)
    // dotted, no slash, no known file suffix → catalog three-part name
    // (a relative dotted FILENAME like `events.v2.parquet` keeps routing
    // to its reader via the suffix cases above; a catalog table whose last
    // name part is literally `parquet`/`csv`/`json` needs `table:`)
    case s if !s.contains("/") && s.count(_ == '.') >= 2 => spark.table(s)
    case s if s.contains("/")          => spark.read.parquet(s) // directory table
    case name                          => spark.table(name)
  }

  /** True when `source` is an EXPLICIT source spec — a format prefix, a
    * known file suffix, or a path — rather than a logical table name.
    * What lets `ref_table`-style rule params carry a spec directly
    * (`ref_table: snap:/warehouse/events@v12` → drift/diff/reconciliation
    * against a time-traveled snapshot) while bare and dotted names keep
    * resolving through `--sources` and the catalog. */
  def isExplicitSpec(source: String): Boolean =
    Seq("snap:", "parquet:", "csv:", "json:", "orc:", "table:")
      .exists(source.startsWith) ||
    Seq(".parquet", ".csv", ".json", ".orc").exists(source.endsWith) ||
    source.contains("/")

  /** Split a snap table spec (WITHOUT the `snap:` prefix) into
    * (dir, asOf): `/path@v7` → (`/path`, Some(7)), `/path` → (None). The
    * one parse every `snap:`-consuming surface shares. */
  private[graft] def snapSpec(spec: String): (String, Option[Long]) = {
    val at = spec.lastIndexOf("@v")
    // toLongOption: an all-digit suffix that overflows Long (e.g.
    // @v99999999999999999999) is treated as part of the path, matching the
    // existing non-numeric behavior, instead of escaping as a
    // NumberFormatException outside the rule/CLI error paths
    if (at > 0 && spec.drop(at + 2).forall(_.isDigit) && spec.length > at + 2)
      spec.drop(at + 2).toLongOption match {
        case Some(v) => (spec.take(at), Some(v))
        case None    => (spec, None)
      }
    else (spec, None)
  }

  /** `snap:/path` reads the current version of a [[SnapTable]];
    * `snap:/path@v7` time-travels to version 7. */
  private def snap(spark: SparkSession, spec: String): DataFrame = {
    val (dir, asOf) = snapSpec(spec)
    SnapTable.read(spark, dir, asOf)
  }

  private def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Convenience: the driver-provided testdata tables. */
  def testTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
