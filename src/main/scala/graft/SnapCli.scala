package graft

import graft.io.{SnapTable, Tables}
import org.apache.spark.sql.SparkSession

/** Table-maintenance CLI for the transaction-log format — the ingest-side
  * companion of `graft.Cli --incremental`:
  *
  * {{{
  * spark-submit --class graft.SnapCli app.jar create    --table DIR --from SOURCE
  * spark-submit --class graft.SnapCli app.jar append    --table DIR --from SOURCE
  * spark-submit --class graft.SnapCli app.jar overwrite --table DIR --from SOURCE
  * spark-submit --class graft.SnapCli app.jar restore   --table DIR --to-version N
  * spark-submit --class graft.SnapCli app.jar compact   --table DIR --files N [--cluster-by COL]
  * spark-submit --class graft.SnapCli app.jar delete    --table DIR --column C (--keys a,b | --lower X [--upper Y])
  * spark-submit --class graft.SnapCli app.jar merge     --table DIR --from SOURCE --key COL
  * spark-submit --class graft.SnapCli app.jar expire    --table DIR --keep N
  * spark-submit --class graft.SnapCli app.jar describe  --table DIR
  * }}}
  *
  * SOURCE is any `io.Tables` form (parquet/csv/json/orc path, `table:`,
  * another `snap:`). `describe` prints one JSON line per version (newest
  * last): version, operation, files, rows — the audit trail a scheduler
  * tails. Exit 0 on success; failures propagate as nonzero exit.
  */
object SnapCli {

  def main(args: Array[String]): Unit = {
    val (cmd, opts) = args.toList match {
      case c :: rest if !c.startsWith("--") => (c, Cli.parseArgs(rest))
      case _ => sys.error("usage: SnapCli <create|append|overwrite|merge|delete|compact|restore|expire|describe> --table DIR ...")
    }
    val dir = opts.getOrElse("table", sys.error("--table DIR is required"))
    // the validation CLI's session recipe, verbatim — the ingest side must
    // not run under a differently-tuned session than validation reads
    val spark = Cli.newSession(s"graft-snap-$cmd")
    spark.sparkContext.setLogLevel("WARN")
    try {
      def from = Tables.load(spark,
        opts.getOrElse("from", sys.error(s"$cmd requires --from SOURCE")))
      cmd match {
        case "create"    => report(SnapTable.create(spark, dir, from))
        case "append"    => report(SnapTable.append(spark, dir, from))
        case "overwrite" => report(SnapTable.overwrite(spark, dir, from))
        case "merge"     => report(SnapTable.merge(spark, dir, from,
          opts.getOrElse("key", sys.error("merge requires --key COL"))))
        case "restore"   => report(SnapTable.restore(spark, dir,
          opts.getOrElse("to-version", sys.error("restore requires --to-version N")).toLong))
        case "delete" =>
          val column = opts.getOrElse("column", sys.error("delete requires --column"))
          val out = opts.get("keys") match {
            case Some(ks) => SnapTable.deleteKeys(spark, dir, column, ks.split(",").toSeq)
            case None => SnapTable.deleteWhere(spark, dir, column,
              opts.get("lower"), opts.get("upper"))
          }
          out match {
            case Some(s) => report(s)
            case None => println("""{"deleted": 0, "note": "no file could contain a match"}""")
          }
        case "compact"   => report(SnapTable.compact(spark, dir,
          targetFiles = opts.getOrElse("files", sys.error("compact requires --files N")).toInt,
          clusterBy = opts.get("cluster-by")))
        case "expire" =>
          val (m, f) = SnapTable.expire(spark, dir,
            opts.getOrElse("keep", sys.error("expire requires --keep N")).toInt)
          println(s"""{"expired_manifests": $m, "deleted_files": $f}""")
        case "describe" =>
          SnapTable.versions(spark, dir).foreach { v =>
            val s = SnapTable.snapshot(spark, dir, Some(v))
            println(s"""{"version": ${s.version}, "operation": "${s.operation}", """ +
              s""""files": ${s.files.size}, "rows": ${s.totalRows}, "added_files": ${s.addedFiles.size}}""")
          }
        case other => sys.error(s"unknown command: $other")
      }
    } finally spark.stop()
  }

  private def report(s: graft.io.Snapshot): Unit =
    println(s"""{"version": ${s.version}, "operation": "${s.operation}", """ +
      s""""files": ${s.files.size}, "rows": ${s.totalRows}}""")
}
