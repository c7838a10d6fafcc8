package graft.bench

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-rule timing probe for the bench suite (dev tool). */
object SuiteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_bench"
    val warm = TranscriptSuite.run(spark, dir)
    val r = TranscriptSuite.run(spark, dir)
    println(f"cpus=$cpus turns=${r.turns} elapsed=${r.elapsedSec}%.2f tps=${r.turnsPerSec}%.0f")
    r.results.foreach(x => println(f"  ${x.rule_name}%-24s ${x.execution_time_ms / 1000}%.2f s"))
    spark.stop()
  }
}
