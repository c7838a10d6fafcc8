package graft

import graft.engine.Validator
import graft.io.Turn
import graft.streaming.ConversationMonitor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable end-to-end sample of the library surface: rule validation,
  * quarantine extraction, and the stateful streaming monitor.
  * `sbt "runMain graft.Demo"` — prints observed results. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-demo").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- batch validation + quarantine ------------------------------------
    val df = Seq(
      (Some(1L), "a@x.com", 30), (None, "b@x.com", 40),
      (Some(3L), "bad", 200), (Some(3L), "c@x.com", 50)
    ).toDF("id", "email", "age")
    val rules = Seq(
      ValidationRule("id_complete", RuleType.Completeness, Seq("id")),
      ValidationRule("age_range", RuleType.Range, Seq("age"),
        parameters = Map("min" -> "0", "max" -> "120")),
      ValidationRule("id_unique", RuleType.Uniqueness, Seq("id")))
    val v = new Validator(spark, ValidationConfig())
    val summary = v.executeRules(df, rules, "demo")
    summary.results.foreach(r => println(s"[demo] ${r.message} passed=${r.passed}"))
    val qdir = java.nio.file.Files.createTempDirectory("qdemo").toString + "/q"
    val outcome = v.quarantine(df, rules, qdir)
    println(s"[demo] quarantined rows total=${outcome.written}")
    spark.read.parquet(qdir).groupBy("__rule_name").count()
      .collect().foreach(r => println(s"[demo] quarantine ${r.getString(0)} -> ${r.getLong(1)}"))

    // --- stateful streaming monitor ---------------------------------------
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Turn]
    val query = ConversationMonitor.anomalies(ms.toDS())
      .writeStream.format("memory").queryName("demo_anomalies").outputMode("append").start()
    def t(c: String, i: Int) = Turn(c, i, "user", "x", null, new java.sql.Timestamp(1700000000000L))
    ms.addData(t("c1", 0), t("c1", 1))
    query.processAllAvailable()
    ms.addData(t("c1", 1), t("c1", 0)) // cross-batch duplicate + out-of-order
    query.processAllAvailable()
    query.stop()
    spark.table("demo_anomalies").collect()
      .foreach(r => println(s"[demo] anomaly $r"))

    spark.stop()
  }
}
