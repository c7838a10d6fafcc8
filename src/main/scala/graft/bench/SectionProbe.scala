package graft.bench

import graft.engine.Checks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Ad-hoc per-SECTION cpu/wall probe over the materialized bench table:
  * which pass carries the 8→32-thread CPU inflation (dev tool; plans
  * mirror the Validator's section shapes). `runMain graft.bench.SectionProbe
  * [cpus] [mat]` — "mat" (any position) re-materializes the bench table
  * first. */
object SectionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.filterNot(_ == "mat").headOption.getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime); ()
      }
    })
    val dir = "/tmp/graft_bench"
    // "mat" re-materializes the bench table first (after a small-conv
    // harness run overwrote it)
    if (args.contains("mat"))
      TranscriptSuite.materialize(spark, dir,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1600000").toLong, cpus)
    val turns = TranscriptSuite.openTurns(spark, dir)
    val index = spark.read.parquet(s"$dir/conv_index")
    val part = pmod(xxhash64(col("conv_id")), lit(32))

    def fused(): Unit = turns.groupBy(part.as("__p")).agg(
      count(lit(1)),
      sum(when(col("text").isNull, 1L).otherwise(0L)),
      sum(when(col("role").isNull, 1L).otherwise(0L)),
      sum(when(col("conv_id").isNotNull && !col("conv_id").rlike("^(conv|orph)-[0-9a-f]{8}$"), 1L).otherwise(0L)),
      sum(when(!(col("turn_idx") >= 0 && col("turn_idx") <= 100000), 1L).otherwise(0L)),
      sum(when(graft.functions.long_castable(col("role")), 1L).otherwise(0L))
    ).collect()

    def uniq(): Unit = turns
      .groupBy(part.as("__p"), col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("c"))
      .groupBy("__p").agg((sum("c") - count(lit(1))).as("f"))
      .collect()

    def ref(): Unit = {
      val d = index.select(col("conv_id")).distinct().hint("shuffle_hash")
      turns.filter(col("conv_id").isNotNull)
        .join(d, Seq("conv_id"), "left_anti")
        .groupBy(part.as("__p")).agg(count(lit(1)))
        .collect()
      ()
    }

    def seq(): Unit = Checks
      .sequenceGroups(turns, Seq("conv_id"), "turn_idx", part = Some(part))
      .groupBy("__part").agg(count(lit(1)),
        sum(when(Checks.sequenceViolationCond(Some(0L)), 1L).otherwise(0L)))
      .collect()

    def mono(): Unit = Checks
      .monotonicGroups(turns, Seq("conv_id"), "turn_idx", "ts", part = Some(part))
      .groupBy("__part").agg(count(lit(1)),
        sum(when(col("inversions") > 0L, 1L).otherwise(0L)))
      .collect()

    def drift(): Unit = {
      // mirrors the suite's CURRENT drift routing: role goes through the
      // bounded-categorical fold (the raw column carries the numeric-string
      // injections — unbounded distinct at bench scale, which is exactly
      // what the bounded tier exists for), text_len through the fixed-width
      // bucketing — one multi-histogram scan, like the validator's batch
      Checks.multiHistogramByPartition(turns, Seq(
        "role" -> Checks.boundedCategory(col("role"),
          Seq("user", "assistant", "system", "tool")),
        "text_len" -> Checks.numericBucket(col("text_len"), 0.0, 2000.0, 64)), part)
      ()
    }

    def measure(name: String, f: () => Unit): Unit = {
      f(); f() // warm
      val runs = (1 to 2).map { _ =>
        val c0 = cpuNs.get; val t0 = System.nanoTime()
        f()
        org.apache.spark.graft.benchbridge.drainListeners(spark.sparkContext)
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get - c0) / 1e9)
      }
      val (w, c) = runs.minBy(_._1)
      println(f"[section] cpus=$cpus $name%-8s wall=$w%.2f cpu=$c%.1f")
    }

    measure("fused", fused _)
    measure("uniq", uniq _)
    measure("seq", seq _)
    measure("mono", mono _)
    measure("ref", ref _)
    measure("drift", drift _)
    spark.stop()
  }
}
