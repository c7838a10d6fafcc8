package graft

import graft.engine.Validator
import graft.io.{TranscriptConfig, Transcripts}
import graft.state.Checkpoint
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end partition-granular resume over a physically partitioned table
  * (FIXTURES.md §6): a run that fails midway resumes from the checkpoint,
  * re-validates ONLY unfinished partitions against the recorded snapshot id,
  * and reproduces identical verdicts. */
class ResumeSpec extends SparkSpec {

  test("partitioned validate-with-resume revalidates only pending partitions, verdicts identical") {
    val dataDir = Files.createTempDirectory("resume_data").toString
    val statePath = Files.createTempDirectory("resume_state").resolve("cp.json").toString

    // physically partition the transcripts by a conv_id bucket (the sandbox
    // stand-in for an Iceberg bucket(conv_id) partition spec)
    Transcripts.turns(spark, TranscriptConfig(numConvs = 200L))
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(4)))
      .write.partitionBy("bucket").mode("overwrite").parquet(dataDir)

    val snapshot = Checkpoint.snapshotId(dataDir)
    val rules = Seq(
      ValidationRule("text_complete", RuleType.Completeness, Seq("text"), threshold = Some(0.9)),
      ValidationRule("turn_range", RuleType.Range, Seq("turn_idx"),
        parameters = Map("min" -> "0", "max" -> "100000"), threshold = Some(0.9)))
    val allPartitions = (0 until 4).map(_.toString)

    def validatePartition(p: String): ValidationSummary = {
      val df = spark.read.parquet(dataDir).filter(col("bucket") === p.toInt)
      new Validator(spark, ValidationConfig()).executeRules(df, rules, s"transcripts/$p")
    }

    // ---- run 1: validates buckets 0 and 1, then "crashes" -----------------
    val cp1 = new Checkpoint(statePath)
    val firstVerdicts = cp1.pendingPartitions("transcripts", snapshot, allPartitions)
      .take(2).map { p =>
        val s = validatePartition(p)
        cp1.markPartition("transcripts", p, snapshot, s.results.head.total_count,
          Map("failed" -> s.results.map(_.failed_count).sum.toString))
        p -> s
      }.toMap

    // ---- run 2: resumes — only buckets 2 and 3 are pending ----------------
    val cp2 = new Checkpoint(statePath)
    val pending = cp2.pendingPartitions("transcripts", snapshot, allPartitions)
    pending shouldBe Seq("2", "3")
    pending.foreach { p =>
      val s = validatePartition(p)
      cp2.markPartition("transcripts", p, snapshot, s.results.head.total_count)
    }
    new Checkpoint(statePath).pendingPartitions("transcripts", snapshot, allPartitions) shouldBe empty

    // ---- verdict reproducibility: re-validating bucket 0 gives identical results
    val again = validatePartition("0")
    val orig = firstVerdicts("0")
    again.results.map(r => (r.rule_name, r.failed_count, r.total_count, r.passed)) shouldBe
      orig.results.map(r => (r.rule_name, r.failed_count, r.total_count, r.passed))

    // ---- snapshot change invalidates: append a new file → all pending again
    Transcripts.turns(spark, TranscriptConfig(numConvs = 10L, seed = 99L))
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(4)))
      .write.partitionBy("bucket").mode("append").parquet(dataDir)
    val snapshot2 = Checkpoint.snapshotId(dataDir)
    snapshot2 should not be snapshot
    new Checkpoint(statePath).pendingPartitions("transcripts", snapshot2, allPartitions) shouldBe allPartitions
  }

  test("partition filter prunes the physical scan (partition pruning visible)") {
    val dataDir = Files.createTempDirectory("prune").toString
    Transcripts.turns(spark, TranscriptConfig(numConvs = 50L))
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(4)))
      .write.partitionBy("bucket").mode("overwrite").parquet(dataDir)
    val pruned = spark.read.parquet(dataDir).filter(col("bucket") === 2)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    scan should include("PartitionFilters")
    scan should include("bucket")
  }
}
