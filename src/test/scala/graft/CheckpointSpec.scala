package graft

import graft.engine.Validator
import graft.state.Checkpoint
import java.nio.file.Files

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  def tmpState(): String =
    Files.createTempDirectory("graft_state").resolve("state.json").toString

  test("mark/load/reset round-trip (reference tests/test_state.py:10-40)") {
    val path = tmpState()
    val cp = new Checkpoint(path)
    cp.isCompleted("t1") shouldBe false
    cp.markCompleted("t1", Map("rows" -> "10"))
    cp.isCompleted("t1") shouldBe true
    // reload from disk
    val cp2 = new Checkpoint(path)
    cp2.isCompleted("t1") shouldBe true
    cp2.tableState("t1").get.metrics("rows") shouldBe "10"
    cp2.reset()
    new Checkpoint(path).isCompleted("t1") shouldBe false
  }

  test("validateAllTables skips completed tables; rerun returns empty (test_state.py:60-65)") {
    val path = tmpState()
    val config = ValidationConfig(
      tables = Seq(
        TableConfig("a", Seq(ValidationRule("r", RuleType.Completeness, Seq("v")))),
        TableConfig("b", Seq(ValidationRule("r", RuleType.Completeness, Seq("v"))))),
      stateFile = Some(path))
    val df = Seq(1, 2, 3).toDF("v")
    def mkValidator(cp: Checkpoint) = new Validator(spark, config, _ => None, Some(cp))

    val first = mkValidator(new Checkpoint(path)).validateAllTables(_ => df)
    first.keySet shouldBe Set("a", "b")
    val second = mkValidator(new Checkpoint(path)).validateAllTables(_ => df)
    second shouldBe empty
  }

  test("suite change invalidates a completed checkpoint entry; same suite still skips") {
    val path = tmpState()
    def configWith(threshold: Double) = ValidationConfig(
      tables = Seq(
        TableConfig("a", Seq(ValidationRule("r", RuleType.Completeness, Seq("v"),
          threshold = Some(threshold))))),
      stateFile = Some(path))
    val df = Seq[Integer](1, 2, null).toDF("v")
    def run(threshold: Double) =
      new Validator(spark, configWith(threshold), _ => None, Some(new Checkpoint(path)))
        .validateAllTables(_ => df)

    run(0.5).keySet shouldBe Set("a")          // first run validates
    run(0.5) shouldBe empty                    // unchanged suite → skip holds
    // a threshold edit is a different suite: the completion is stale and
    // the table re-validates under the NEW rules
    val rerun = run(0.9)
    rerun.keySet shouldBe Set("a")
    rerun("a").failed_rules shouldBe 1         // 1/3 null fails the 0.9 bar
    run(0.9) shouldBe empty                    // and the new hash skips again
  }

  test("hash-less legacy checkpoint entries keep the unconditional skip") {
    val path = tmpState()
    // simulate a pre-fingerprint state file: completed, no suiteHash
    Files.writeString(java.nio.file.Paths.get(path),
      """{"a": {"status": "completed", "snapshotId": "", "partitions": {}, "metrics": {}}}""")
    val config = ValidationConfig(
      tables = Seq(TableConfig("a", Seq(ValidationRule("r", RuleType.Completeness, Seq("v"))))),
      stateFile = Some(path))
    new Validator(spark, config, _ => None, Some(new Checkpoint(path)))
      .validateAllTables(_ => Seq(1).toDF("v")) shouldBe empty
  }

  test("per-partition lineage: resume validates only pending partitions") {
    val path = tmpState()
    val cp = new Checkpoint(path)
    val snap = "snapA"
    val parts = Seq("p0", "p1", "p2")
    cp.pendingPartitions("t", snap, parts) shouldBe parts
    cp.markPartition("t", "p0", snap, 100L, Map("failed" -> "0"))
    cp.markPartition("t", "p1", snap, 200L)
    new Checkpoint(path).pendingPartitions("t", snap, parts) shouldBe Seq("p2")
    // snapshot change invalidates everything
    new Checkpoint(path).pendingPartitions("t", "snapB", parts) shouldBe parts
  }

  test("snapshotId is deterministic and file-set sensitive") {
    val dir = Files.createTempDirectory("snap")
    Files.writeString(dir.resolve("a.parquet"), "xx")
    val s1 = Checkpoint.snapshotId(dir.toString)
    val s2 = Checkpoint.snapshotId(dir.toString)
    s1 shouldBe s2
    Files.writeString(dir.resolve("b.parquet"), "yy")
    Checkpoint.snapshotId(dir.toString) should not be s1
  }

  test("resumed partition validation reproduces identical verdicts") {
    import graft.io.{TranscriptConfig, Transcripts}
    import org.apache.spark.sql.functions._
    val turns = Transcripts.turns(spark, TranscriptConfig(numConvs = 100L))
      .withColumn("part", pmod(xxhash64(col("conv_id")), lit(4)).cast("string"))
    val rules = Seq(ValidationRule("text_complete", RuleType.Completeness, Seq("text"),
      threshold = Some(0.9)))
    val validator = new Validator(spark, ValidationConfig())
    def verdictOf(p: String) =
      validator.executeRules(turns.filter(col("part") === p), rules, s"t/$p").results.head

    val full = (0 until 4).map(i => verdictOf(i.toString))
    // "resume": re-validate partition 2 in isolation → identical verdict
    val resumed = verdictOf("2")
    resumed.failed_count shouldBe full(2).failed_count
    resumed.total_count shouldBe full(2).total_count
    resumed.passed shouldBe full(2).passed
  }
}
