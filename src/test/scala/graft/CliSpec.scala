package graft

import java.nio.file.Files
import org.json4s._
import org.json4s.jackson.JsonMethods

/** End-to-end CLI contract (reference `tests/test_cli.py:37-55`): config +
  * sources → JSON report with total_tables / table_results keys. Runs
  * `Cli`'s pipeline pieces in-process (spark-submit would fork a JVM; the
  * logic under test is identical). Also exercises the CSV source path. */
class CliSpec extends SparkSpec {
  import spark.implicits._
  private implicit val formats: Formats = DefaultFormats

  test("config → validate → JSON report round-trip, with a CSV source") {
    val dir = Files.createTempDirectory("cli")
    // CSV fixture mirroring examples/customers.csv: one null id
    val csv = dir.resolve("customers.csv")
    Files.writeString(csv, "id,name\n1,Alice\n,Bob\n3,Carol\n")

    val configYaml =
      s"""tables:
         |  - name: customers
         |    rules:
         |      - name: id_complete
         |        rule_type: completeness
         |        column: id
         |        threshold: 0.5
         |      - name: id_unique
         |        rule_type: uniqueness
         |        column: id
         |""".stripMargin
    val config = graft.config.ConfigLoader.fromYamlString(configYaml, env = Map.empty)

    val df = graft.io.Tables.load(spark, csv.toString)
    df.count() shouldBe 3
    df.schema("id").dataType.typeName shouldBe "integer" // inferSchema on

    val validator = new graft.engine.Validator(spark, config)
    val summary = validator.validateTable(df, "customers")
    summary.results.map(r => r.rule_name -> r.failed_count).toMap shouldBe
      Map("id_complete" -> 1L, "id_unique" -> 0L) // 3 distinct values incl NULL

    val report = validator.report(Map("customers" -> summary))
    val json = Json.write(report)
    val parsed = JsonMethods.parse(json)
    (parsed \ "total_tables").extract[Int] shouldBe 1
    (parsed \ "table_results" \ "single_table" \ "total_rules").extract[Int] shouldBe 2
    (parsed \ "engine_type").extract[String] shouldBe "spark"
  }

  test("JSON source path loads") {
    val dir = Files.createTempDirectory("clij")
    val jsonFile = dir.resolve("events.json")
    Files.writeString(jsonFile, """{"id":1,"v":"a"}
{"id":2,"v":null}
""")
    val df = graft.io.Tables.load(spark, jsonFile.toString)
    df.count() shouldBe 2
    df.filter($"v".isNull).count() shouldBe 1
  }

  test("table: prefix resolves a temp view") {
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("cli_view")
    graft.io.Tables.load(spark, "table:cli_view").count() shouldBe 1
  }
}
