package graft

import graft.engine.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  def df = Seq(
    (Some(1L), Some("a"), Some(1.5)),
    (Some(2L), Some("b"), Some(Double.NaN)),
    (Some(2L), None, None),
    (None, Some("c"), Some(-3.0)),
    (Some(4L), Some("a"), Some(10.0))
  ).toDF("id", "s", "d")

  test("builtin single-pass profile: exact counts, min/max, conformance") {
    val p = Profiler.profile(df).map(c => c.column -> c).toMap
    p("id").total_count shouldBe 5
    p("id").null_count shouldBe 1
    p("id").null_rate shouldBe 0.2 +- 1e-12
    p("id").min_value shouldBe Some("1")
    p("id").max_value shouldBe Some("4")
    p("s").null_count shouldBe 1
    p("s").min_value shouldBe Some("a")
    p("s").max_value shouldBe Some("c")
    // NaN counts as null for floating columns (pyspark parity)
    p("d").null_count shouldBe 2
    p("d").min_value shouldBe Some("-3.0")
  }

  test("typed Aggregator profile agrees with builtin on exact fields") {
    val a = Profiler.profile(df).map(c => c.column -> c).toMap
    val b = Profiler.profileTyped(df).map(c => c.column -> c).toMap
    for (c <- Seq("id", "s", "d")) {
      b(c).total_count shouldBe a(c).total_count
      b(c).null_count shouldBe a(c).null_count
      b(c).type_conforming shouldBe a(c).type_conforming
    }
    // string min/max (typed path stringifies); id: "1".."4"
    b("id").min_value shouldBe Some("1")
    b("s").max_value shouldBe Some("c")
  }

  test("HLL approx distinct is within rsd tolerance on larger data") {
    val big = spark.range(100000).selectExpr("cast(id % 5000 as string) as k")
    val p = Profiler.profile(big).head
    p.approx_distinct.toDouble shouldBe 5000.0 +- 500.0
    val pt = Profiler.profileTyped(big).head
    pt.approx_distinct.toDouble shouldBe 5000.0 +- 500.0
  }

  test("type conformance flags non-castable strings") {
    val mixed = Seq("1", "2", "x", "4", "y").toDF("v")
    val p = Profiler.profile(mixed, expectedTypes = Map("v" -> "bigint")).head
    p.type_conforming shouldBe 3
  }

  test("typed profile merges across many partitions") {
    val big = spark.range(10000).repartition(8)
      .selectExpr("id", "cast(id as string) as s", "cast(id as double) as d")
    val p = Profiler.profileTyped(big).map(c => c.column -> c).toMap
    p("id").total_count shouldBe 10000
    p("id").null_count shouldBe 0
    p("id").approx_distinct.toDouble shouldBe 10000.0 +- 600.0
  }

  test("typed profile surfaces heavy hitters with no false positives") {
    import spark.implicits._
    // 5000 skewed rows: "hot" 40%, "warm" 20%, the rest unique — the
    // frequent-items sketch must report hot and warm (counts within the
    // error band) and no unique long-tail value
    val rows = (1 to 5000).map { i =>
      if (i % 5 < 2) "hot" else if (i % 5 == 2) "warm" else s"tail_$i"
    }
    val p = Profiler.profileTyped(rows.toDF("v").repartition(8)).head
    val top = p.top_items.toMap
    top.keySet should contain allOf ("hot", "warm")
    top("hot").toDouble shouldBe 2000.0 +- 100.0
    top("warm").toDouble shouldBe 1000.0 +- 100.0
    // NO_FALSE_POSITIVES: nothing from the unique tail is reported
    p.top_items.map(_._1).filter(_.startsWith("tail_")) shouldBe empty
    // most frequent first
    p.top_items.head._1 shouldBe "hot"
  }

  test("approx quantiles: both paths track exact percentiles; non-numeric empty") {
    // uniform 0..9999 across 8 partitions — exact p50/p95/p99 known
    val big = spark.range(10000).repartition(8)
      .selectExpr("cast(id as double) as d", "cast(id as string) as s")
    for (p <- Seq(Profiler.profile(big), Profiler.profileTyped(big))) {
      val byCol = p.map(c => c.column -> c).toMap
      val q = byCol("d").quantiles
      q.keySet shouldBe Set("p50", "p95", "p99")
      q("p50") shouldBe 5000.0 +- 200.0 // KLL k=200 → ~1.65% rank error
      q("p95") shouldBe 9500.0 +- 200.0
      q("p99") shouldBe 9900.0 +- 200.0
      byCol("s").quantiles shouldBe empty
    }
    // all-null numeric column → no quantiles, no crash
    val nulls = spark.sql("SELECT cast(null as double) AS d FROM range(10)")
    Profiler.profileTyped(nulls).head.quantiles shouldBe empty
    Profiler.profile(nulls).head.quantiles shouldBe empty
  }
}
