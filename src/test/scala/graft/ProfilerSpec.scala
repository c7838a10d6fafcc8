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

  test("incremental profile state: slice-merge equals one-shot over the union") {
    // two ingest slices, profiled independently; merged state must agree
    // with profiling the concatenated data in one pass
    val slice1 = spark.range(0, 6000).repartition(4)
      .selectExpr("id", "cast(id % 50 as string) as s", "cast(id as double) as d")
    val slice2 = spark.range(6000, 10000).repartition(4)
      .selectExpr("id", "cast(id % 50 as string) as s", "cast(id as double) as d")
    val merged = Profiler.finishState(Profiler.mergeStates(
      Profiler.profileState(slice1), Profiler.profileState(slice2)))
      .map(c => c.column -> c).toMap
    val oneShot = Profiler.profileTyped(slice1.union(slice2))
      .map(c => c.column -> c).toMap
    for (c <- Seq("id", "s", "d")) {
      // exact fields union exactly
      merged(c).total_count shouldBe oneShot(c).total_count
      merged(c).null_count shouldBe oneShot(c).null_count
      merged(c).type_conforming shouldBe oneShot(c).type_conforming
      merged(c).min_value shouldBe oneShot(c).min_value
      merged(c).max_value shouldBe oneShot(c).max_value
    }
    // sketch fields union within their own error bounds
    merged("id").approx_distinct.toDouble shouldBe 10000.0 +- 600.0
    merged("s").approx_distinct shouldBe 50L // exact below sketch capacity
    merged("d").quantiles("p50") shouldBe 5000.0 +- 200.0
    merged("d").quantiles("p99") shouldBe 9900.0 +- 200.0
  }

  test("profile state: write/read round-trip and non-mutating merge") {
    val slice1 = Seq(("a", 1.0), ("b", 2.0)).toDF("s", "d")
    val slice2 = Seq(("c", 3.0), ("a", 4.0)).toDF("s", "d")
    val s1 = Profiler.profileState(slice1)
    val s2 = Profiler.profileState(slice2)
    val dir = java.nio.file.Files.createTempDirectory("profstate").toString
    Profiler.writeState(s1, s"$dir/s1.bin")
    val reloaded = Profiler.readState(s"$dir/s1.bin")
    Profiler.finishState(reloaded) shouldBe Profiler.finishState(s1)
    // merge through the reloaded state — the persisted-across-runs shape
    val m = Profiler.finishState(Profiler.mergeStates(reloaded, s2))
      .map(c => c.column -> c).toMap
    m("s").total_count shouldBe 4
    m("s").approx_distinct shouldBe 3L
    m("d").min_value shouldBe Some("1.0")
    m("d").max_value shouldBe Some("4.0")
    // s1 must be untouched by the merge (non-mutating contract)
    Profiler.finishState(s1).map(_.total_count).head shouldBe 2
    Profiler.finishState(s1) shouldBe Profiler.finishState(reloaded)
  }

  test("profile state merge rejects schema drift") {
    val a = Profiler.profileState(Seq(("a", 1L)).toDF("s", "n"))
    val b = Profiler.profileState(Seq(("a", 1.0)).toDF("s", "n")) // n: double
    val e = intercept[IllegalArgumentException](Profiler.mergeStates(a, b))
    e.getMessage should include ("disagree")
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
