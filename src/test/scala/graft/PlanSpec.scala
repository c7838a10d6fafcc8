package graft

import graft.engine.{Checks, RulePlanner}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations we rely on at scale must be
  * visible in `explain` output, not assumed — filter/column pushdown to the
  * parquet scan, broadcast vs shuffle join selection, whole-stage codegen
  * around the fused aggregate. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def events: DataFrame = spark.read.parquet(s"$sf/events.parquet")

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def optimizedOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("rule filters push down to the parquet scan") {
    val rules = Seq(
      ValidationRule("props", RuleType.Completeness, Seq("props")),
      ValidationRule("value", RuleType.Range, Seq("value"),
        parameters = Map("min" -> "0", "max" -> "100")))
    val plan = planOf(RulePlanner.applyFilters(events, rules))
    plan should include("PushedFilters")
    plan should include("IsNotNull(props)")
    plan should include("GreaterThanOrEqual(value,0.0)")
  }

  test("fused aggregate prunes to referenced columns only") {
    val rules = Seq(
      ValidationRule("props", RuleType.Completeness, Seq("props")),
      ValidationRule("value", RuleType.Range, Seq("value"),
        parameters = Map("min" -> "0", "max" -> "100")))
    val counters = rules.map(r => sum(when(RulePlanner.failCondition(events.schema, r), 1L).otherwise(0L)))
    val agg = events.agg(count(lit(1)), counters: _*)
    val scan = agg.queryExecution.executedPlan.collectLeaves().head.toString
    // ReadSchema must contain only the two referenced columns
    scan should include("ReadSchema")
    scan should include("props")
    scan should include("value")
    scan should not include "event_type"
    scan should not include "user_id"
  }

  test("grouped fused pass prunes the scan to rule + partition columns") {
    val rules = Seq(
      ValidationRule("props", RuleType.Completeness, Seq("props")),
      ValidationRule("value", RuleType.Range, Seq("value"),
        parameters = Map("min" -> "0", "max" -> "100")))
    val counters = rules.map(r =>
      sum(when(RulePlanner.failCondition(events.schema, r), 1L).otherwise(0L)))
    val grouped = events
      .groupBy(pmod(xxhash64(col("user_id")), lit(8)).cast("string"))
      .agg(count(lit(1)), counters: _*)
    val plan = grouped.queryExecution.executedPlan.toString
    val readSchema = plan.substring(plan.indexOf("ReadSchema:"))
    readSchema should include("props")
    readSchema should include("value")
    readSchema should include("user_id")
    readSchema should not include "event_type" // unreferenced → pruned
    readSchema should not include "ts:"
  }

  test("fused aggregate runs inside whole-stage codegen") {
    val rules = Seq(ValidationRule("props", RuleType.Completeness, Seq("props")))
    val counters = rules.map(r => sum(when(RulePlanner.failCondition(events.schema, r), 1L).otherwise(0L)))
    val agg = events.agg(counters.head)
    agg.collect() // materialize THIS QueryExecution: AQE only finalizes
    // (and codegens) executed plans; head() would build a separate limit plan
    // codegen'd spans print as "*(n) Operator" in the final adaptive plan
    planOf(agg) should include("*(1) HashAggregate")
  }

  test("small-dim referential check uses a broadcast join") {
    val dim = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val plan = planOf(Checks.orphans(orders, "o_custkey", dim, "c_custkey", broadcastDim = true))
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
  }

  test("non-broadcast orphan rows plan a shuffled-hash anti-join, never sort-merge") {
    val fact = spark.range(100000).selectExpr("id as fk")
    val dim = spark.range(50000).selectExpr("id as pk")
    val plan = planOf(Checks.orphans(fact, "fk", dim, "pk", broadcastDim = false))
    // anti joins never need sorted inputs; SMJ would sort BOTH sides
    plan should include("ShuffledHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("prefix-filtered jaccard ships the hot-df map in the plan (no df join-back, no window)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val plan = planOf(pairs)
    plan should not include "Window"
  }

  test("large-dim orphan count plans a hash aggregate, not a sort-merge join") {
    val fact = spark.range(1000).selectExpr("cast(id as string) as k")
    val dim = spark.range(500).selectExpr("cast(id as string) as pk")
    // orphanCount is eager; re-build its plan here for inspection
    val f = fact.select(col("k").as("__k"), lit(1L).as("__t"), lit(0L).as("__d"))
    val d = dim.select(col("pk").as("__k"), lit(0L).as("__t"), lit(1L).as("__d"))
    val plan = planOf(f.unionByName(d).groupBy("__k")
      .agg(sum("__t").as("__nt"), max("__d").as("__nd"))
      .filter(col("__nd") === 0).agg(sum("__nt")))
    plan should include("HashAggregate")
    plan should not include "SortMergeJoin"
  }

  test("uniqueness distinct shuffles only the key columns") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val distinctPlan = li.select("l_orderkey", "l_linenumber").distinct()
    val scan = distinctPlan.queryExecution.executedPlan.collectLeaves().head.toString
    scan should include("l_orderkey")
    scan should not include "l_extendedprice"
    // partial aggregation before the exchange (map-side dedup)
    val plan = planOf(distinctPlan)
    plan.indexOf("HashAggregate") should be < plan.indexOf("Exchange")
  }

  test("minhash LSH reuses the persisted signature index only under a CacheScope") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // bare call: persist-free (no leak into a long-lived session)
    val bare = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
    bare.collect()
    planOf(bare) should not include "InMemoryTableScan"
    // scoped call: the signature index is cached once and serves all 4 join
    // sides; the scope releases the blocks on exit
    graft.operators.CacheScope.cached {
      val scoped = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      scoped.collect()
      planOf(scoped) should include("InMemoryTableScan")
    }
  }

  test("brute-force top-k plans a partial-aggregating bounded heap, no per-query window") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val top = graft.operators.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    top.collect()
    val plan = planOf(top)
    // the old shape shuffled every (corpus row × query) to one task per
    // query via Window.partitionBy(query_id); the aggregate shape must show
    // object aggregation with a partial pass before the exchange and no
    // window operator at all
    plan should not include "Window"
    plan should include("ObjectHashAggregate")
    plan.indexOf("ObjectHashAggregate") should be < plan.indexOf("Exchange")
  }

  test("partition-pruned scan: filter on partition-style column pushes down") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
    planOf(li) should include("PushedFilters")
    planOf(li) should include("GreaterThanOrEqual(l_shipdate")
  }

  test("BPE token counting: one pruned scan, zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val counted = docs.select(col("doc_id"),
      graft.functions.bpe_token_count(col("text")).as("n"))
    val plan = planOf(counted)
    plan should not include "Exchange" // pure per-row projection
    val scan = counted.queryExecution.executedPlan.collectLeaves().head.toString
    val readSchema = scan.substring(scan.indexOf("ReadSchema:"))
    readSchema should include("doc_id")
    readSchema should include("text")
    readSchema should not include "lang" // pruned to the referenced columns
    readSchema should not include "source"
  }

  test("audio feature extraction: per-row decode, no shuffle in the plan") {
    import spark.implicits._
    val media = spark.range(20).map { id =>
      (id, graft.operators.Multimodal.WavCodec.encode(
        graft.operators.Multimodal.syntheticWavSamples(id, 64), 8000, 1))
    }.toDF("media_id", "bytes")
    val feats = graft.operators.Multimodal
      .extractAudioFeatures(media, "media_id", "bytes").toDF()
    planOf(feats) should not include "Exchange" // embarrassingly parallel
  }
}
