package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Scratch CPU bisection for the Suggest sweep scans (dev tool; attributes
  * q_suggest_rules_events' executor CPU to individual aggregates). */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime); ()
      }
    })
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val evS = graft.engine.Checks.spreadSmall(ev)
    def m(label: String)(f: => Unit): Unit = {
      f // warm
      val c0 = cpuNs.get; val t0 = System.nanoTime()
      f
      org.apache.spark.graft.benchbridge.drainListeners(spark.sparkContext)
      println(f"[sweep] $label%-34s wall=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${(cpuNs.get - c0) / 1e9}%.2f")
    }
    val cols = Seq("event_id", "user_id", "event_type", "value")
    m("count only")(evS.agg(count(lit(1))).head())
    val numCols = Seq("event_id", "user_id", "value")
    m("null+min+max (3 num cols)") {
      val aggs = count(lit(1)) +: numCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        min(col(c).cast("double")), max(col(c).cast("double"))))
      evS.agg(aggs.head, aggs.tail: _*).head()
    }
    m("hll 0.05 (4 cols)")(evS.agg(
      approx_count_distinct(col(cols.head), 0.05),
      cols.tail.map(c => approx_count_distinct(col(c), 0.05)): _*).head())
    m("hll 0.05 (1 col id)")(evS.agg(approx_count_distinct(col("event_id"), 0.05)).head())
    m("try_cast (1 col)")(evS.agg(
      sum(when(col("event_type").isNotNull &&
        expr("try_cast(`event_type` AS bigint)").isNotNull, 1L).otherwise(0L))).head())
    m("exact distinct (4 cols)")(evS.agg(
      count_distinct(col(cols.head)), cols.tail.map(c => count_distinct(col(c))): _*).head())
    m("exact distinct (1 col id)")(evS.agg(count_distinct(col("event_id"))).head())
    m("collect_set event_type")(evS.agg(
      slice(sort_array(collect_set(col("event_type"))), 1, 11)).head())
    m("full scan1 (suggest shape)") {
      val aggs = count(lit(1)) +: cols.flatMap { c0 =>
        val c = col(c0)
        val isNum = numCols.contains(c0)
        Seq(sum(when(c.isNull, 1L).otherwise(0L)),
          if (isNum) min(c.cast("double")) else min(lit(null).cast("double")),
          if (isNum) max(c.cast("double")) else max(lit(null).cast("double")),
          approx_count_distinct(c, 0.05),
          sum(when(c.isNotNull, 1L).otherwise(0L)))
      }
      evS.agg(aggs.head, aggs.tail: _*).head()
    }
    m("no-spread hll (4 cols)")(ev.agg(
      approx_count_distinct(col(cols.head), 0.05),
      cols.tail.map(c => approx_count_distinct(col(c), 0.05)): _*).head())
    m("no-spread exact distinct (1 col)")(ev.agg(count_distinct(col("event_id"))).head())
    m("no-spread try_cast (1 col)")(ev.agg(
      sum(when(col("event_type").isNotNull &&
        expr("try_cast(`event_type` AS bigint)").isNotNull, 1L).otherwise(0L))).head())
    m("long_castable (1 col, spread)")(evS.agg(
      sum(when(col("event_type").isNotNull &&
        graft.functions.long_castable(col("event_type")), 1L).otherwise(0L))).head())
    m("exact distinct rerun (1 col)")(evS.agg(count_distinct(col("event_id"))).head())
    def scan1(src: org.apache.spark.sql.DataFrame, castable: String) = {
      val aggs = count(lit(1)) +: cols.flatMap { c0 =>
        val c = col(c0)
        val isNum = numCols.contains(c0)
        val cast =
          if (c0 != "event_type") lit(0L)
          else if (castable == "try") sum(when(c.isNotNull &&
            expr("try_cast(`event_type` AS bigint)").isNotNull, 1L).otherwise(0L))
          else sum(when(c.isNotNull && graft.functions.long_castable(c), 1L).otherwise(0L))
        Seq(sum(when(c.isNull, 1L).otherwise(0L)),
          if (isNum) min(c.cast("double")) else min(lit(null).cast("double")),
          if (isNum) max(c.cast("double")) else max(lit(null).cast("double")),
          approx_count_distinct(c, 0.05), cast)
      }
      src.agg(aggs.head, aggs.tail: _*).head()
    }
    m("scan1 spread + try_cast")(scan1(evS, "try"))
    m("scan1 spread + long_castable")(scan1(evS, "native"))
    m("scan1 NOSPREAD + long_castable")(scan1(ev, "native"))
    def scan2(src: org.apache.spark.sql.DataFrame) = {
      val aggs = cols.map(c => count_distinct(col(c))) :+
        slice(sort_array(collect_set(col("event_type"))), 1, 11)
      src.agg(aggs.head, aggs.tail: _*).head()
    }
    m("scan2 spread")(scan2(evS))
    m("scan2 NOSPREAD")(scan2(ev))
    m("scan2 spread8")(scan2(ev.repartition(8)))
    m("scan2 spread16")(scan2(ev.repartition(16)))
    m("scan1 NOSPREAD rerun")(scan1(ev, "native"))
    m("scan2 spread8 rerun")(scan2(ev.repartition(8)))
    spark.stop()
  }
}
