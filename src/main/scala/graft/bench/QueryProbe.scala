package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch per-query timer: `runMain graft.bench.QueryProbe <name> [sfDir]
  * [reps]` — runs one SparkEntry query under a CacheScope like the
  * harness does, several times, printing each wall time. Not part of the
  * driver contract. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.operators.CacheScope.cached {
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => fn(spark, sfDir).count(); () }
      }
      println(f"[qprobe] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
