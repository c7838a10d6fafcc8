package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = spark.read.parquet("/tmp/graft_bench/turns")
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm count")(t.count())
    time("count")(t.count())
    time("null text")(t.agg(sum(when(col("text").isNull, 1L))).head())
    time("null role")(t.agg(sum(when(col("role").isNull, 1L))).head())
    time("rlike conv_id")(t.agg(sum(when(!col("conv_id").rlike("^(conv|orph)-[0-9a-f]{8}$"), 1L))).head())
    time("trycast role")(t.agg(sum(when(expr("try_cast(role AS bigint)").isNotNull, 1L))).head())
    time("len text")(t.agg(sum(length(col("text")))).head())
    time("all5")(t.agg(
      sum(when(col("text").isNull, 1L)), sum(when(col("role").isNull, 1L)),
      sum(when(!col("conv_id").rlike("^(conv|orph)-[0-9a-f]{8}$"), 1L)),
      sum(when(expr("try_cast(role AS bigint)").isNotNull, 1L)),
      sum(when(!(col("turn_idx") >= 0 && col("turn_idx") <= 100000), 1L))).head())
    spark.stop()
  }
}
