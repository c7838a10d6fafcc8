package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(spark.range(0L, 100000000L, 1L, cpus * 4).agg(sum(col("id"))).head())
    time("rangesum 4e9")(spark.range(0L, 4000000000L, 1L, cpus * 4).agg(sum(pmod(col("id"), lit(997)))).head())
    time("hash agg")(spark.range(0L, 400000000L, 1L, cpus * 4)
      .groupBy(pmod(col("id"), lit(1000))).agg(count(lit(1))).count())
    val t = spark.read.parquet("/tmp/graft_bench/turns")
    time("parquet scan text")(t.agg(sum(when(col("text").isNull, 1L))).head())
    time("parquet scan text2")(t.agg(sum(when(col("text").isNull, 1L))).head())
    time("parquet scan text3")(t.agg(sum(when(col("text").isNull, 1L))).head())
    time("parquet scan text4")(t.agg(sum(when(col("text").isNull, 1L))).head())
    spark.stop()
  }
}
