package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the n-gram Jaccard pipeline stages (not part of the
  * driver contract; used to attribute q_ngram_dups_docs wall time). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    docs0.count()
    graft.operators.CacheScope.cached {
      val docs = graft.operators.CacheScope.ambient.cache(
        docs0.select(col("doc_id").as("id"),
          graft.operators.Dedup.wordShingles(col("text"), 3).as("shingles")))
      time("shingle+cache")(docs.count())
      val hotDf = time("hot-df pass") {
        docs.select(explode(col("shingles")).as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > 64).orderBy(col("df").desc, col("sh"))
          .limit(100000).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      println(s"[probe] hot shingles: ${hotDf.size}")
      val prefix = docs.select(col("id"), size(col("shingles")).as("n_sh"),
        posexplode(graft.functions.prefix_shingles(col("shingles"), hotDf, 0L, 0.5))
          .as(Seq("pos", "sh")))
      time("prefix explode count")(println("  prefix rows: " + prefix.count()))
      val a = prefix.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"), col("pos").as("p_a"))
      val b = prefix.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"), col("pos").as("p_b"))
      val lengthOnly = a.join(b, "sh")
        .filter(col("id_a") < col("id_b"))
        .filter(col("n_b") >= col("n_a") * lit(0.5) - lit(1e-9) &&
          col("n_a") >= col("n_b") * lit(0.5) - lit(1e-9))
      time("candidates (length filter)")(
        println("  candidates: " + lengthOnly.select("id_a", "id_b").distinct().count()))
      val positional = lengthOnly
        .filter(lit(1) + least(col("n_a") - 1 - col("p_a"), col("n_b") - 1 - col("p_b"))
          >= ceil((col("n_a") + col("n_b")) * lit(0.5 / 1.5) - lit(1e-9)))
        .select("id_a", "id_b").distinct()
      time("candidates (+positional)")(println("  candidates: " + positional.count()))
      val shA = docs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
      val shB = docs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
      val out = positional.join(shA, "id_a").join(shB, "id_b")
        .withColumn("jaccard", graft.functions.jaccard_sim(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
      time("verify join")(println("  pairs: " + out.count()))
      time("full operator (end to end)") {
        graft.operators.Dedup.ngramJaccardPairs(docs0, "doc_id", "text", 3, 0.5).count()
      }
      // alternating A/B: sampled hot-df (cap off) vs full hot-df (huge cap
      // → identical pruning semantics, exact df) — interleaved so VM drift
      // hits both arms equally
      for (rep <- 1 to 3) {
        time(s"A sampled-df rep$rep") {
          graft.operators.Dedup.ngramJaccardPairs(docs0, "doc_id", "text", 3, 0.5).count()
        }
        time(s"B full-df    rep$rep") {
          graft.operators.Dedup.ngramJaccardPairs(docs0, "doc_id", "text", 3, 0.5,
            maxShingleDf = Long.MaxValue / 2).count()
        }
      }
    }
    spark.stop()
  }
}
