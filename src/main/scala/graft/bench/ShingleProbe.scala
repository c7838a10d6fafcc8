package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the PPJoin pipeline pieces. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.testTable(spark, sfDir, "documents")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[shingleprobe] $name%-28s ${runs.min}%.3f s")
    }
    time("scan_text")(docs.select(col("doc_id"), col("text")).write.mode("overwrite").format("noop").save())
    time("shingles")(docs.select(col("doc_id"),
      graft.operators.Dedup.wordShingles(col("text"), 3).as("sh"))
      .write.mode("overwrite").format("noop").save())
    time("shingles_count")(docs.select(size(graft.operators.Dedup.wordShingles(col("text"), 3)).as("n"))
      .agg(sum("n")).show())
    time("prefix")(docs.select(col("doc_id"),
      posexplode(graft.functions.prefix_shingles(
        graft.operators.Dedup.wordShingles(col("text"), 3), Map.empty[String, Long], 0L, 0.5)))
      .write.mode("overwrite").format("noop").save())
    time("minhash")(docs.select(col("doc_id"),
      graft.functions.minhash_signature(graft.operators.Dedup.wordShingles(col("text"), 3), 64).as("sig"))
      .write.mode("overwrite").format("noop").save())
    val mass = docs.select(size(graft.operators.Dedup.wordShingles(col("text"), 3)).as("n"))
      .agg(sum("n"), count(lit(1))).head
    println(s"[shingleprobe] shingle_mass=${mass.getLong(0)} docs=${mass.getLong(1)}")
    val sh = docs.select(col("doc_id").as("id"),
      graft.operators.Dedup.wordShingles(col("text"), 3).as("shingles"))
    val prefix = sh.select(col("id"), size(col("shingles")).as("n_sh"),
      posexplode(graft.functions.prefix_shingles(col("shingles"), Map.empty[String, Long], 0L, 0.5))
        .as(Seq("pos", "sh")))
    val a = prefix.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"), col("pos").as("p_a"))
    val b = prefix.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"), col("pos").as("p_b"))
    val rawCand = a.join(broadcast(b), "sh").filter(col("id_a") < col("id_b"))
    time("raw_band_join")(println("[shingleprobe] raw_pairs=" + rawCand.count()))
    val requiredOverlap =
      ceil((col("n_a") + col("n_b")) * lit(0.5 / 1.5) - lit(1e-9))
    val cand = rawCand
      .filter(col("n_b") >= col("n_a") * lit(0.5) - lit(1e-9) &&
        col("n_a") >= col("n_b") * lit(0.5) - lit(1e-9))
      .filter(lit(1) + least(col("n_a") - 1 - col("p_a"), col("n_b") - 1 - col("p_b"))
        >= requiredOverlap)
      .select("id_a", "id_b").distinct()
    time("candidates")(println("[shingleprobe] candidates=" + cand.count()))
    // with the hot-df ordering (the real pipeline's prefix order)
    val hotDf: Map[String, Long] = sh
      .filter(substring(md5(col("id").cast("string")), 1, 1).isin("0", "1"))
      .select(explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") * 8L > 64L)
      .orderBy(col("df").desc, col("sh")).limit(100000)
      .collect().map(r => r.getString(0) -> r.getLong(1) * 8L).toMap
    println(s"[shingleprobe] hot_shingles=${hotDf.size}")
    val prefixH = sh.select(col("id"), size(col("shingles")).as("n_sh"),
      posexplode(graft.functions.prefix_shingles(col("shingles"), hotDf, 0L, 0.5))
        .as(Seq("pos", "sh")))
    val aH = prefixH.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"), col("pos").as("p_a"))
    val bH = prefixH.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"), col("pos").as("p_b"))
    val candH = aH.join(broadcast(bH), "sh").filter(col("id_a") < col("id_b"))
      .filter(col("n_b") >= col("n_a") * lit(0.5) - lit(1e-9) &&
        col("n_a") >= col("n_b") * lit(0.5) - lit(1e-9))
      .filter(lit(1) + least(col("n_a") - 1 - col("p_a"), col("n_b") - 1 - col("p_b"))
        >= requiredOverlap)
      .select("id_a", "id_b").distinct()
    time("candidates_hot")(println("[shingleprobe] candidates_hot=" + candH.count()))
    val shA = sh.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    val pairs = candH.join(broadcast(shA), "id_a").join(broadcast(shB), "id_b")
      .withColumn("jaccard", graft.functions.jaccard_sim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
    time("verify_broadcast")(println("[shingleprobe] pairs=" + pairs.count()))
    spark.stop()
  }
}
