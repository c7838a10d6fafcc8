package graft

import org.apache.spark.sql.SparkSession

/** SQL registration of the native expressions (SparkSessionExtensions). */
class ExtensionsSpec extends SparkSpec {

  test("graft_* functions are callable from SQL after injection") {
    spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // reuses the existing SparkContext; applies the extensions to a fresh
    // SparkSession — the production path is spark.sql.extensions=graft.GraftExtensions
    val s3 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s3.implicits._
      val df = Seq("the quick brown fox", "the quick brown fox", "other text entirely")
        .toDF("text")
      df.createOrReplaceTempView("docs")
      val r = s3.sql(
        """SELECT graft_simhash(text) AS sh,
                  size(graft_minhash(graft_shingles(text, 3), 16)) AS k,
                  graft_long_castable('12345') AS c1,
                  graft_long_castable('abc') AS c2
           FROM docs""").collect()
      r.length shouldBe 3
      r(0).getLong(0) shouldBe r(1).getLong(0) // identical texts, same simhash
      r(0).getInt(1) shouldBe 16
      r(0).getBoolean(2) shouldBe true
      r(0).getBoolean(3) shouldBe false
      val cos = s3.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))").head().getDouble(0)
      cos shouldBe 1.0 +- 1e-12
      val st = s3.sql("SELECT graft_text_stats('hello world 42').tokens").head().getInt(0)
      st shouldBe 3
      val jac = s3.sql(
        "SELECT graft_jaccard(array('a','b','c'), array('b','c','d'))").head().getDouble(0)
      jac shouldBe 0.5 +- 1e-12
      val ds = s3.sql("SELECT graft_dup_stats('a\nb\na').n_lines").head().getInt(0)
      ds shouldBe 3
      // quantize → cosine_q round trip: parallel vectors → cosine 1
      val cq = s3.sql(
        """SELECT graft_cosine_q(graft_quantize(array(1.0F, 2.0F)),
                                 graft_quantize(array(2.0F, 4.0F)))""").head().getDouble(0)
      cq shouldBe 1.0 +- 1e-3
      val dq = s3.sql("SELECT graft_dequantize(graft_quantize(array(0.5F, -0.5F)))")
        .head().getSeq[Float](0)
      dq.head shouldBe 0.5f +- 0.01f
      s3.catalog.dropTempView("docs")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
