package graft.bench

import org.apache.spark.sql.SparkSession

/** Shared scaffolding for the one-shot design-point bench mains (SnapBench,
  * IncrBench): the local session shape they all want and the scratch-dir
  * wipe — one definition instead of a copy per main. (graft.Bench builds
  * its own sessions: the scaling ladder relaunches per level.) */
private[bench] object BenchSessions {

  def local(name: String, cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def wipe(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}
