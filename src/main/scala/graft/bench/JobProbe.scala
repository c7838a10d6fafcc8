package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of one SparkEntry query: `runMain graft.bench.JobProbe
  * <name> [sfDir] [reps]` — runs the query like the harness does (noop sink
  * under a CacheScope) with a listener that prints every Spark job's wall
  * time, stage/task counts and description, so a multi-second query can be
  * attributed to its sequential actions from the output alone. Dev tool;
  * not part of the driver contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class Job(id: Int, t0: Long, desc: String, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Job, Double)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, Job(js.jobId, System.nanoTime(), desc)); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3)
          .getOrElse(-1.0)
        stages.add(f"stage=${si.stageId}%-4d ${wall}%6.3f s tasks=${si.numTasks}%-4d ${si.name.take(100)}")
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.remove(je.jobId)
        if (j != null) done.add((j, (System.nanoTime() - j.t0) / 1e9)); ()
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      done.clear()
      stages.clear()
      val t0 = System.nanoTime()
      graft.operators.CacheScope.cached {
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => fn(spark, sfDir).count(); () }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.benchbridge.drainListeners(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1.id)
      println(f"[jobprobe] $name rep$r wall=$wall%.2f jobs=${rows.size}")
      rows.foreach { case (j, sec) =>
        println(f"[jobprobe]   job=${j.id}%-4d ${sec}%6.3f s  ${j.desc.take(120)}")
      }
      if (r == reps) stages.asScala.toSeq.foreach(s => println(s"[jobprobe]   $s"))
    }
    spark.stop()
  }
}
