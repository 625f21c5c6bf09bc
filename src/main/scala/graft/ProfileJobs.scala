package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round scratch profiler: run ONE query with a listener
  * that prints every Spark job's duration + description, so a composed
  * pipeline's cost can be attributed per stage without the UI.
  * Usage: ProfileJobs <queryName> [reps]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    sys.props("graft.gate.asserts") = "off"
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val sites = js.stageInfos.map(_.name).distinct.mkString(" ; ")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), s"tasks=$nTasks  $sites"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val sec = (System.nanoTime() - s._1) / 1e9
          if (sec > 0.02)
            println(f"JOB ${je.jobId}%4d ${sec}%8.3f s  ${s._2}")
        }
      }
    })
    spark.range(100).selectExpr("sum(id)").collect()
    try graft.queries.ExtQueries.warmShared(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"warm failed: $e") }
    graft.util.Scratch.sweep()
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"== rep $r total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.util.Scratch.sweep()
    }
    spark.stop()
  }
}
