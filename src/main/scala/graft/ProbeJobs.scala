package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-clock profile of named queries — where a
  * lifecycle gate's commit floors actually go (job count × per-job
  * overhead vs real compute). Runs each query once (count()) under the
  * bench session shape and prints one line per job plus a summary.
  *
  * Usage: runMain graft.ProbeJobs <sfDir> <query> [query...]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), desc, nTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc, nTasks) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, nTasks, desc))
        }
      }
    })
    args.drop(1).foreach { n =>
      rows.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val js = rows.asScala.toSeq.sortBy(_._1)
      println(f"===== $n wall=$wall%.2f s jobs=${js.size} jobWall=${js.map(_._2).sum}%.2f s tasks=${js.map(_._3).sum}")
      js.foreach { case (id, s, nt, d) =>
        println(f"  job $id%5d ${s}%7.3f s $nt%5d tasks  $d")
      }
    }
    spark.stop()
  }
}
