package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Job-level wall-time decomposition of ONE contract query:
  * `runMain graft.tools.ProfileOne <query> [runs=2] [sfDir=sf0.1]`.
  * Prints every Spark job the warm run launches (start offset, wall
  * seconds, description) — the fast way to see whether a slow row is
  * one heavy stage or a chain of tiny sequential jobs/broadcasts
  * (guide §1: measure where the time goes before touching the code). */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileOne <query> [runs] [sfDir]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries(name)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .getOrElse(js.stageInfos.map(_.name).lastOption.getOrElse(""))
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        done.add((je.jobId, je.time, 0L)); ()
      }
    }

    (1 to runs).foreach { i =>
      jobs.clear(); done.clear()
      if (i == runs) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the last JobEnd
      println(f"run $i: $wall%.3f s ($n rows)")
      if (i == runs) {
        val t0ms = jobs.values().toArray.map(_.asInstanceOf[(Long, String, Int)]._1)
          .foldLeft(Long.MaxValue)(math.min)
        done.toArray.map(_.asInstanceOf[(Int, Long, Long)]).sortBy(_._1).foreach {
          case (id, end, _) =>
            Option(jobs.get(id)).foreach { case (start, desc, tasks) =>
              println(f"  job $id%3d  +${(start - t0ms) / 1e3}%6.2fs  ${(end - start) / 1e3}%6.3fs  $tasks%4d tasks  ${desc.take(100)}")
            }
        }
      }
    }
    spark.stop()
  }
}
