package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage attribution for the composed curation pipeline:
  * `runMain graft.tools.PipelineProbe [sfDir] [cpus]` materializes
  * each stage boundary of the q_pipeline_e2e contract pipeline in
  * order and prints (rows, seconds) per stage — the funnel a century
  * run records (the stage that hides a re-scan or a skewed shuffle
  * shows up as ITS OWN seconds, not a blur in the total). */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t00 = System.nanoTime()
    graft.queries.TextQueries.pipelineStages(spark, dir).foreach {
      case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"stage $name%-9s ${n}%9d rows  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(f"pipeline total ${(System.nanoTime() - t00) / 1e9}%.2f s")
    spark.stop()
  }
}
