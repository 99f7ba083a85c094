package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Times one contract query in isolation: `runMain graft.tools.BenchOne
  * <query> [runs=3] [sfDir=/root/testdata/sf0.1]`. Prints per-run wall
  * seconds (first run includes codegen warmup) — the fast feedback loop
  * for iterating on a single query's plan. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [runs] [sfDir]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
