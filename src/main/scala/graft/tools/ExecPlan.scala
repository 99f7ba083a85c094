package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints the EXECUTED (final adaptive) plan of selected contract
  * queries: `runMain graft.tools.ExecPlan <query...>`. PlanAudit shows
  * the pre-execution plan, where AQE stage reuse (ReusedExchange /
  * shared QueryStages) is not yet decided — this one runs the query
  * first, so reuse claims can be checked against what actually ran. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      // collect() drives THIS Dataset's queryExecution (count() would
      // plan a separate aggregate and leave this plan un-executed), so
      // the explain below prints the final adaptive plan that ran
      df.collect()
      println(s"===== $n (executed) =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
