package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsyncTasks, MaskedExplain}
import graft.functions.{l2sq_dist, vecLit}

/** Scheduling/ops utilities: async task registry, masked explain. */
class OpsSpec extends SparkSpec {

  test("async task completes and is recorded") {
    val id = AsyncTasks.submit(spark, "count-job") {
      spark.range(1000).count()
    }
    var tries = 0
    while (AsyncTasks.status(id).get.status == AsyncTasks.Status.Running &&
        tries < 100) {
      Thread.sleep(100); tries += 1
    }
    assert(AsyncTasks.status(id).get.status == AsyncTasks.Status.Completed)
    val row = AsyncTasks.list(spark)
      .filter(col("task_id") === id).collect()(0)
    assert(row.getAs[String]("job_name") == "count-job")
  }

  test("async task failure is recorded with the error") {
    val id = AsyncTasks.submit(spark, "boom") {
      throw new RuntimeException("intentional")
    }
    var tries = 0
    while (AsyncTasks.status(id).get.status == AsyncTasks.Status.Running &&
        tries < 100) {
      Thread.sleep(100); tries += 1
    }
    val t = AsyncTasks.status(id).get
    assert(t.status == AsyncTasks.Status.Failed)
    assert(t.error.contains("intentional"))
  }

  test("cancel interrupts a running task") {
    val id = AsyncTasks.submit(spark, "slow") {
      spark.range(Long.MaxValue / 4)
        .selectExpr("sum(id % 1000)").collect()
    }
    Thread.sleep(500)
    val canceled = AsyncTasks.cancel(id)
    assert(canceled)
    assert(AsyncTasks.status(id).get.status == AsyncTasks.Status.Canceled)
  }

  test("masked explain equalizes plans that differ only in literals/ids") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    def plan(shift: Float): String = MaskedExplain.explain(
      emb.withColumn("d",
          l2sq_dist(col("embedding"), vecLit(Seq.fill(64)(shift))))
        .orderBy(col("d")).limit(5))
    val a = plan(0.25f)
    val b = plan(0.75f)
    assert(a == b, "masked plans should be identical")
    assert(a.contains("TakeOrderedAndProject"))
    assert(a.contains("[MASKED]"))
  }
}
