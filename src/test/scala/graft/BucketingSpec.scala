package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.sources.Bucketing

/** Co-located joins via bucketed tables: the repeated-join shuffle is
  * paid once at write time, then equi-joins on the bucket column plan
  * with NO Exchange. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("equi-join of two tables bucketed on the key plans no shuffle") {
    val dbLoc = Files.createTempDirectory("graft_bucket_db").toString
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    Bucketing.writeBucketed(
      docs.select(col("doc_id"), col("lang")),
      "graft_buck", "docs_a", "doc_id", 4, sortCols = Seq("doc_id"),
      location = Some(dbLoc))
    Bucketing.writeBucketed(
      docs.select(col("doc_id"), col("n_chars")),
      "graft_buck", "docs_b", "doc_id", 4, sortCols = Seq("doc_id"),
      location = Some(dbLoc))

    val a = Bucketing.readBucketed(spark, "graft_buck", "docs_a")
    val b = Bucketing.readBucketed(spark, "graft_buck", "docs_b")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the merge-join path (a broadcast would trivially have no
      // shuffle and prove nothing about co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = a.join(b, "doc_id")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed-on-key join must not shuffle, found ${shuffles.length}:\n$plan")
      // and the result is the real join
      assert(joined.count() == docs.count())

      // control: the same join over the raw parquet DOES shuffle, so
      // the assertion above is meaningful
      val rawA = docs.select(col("doc_id"), col("lang"))
      val rawB = docs.select(col("doc_id"), col("n_chars"))
      val rawShuffles = rawA.join(rawB, "doc_id")
        .queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(rawShuffles.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS `graft_buck`.`docs_a`")
      spark.sql("DROP TABLE IF EXISTS `graft_buck`.`docs_b`")
      spark.sql("DROP DATABASE IF EXISTS `graft_buck`")
    }
  }

  test("a second write with a conflicting location fails instead of silently landing elsewhere") {
    val loc1 = Files.createTempDirectory("graft_bucket_loc1").toString
    val loc2 = Files.createTempDirectory("graft_bucket_loc2").toString
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .select(col("doc_id"), col("lang"))
    try {
      Bucketing.writeBucketed(docs, "graft_buck3", "t1", "doc_id", 2,
        location = Some(loc1))
      // same location again: fine (idempotent anchor)
      Bucketing.writeBucketed(docs, "graft_buck3", "t2", "doc_id", 2,
        location = Some(loc1))
      // different location: SQL's IF NOT EXISTS would silently ignore
      // it, so the helper must refuse
      val e = intercept[IllegalArgumentException] {
        Bucketing.writeBucketed(docs, "graft_buck3", "t3", "doc_id", 2,
          location = Some(loc2))
      }
      assert(e.getMessage.contains("is anchored at"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS `graft_buck3`.`t1`")
      spark.sql("DROP TABLE IF EXISTS `graft_buck3`.`t2`")
      spark.sql("DROP DATABASE IF EXISTS `graft_buck3`")
    }
  }

  test("groupBy on the bucket column also skips its exchange") {
    val dbLoc = Files.createTempDirectory("graft_bucket_db2").toString
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    Bucketing.writeBucketed(
      docs.select(col("doc_id"), col("n_chars")),
      "graft_buck2", "docs_g", "doc_id", 4, location = Some(dbLoc))
    try {
      val agg = Bucketing.readBucketed(spark, "graft_buck2", "docs_g")
        .groupBy("doc_id").agg(sum("n_chars").as("s"))
      val shuffles = agg.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"groupBy on the bucket column must not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == docs.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS `graft_buck2`.`docs_g`")
      spark.sql("DROP DATABASE IF EXISTS `graft_buck2`")
    }
  }
}
