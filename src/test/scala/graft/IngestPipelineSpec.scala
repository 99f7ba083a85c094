package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.IngestPipeline

/** The streaming composed door: batch/stream parity (foreachBatch runs
  * the pure batch transform, so backfill == incremental row-for-row),
  * stage activity, and the prepared-artifact overloads' equivalence
  * with their self-building forms. */
class IngestPipelineSpec extends SparkSpec {

  test("streaming door == batch door, row for row") {
    for (scale <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(scale)
      val streamed = spark.read
        .parquet(graft.queries.TextQueries.pipelineStreamPath(spark, dir))
        .orderBy(col("doc_id")).collect().toSeq
      val batch = IngestPipeline.curateBatch(
          graft.queries.TextQueries.pipeArrivals(spark, dir),
          col("doc_id"), col("source"), col("text"),
          graft.queries.TextQueries.pipeStreamCorpus(spark, dir))
        .orderBy(col("doc_id")).collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence at $scale")
      assert(streamed.nonEmpty, s"empty door output at $scale")
    }
  }

  test("door stages are all active at sf0.01 (planted categories fire)") {
    val dir = sf("sf0.01")
    val arrivals = graft.queries.TextQueries.pipeArrivals(spark, dir)
    val corpus = graft.queries.TextQueries.pipeStreamCorpus(spark, dir)
    val out = IngestPipeline.curateBatch(arrivals, col("doc_id"),
      col("source"), col("text"), corpus)
    val nArr = arrivals.count()
    val nOut = out.count()
    // the funnel must actually drop documents at the door (gates +
    // three dedup categories); the oracle pins the exact counts — this
    // pins non-triviality so a planted-category regression is loud
    assert(nOut > 0 && nOut < nArr / 2,
      s"door funnel inactive: $nArr arrivals -> $nOut survivors")
  }

  test("incrementalDedupPrepared == incrementalDedup (bloom built once vs per call)") {
    import spark.implicits._
    val prior = Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text")
    val fresh = Seq((10L, "alpha text"), (11L, "gamma text"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val viaSelf = Dedup.incrementalDedup(fresh, prior, col("doc_id"),
      col("text"), col("text")).orderBy(col("doc_id")).collect().toSeq
    val hashes = prior.select(
      md5(col("text").cast("binary")).as("content_hash"))
    val bloom = hashes.stat.bloomFilter("content_hash", 2L, 0.01)
    val viaPrepared = Dedup.incrementalDedupPrepared(fresh, col("doc_id"),
        col("text"), hashes, bloom)
      .orderBy(col("doc_id")).collect().toSeq
    assert(viaPrepared == viaSelf)
    // the exact dup dropped, the new text and the null text kept
    assert(viaPrepared.map(_.getLong(0)) == Seq(11L, 12L))
  }
}
