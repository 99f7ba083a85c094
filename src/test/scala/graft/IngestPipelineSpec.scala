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
      val streamed = IngestPipeline.readSink(spark,
          graft.queries.TextQueries.pipelineStreamPath(spark, dir))
        // the sink keeps the cleaned text for the refresh absorb;
        // project the narrow door shape for the parity compare
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("w_fp"))
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

  test("door artifacts: artifact-served corpus == derived corpus, door parity at two scales", SlowTest) {
    for (scale <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(scale)
      val arrivals = graft.queries.TextQueries.pipeArrivals(spark, dir)
      def door(c: IngestPipeline.PreparedCorpus) =
        IngestPipeline.curateBatch(arrivals, col("doc_id"), col("source"),
          col("text"), c).orderBy(col("doc_id")).collect().toSeq
      val viaArtifacts =
        door(graft.queries.TextQueries.pipeStreamCorpus(spark, dir))
      val viaDerived =
        door(graft.queries.TextQueries.pipeStreamCorpusDerived(spark, dir))
      assert(viaArtifacts == viaDerived && viaArtifacts.nonEmpty,
        s"artifact-served door diverged from derived at $scale")
      // the weight blob round-trips the exact array
      assert(graft.queries.TextQueries.pipeStreamCorpus(spark, dir)
        .dsirWeights.toSeq ==
        graft.queries.TextQueries.pipeStreamCorpusDerived(spark, dir)
          .dsirWeights.toSeq)
    }
  }

  test("door artifacts: a restarted resolution serves everything — zero recompute") {
    val dir = sf("sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("graft_door_spec").toString
    val (_, r1) =
      graft.queries.TextQueries.doorArtifacts(spark, dir, Some(root))
    val cold = r1.filter(_.computed).map(_.stage).toSet
    assert(Set("hash", "sig", "shh", "bloom", "dsirw").subsetOf(cold),
      s"cold resolution must compute the derived artifacts: $cold")
    // a second resolution (what a restarted ingest job does before its
    // first micro-batch) must serve every boundary AND every derived
    // artifact from disk
    val (_, r2) =
      graft.queries.TextQueries.doorArtifacts(spark, dir, Some(root))
    assert(r2.forall(!_.computed),
      s"restart recomputed: ${r2.filter(_.computed).map(_.stage)}")
  }

  test("sink: a replayed micro-batch overwrites its batch directory — no duplicates") {
    val dir = sf("sf0.001")
    val work = java.nio.file.Files
      .createTempDirectory("graft_sink_spec").toString
    graft.queries.TextQueries.pipeArrivals(spark, dir)
      .coalesce(1).write.parquet(s"$work/src")
    val schema = spark.read.parquet(s"$work/src").schema
    val corpus = graft.queries.TextQueries.pipeStreamCorpus(spark, dir)
    IngestPipeline.run(spark, s"$work/src", schema, "doc_id", "source",
      "text", corpus, s"$work/dst", s"$work/ckpt1")
    val once = IngestPipeline.readSink(spark, s"$work/dst")
      .orderBy(col("doc_id")).collect().toSeq
    // a lost checkpoint replays the whole drop as batch 0 again; the
    // batchId-scoped overwrite must leave the sink unchanged (the
    // blind append it replaced doubled every survivor here)
    IngestPipeline.run(spark, s"$work/src", schema, "doc_id", "source",
      "text", corpus, s"$work/dst", s"$work/ckpt2")
    val replayed = IngestPipeline.readSink(spark, s"$work/dst")
      .orderBy(col("doc_id")).collect().toSeq
    assert(replayed == once && once.nonEmpty,
      s"replay changed the sink: ${once.size} -> ${replayed.size} rows")
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
