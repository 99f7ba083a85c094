package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for the composed curation pipeline:
  * `runMain graft.tools.PipelineProbe [sfDir] [cpus]` materializes
  * each stage boundary of the q_pipeline_e2e contract pipeline in
  * order and prints (rows, seconds) per stage — the funnel a century
  * run records (the stage that hides a re-scan or a skewed shuffle
  * shows up as ITS OWN seconds, not a blur in the total) — plus the
  * MEGA-BUCKET GUARD counters of the near-dup stage's band buckets
  * ([[graft.dedup.Dedup.bucketGuardStats]]): how many buckets the
  * star cap fired on and exactly how many candidate pairs it dropped,
  * so a recall regression from hot-bucket collapse at the century is
  * a number in the probe output, not an assumption. */
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
    val stages = graft.queries.TextQueries.pipelineStages(spark, dir)
    stages.foreach {
      case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"stage $name%-9s ${n}%9d rows  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(f"pipeline total ${(System.nanoTime() - t00) / 1e9}%.2f s")

    // guard telemetry: the ndk stage's band buckets (the same
    // signatures/banding its candidate join uses — exd's string
    // shingles through the shared bandedOf explosion)
    import graft.dedup.Dedup
    val exd = stages.toMap.apply("exd")
    val (banded, keys) = Dedup.bandedOf(
      Dedup.signatures(
        Dedup.shingled(exd, col("doc_id"), col("text_c4")), 8), 8, 4)
    val g = Dedup.bucketGuardStats(banded, keys).head()
    println(s"""{"probe":"pipeline_guard","stage":"ndk","sf_dir":"$dir","n_buckets":${g.getLong(0)},"max_bucket":${g.getLong(1)},"cap":${g.getLong(2)},"n_capped":${g.getLong(3)},"rows_in_capped":${g.getLong(4)},"star_edges":${g.getLong(5)},"pairs_dropped":${g.getLong(6)}}""")

    // and the streaming door's corpus-side buckets (the incremental
    // near-dup guard filters the PREPARED signature table's bands)
    val corpus = graft.queries.TextQueries.pipeStreamCorpus(spark, dir)
    val (bandedK, keysK) = Dedup.bandedOf(corpus.signatures, 8, 4)
    val gk = Dedup.bucketGuardStats(bandedK, keysK).head()
    println(s"""{"probe":"pipeline_guard","stage":"door_corpus","sf_dir":"$dir","n_buckets":${gk.getLong(0)},"max_bucket":${gk.getLong(1)},"cap":${gk.getLong(2)},"n_capped":${gk.getLong(3)},"rows_in_capped":${gk.getLong(4)},"star_edges":${gk.getLong(5)},"pairs_dropped":${gk.getLong(6)}}""")
    spark.stop()
  }
}
