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

    // planted near-dup RECALL under the guard: the corpus plants
    // (a, a+5) near-dup pairs (a % 9 == 0; a+5 renders a's text plus
    // one sentence, jaccard >= 0.6 at every scale). For each pair
    // with BOTH members surviving to exd, the keeper stage must drop
    // exactly one — `both_kept` counts pairs the banding (incl. any
    // mega-bucket star-capping) FAILED to connect, i.e. real recall
    // loss, the number the candidate-side guard counters alone can't
    // give. `none_kept` = both merged into a larger component some
    // third member won (legitimate, expected ~0 on this corpus).
    val ndk = stages.toMap.apply("ndk")
    val aIds = exd.select(col("doc_id").as("a"))
      .filter(col("a") % 9 === 0)
    val pairs = aIds.join(exd.select((col("doc_id") - 5).as("a")),
      Seq("a"), "left_semi")
    val ndkA = ndk.select(col("doc_id").as("a"), lit(1).as("__ka"))
    val ndkB = ndk.select((col("doc_id") - 5).as("a"), lit(1).as("__kb"))
    val r = pairs
      .join(ndkA, Seq("a"), "left").join(ndkB, Seq("a"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(coalesce(col("__ka"), lit(0)) +
          coalesce(col("__kb"), lit(0)) === 1, 1L).otherwise(0L))
          .as("one"),
        sum(when(col("__ka").isNotNull && col("__kb").isNotNull, 1L)
          .otherwise(0L)).as("both"),
        sum(when(col("__ka").isNull && col("__kb").isNull, 1L)
          .otherwise(0L)).as("none"))
      .head()
    val recall = // 1 - both_kept/n: both-kept pairs are the real misses
      if (r.getLong(0) == 0L) 1.0
      else (r.getLong(0) - r.getLong(2)).toDouble / r.getLong(0)
    println(s"""{"probe":"pipeline_recall","sf_dir":"$dir","planted_pairs_in_exd":${r.getLong(0)},"one_kept":${r.getLong(1)},"both_kept":${r.getLong(2)},"none_kept":${r.getLong(3)},"recall":${String.format(java.util.Locale.ROOT, "%.6f", Double.box(recall))}}""")
    spark.stop()
  }
}
