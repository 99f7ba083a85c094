package graft

import java.nio.file.Files
import graft.ann.{Autotune, Metric}

/** Autotune grid search: picks a variant meeting the recall target
  * (reference find_best_variant, lantern_cli/src/index_autotune/mod.rs). */
class AutotuneSpec extends SparkSpec {

  test("autotune finds a variant meeting recall target on sf0.01") {
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune").toString
    val report = Autotune.run(emb, "vec_id", "embedding", work,
      metric = Metric.L2Sq, k = 10, targetRecall = 0.95,
      sampleSize = 500, numQueries = 5,
      variants = Autotune.presets.take(4))
    // 4 builds x the 6-ef sweep: the grid is a recall-vs-ef frontier
    // per graph, not one point per build
    assert(report.results.length == 4 * Autotune.defaultEfSweep.length)
    assert(report.best.nonEmpty,
      s"no variant met target; recalls = ${report.results.map(_.recall)}")
    // results are measured, not copied: every recall is in [0,1]
    assert(report.results.forall(r => r.recall >= 0.0 && r.recall <= 1.0))
    // every build carries the full ef sweep, ascending within the build
    Autotune.presets.take(4).foreach { v =>
      val efs = report.results.collect {
        case r if r.variant.m == v.m &&
          r.variant.efConstruction == v.efConstruction => r.variant.ef
      }
      assert(efs == Autotune.defaultEfSweep.sorted, s"efs for $v: $efs")
    }
    // the chosen variant is the first (cheapest) one meeting the target
    val first = report.results.find(_.recall >= 0.95).get.variant
    assert(report.best.get == first)
  }

  test("IVF autotune measures the recall/scan-fraction frontier, cheapest-first wins") {
    import graft.ann.Autotune.IvfVariant
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune_ivf").toString
    val report = Autotune.runIvf(emb, "vec_id", "embedding", work,
      metric = Metric.L2Sq, k = 10, targetRecall = 0.9,
      sampleSize = 500, numQueries = 5,
      variants = Seq(IvfVariant(16, 1), IvfVariant(16, 4), IvfVariant(16, 16)))
    assert(report.results.length == 3)
    // nprobe = nCells probes everything: an exact scan — recall and
    // scan fraction both exactly 1 (this pins that both are MEASURED)
    val full = report.results.last
    assert(full.recall == 1.0, s"full probe recall ${full.recall}")
    assert(math.abs(full.scanFraction - 1.0) < 1e-9)
    // a 1-of-16 probe reads a strict fraction of the corpus
    assert(report.results.head.scanFraction < 0.5)
    // recall is monotone in nprobe over the same build (candidate sets
    // are supersets)
    val rs = report.results.map(_.recall)
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b + 1e-9 }, rs)
    // find_best_variant: the FIRST (cheapest) variant meeting target
    assert(report.best.contains(
      report.results.find(_.recall >= 0.9).get.variant))
    // deterministic: a second run reproduces recalls and fractions
    val work2 = Files.createTempDirectory("autotune_ivf2").toString
    val again = Autotune.runIvf(emb, "vec_id", "embedding", work2,
      metric = Metric.L2Sq, k = 10, targetRecall = 0.9,
      sampleSize = 500, numQueries = 5,
      variants = Seq(IvfVariant(16, 1), IvfVariant(16, 4), IvfVariant(16, 16)))
    assert(again.results.map(r => (r.variant, r.recall, r.scanFraction)) ==
      report.results.map(r => (r.variant, r.recall, r.scanFraction)))
  }

  test("a corpus smaller than k can still meet the target (min(k, n) denominator)") {
    import graft.ann.Autotune.IvfVariant
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val work = Files.createTempDirectory("autotune_small").toString
    val report = Autotune.runIvf(emb, "vec_id", "embedding", work,
      metric = Metric.L2Sq, k = 10, targetRecall = 0.99,
      sampleSize = 100, numQueries = 3,
      variants = Seq(IvfVariant(2, 2)))
    // an exhaustive probe over 8 rows returns all 8 — recall must be
    // 1.0, not 0.8 (a k=10 denominator would reject every variant)
    assert(report.results.head.recall == 1.0, report.results)
    assert(report.best.contains(IvfVariant(2, 2)))
  }

  test("runAndCreate builds the winning index (--create-index)") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune2").toString
    val (report, manifest) = Autotune.runAndCreate(emb, "vec_id", "embedding",
      s"$work/grid", s"$work/index", metric = Metric.L2Sq, k = 5,
      targetRecall = 0.6, sampleSize = 100, numQueries = 3, numShards = 2,
      variants = Autotune.presets.take(2))
    assert(report.best.nonEmpty && manifest.nonEmpty)
    assert(manifest.get.m == report.best.get.m)
    assert(graft.ann.AnnIndex.readManifest(s"$work/index").count ==
      emb.count())
  }

  test("runAndCreate exports the grid; efForTarget resolves the cheapest qualifying ef") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune_ef").toString
    val (report, manifest) = Autotune.runAndCreate(emb, "vec_id", "embedding",
      s"$work/grid", s"$work/index", metric = Metric.L2Sq, k = 5,
      targetRecall = 0.6, sampleSize = 100, numQueries = 3, numShards = 2,
      variants = Autotune.presets.take(3))
    assert(manifest.nonEmpty)
    // the artifact holds one row per measured (build, ef) point — the
    // full sweep for every build, >= 4 ef rows per variant
    val rows = spark.read.parquet(s"$work/index/autotune_results").collect()
    assert(rows.length == 3 * Autotune.defaultEfSweep.length)
    Autotune.presets.take(3).foreach { v =>
      val n = rows.count(r => r.getAs[Int]("m") == v.m &&
        r.getAs[Int]("ef_construction") == v.efConstruction)
      assert(n >= 4, s"variant $v has only $n ef rows")
    }
    // derived ef = the cheapest (preset-order) variant meeting the
    // target — identical to find_best_variant over the report
    val expected = report.results.find(_.recall >= 0.6).get.variant.ef
    assert(Autotune.efForTarget(spark, s"$work/index", 0.6)
      .contains(expected))
    // unattainable target -> None (caller falls back explicitly)
    assert(Autotune.efForTarget(spark, s"$work/index", 1.01).isEmpty)
    // no artifact -> None
    assert(Autotune.efForTarget(spark, s"$work/nowhere", 0.5).isEmpty)
  }

  test("a mid-range target resolves to a CHEAPER ef than the 0.99 winner's") {
    // selection logic in isolation: a hand-written artifact with a
    // known recall-vs-ef frontier on the served (m, efC) — the
    // measured-grid equivalent is covered by the end-to-end tests
    // above; this pins that efForTarget actually CHOOSES among the
    // swept efs instead of always paying the strictest target's cost
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune_choose").toString
    graft.ann.AnnIndex.build(emb, "vec_id", "embedding", s"$work/index",
      graft.ann.AnnIndex.Params(Metric.L2Sq, m = 16, efConstruction = 128,
        numShards = 2))
    import spark.implicits._
    Seq(
      // served build: frontier 0.82 @ 32 -> 0.93 @ 64 -> 0.995 @ 128
      (16, 128, 32, 0.82, 10L, 1L),
      (16, 128, 64, 0.93, 10L, 1L),
      (16, 128, 128, 0.995, 10L, 1L),
      // another build's rows must NOT leak into the served selection
      (8, 96, 16, 0.99, 5L, 1L))
      .toDF("m", "ef_construction", "ef", "recall", "build_ms", "search_ms")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$work/index/autotune_results")
    val ef08 = Autotune.efForTarget(spark, s"$work/index", 0.8)
    val ef099 = Autotune.efForTarget(spark, s"$work/index", 0.99)
    assert(ef08.contains(32), s"0.8 target -> $ef08")
    assert(ef099.contains(128), s"0.99 target -> $ef099")
    assert(ef08.get < ef099.get,
      "the mid-range target must resolve to a cheaper search breadth")
    // mid frontier point: 0.9 picks the middle ef, not either extreme
    assert(Autotune.efForTarget(spark, s"$work/index", 0.9).contains(64))
  }

  test("IVF: a mid-range target resolves to a cheaper nprobe than 0.99's") {
    import graft.ann.{Autotune, IvfIndex}
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune_ivf_choose").toString
    IvfIndex.build(emb, "vec_id", "embedding", s"$work/index",
      IvfIndex.Params(nCells = 8))
    import spark.implicits._
    Seq(
      // served build (8 cells): 0.82 @ 1 -> 0.93 @ 2 -> 0.995 @ 4
      (8, 1, 0.82, 0.13, 10L, 1L),
      (8, 2, 0.93, 0.25, 10L, 1L),
      (8, 4, 0.995, 0.5, 10L, 1L),
      // a different build's rows must not leak into the selection
      (64, 1, 0.99, 0.02, 5L, 1L))
      .toDF("n_cells", "nprobe", "recall", "scan_fraction", "build_ms",
        "search_ms")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$work/index/autotune_results")
    val np08 = Autotune.nprobeForTarget(spark, s"$work/index", 0.8)
    val np099 = Autotune.nprobeForTarget(spark, s"$work/index", 0.99)
    assert(np08.contains(1) && np099.contains(4), s"$np08 / $np099")
    assert(np08.get < np099.get)
    assert(Autotune.nprobeForTarget(spark, s"$work/index", 0.9).contains(2))
    // unattainable / missing artifact -> None
    assert(Autotune.nprobeForTarget(spark, s"$work/index", 1.01).isEmpty)
    assert(Autotune.nprobeForTarget(spark, s"$work/nowhere", 0.5).isEmpty)
    // probeNprobe fallback chain
    assert(Autotune.probeNprobe(spark, s"$work/index", 7, Some(0.9)) == 2)
    assert(Autotune.probeNprobe(spark, s"$work/index", 7, Some(1.01)) == 7)
    assert(Autotune.probeNprobe(spark, s"$work/index", 7, None) == 7)
  }

  test("runIvfAndCreate builds the winner's IVF index; it answers probes exactly") {
    import graft.ann.Autotune.IvfVariant
    import graft.ann.IvfIndex
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val work = Files.createTempDirectory("autotune_ivf_create").toString
    val (report, manifest) = Autotune.runIvfAndCreate(emb, "vec_id",
      "embedding", s"$work/grid", s"$work/index", metric = Metric.L2Sq,
      k = 5, targetRecall = 0.6, sampleSize = 100, numQueries = 3,
      variants = Seq(IvfVariant(8, 2), IvfVariant(8, 8)))
    assert(report.best.nonEmpty && manifest.nonEmpty)
    assert(manifest.get.nCells == report.best.get.nCells)
    // the created index answers a q_ivf_topk-shaped all-cells probe
    // exactly (full probe = exact scan within the partitioned path)
    val corpus = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = corpus.head._2
    val exact = corpus.map { case (id, v) => (id, Metric.L2Sq.dist(q, v)) }
      .sortBy(x => (x._2, x._1)).take(5).map(_._1).toSeq
    val got = IvfIndex.topK(spark, s"$work/index", q, 5,
        nprobe = manifest.get.nCells)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)
    // the measured grid is exported alongside the index
    val exported = spark.read.parquet(s"$work/index/autotune_results")
    assert(exported.count() == 2)
    assert(exported.columns.toSet == Set("n_cells", "nprobe", "recall",
      "scan_fraction", "build_ms", "search_ms"))
  }
}
