package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, xxhash64}

/** ANN index parameter autotuning (reference: `lantern-cli
  * autotune-index`, lantern_cli/src/index_autotune/mod.rs:161-346).
  *
  * Same shape as the reference job: take a bounded sample, compute
  * exact ground truth for a handful of query vectors by sequential
  * scan, build one index per (m, ef_construction, ef) preset, measure
  * recall@k + search latency + build time, and pick the cheapest
  * variant meeting the target recall (find_best_variant,
  * mod.rs:161-186). Defaults: k=10, target recall 0.99, sample 10k
  * (cli.rs:23-33).
  */
object Autotune {

  /** Grid presets (mirroring the reference's autotune variants —
    * index_autotune/mod.rs:329-346 — ordered cheapest-first). */
  case class Variant(m: Int, efConstruction: Int, ef: Int)
  val presets: Seq[Variant] = Seq(
    Variant(6, 64, 32), Variant(8, 96, 48), Variant(12, 128, 64),
    Variant(16, 128, 64), Variant(24, 160, 96), Variant(32, 200, 128))

  /** Search-time efs measured on EVERY built (m, efConstruction)
    * variant — a deliberate DEPARTURE from the reference, which pins
    * exactly one ef per build variant
    * (lantern_cli/src/index_autotune/mod.rs:329-346) and picks the
    * winner by recall desc then latency + build time
    * (find_best_variant, mod.rs:161-186). We sweep ef independently
    * because re-searching a built graph costs milliseconds against the
    * seconds-to-minutes its build cost, and a grid with ONE ef per
    * build gives [[efForTarget]]'s "smallest qualifying ef on the
    * served graph" nothing to choose among — a 0.8 target would pay
    * the 0.99 winner's breadth. Selection is likewise deterministic
    * (first qualifying in build-major/ef-ascending order) rather than
    * the reference's latency-based pick, so re-runs on the same data
    * derive the same ef. */
  val defaultEfSweep: Seq[Int] = Seq(32, 48, 64, 96, 128, 192)

  case class Result(variant: Variant, recall: Double,
      buildMillis: Long, searchMillis: Long)

  case class Report(best: Option[Variant], results: Seq[Result])

  /** Run the grid: one throwaway index per (m, efConstruction) variant
    * in `workDir`, each searched at every ef in
    * `(efSweep :+ variant.ef).distinct.sorted` — so the exported grid
    * carries a whole recall-vs-ef frontier per graph, not one point.
    * Results are ordered build-major (preset order — the reference's
    * cheapest-first), ef ascending within a build; `best` is the first
    * result meeting the target in that order (find_best_variant,
    * mod.rs:161-186). `buildMillis` is the graph's one-time build cost,
    * repeated on each of its ef rows; `searchMillis` is per (graph,
    * ef). */
  def run(df: DataFrame, idCol: String, vecCol: String, workDir: String,
      metric: Metric = Metric.L2Sq, k: Int = 10, targetRecall: Double = 0.99,
      sampleSize: Int = 10000, numQueries: Int = 10,
      variants: Seq[Variant] = presets,
      efSweep: Seq[Int] = defaultEfSweep): Report = {
    val spark = df.sparkSession
    val st = sampleTruth(df, idCol, vecCol, metric, k, sampleSize, numQueries)
    try {
      // all probe queries batch through ONE topKJoin job per (build,
      // ef) point: per-probe topK jobs made the sweep's cost pure
      // job-launch overhead (360 jobs for a 6-build x 6-ef x 10-query
      // grid), and topKJoin's per-query merge is ordered identically
      // to topK's (dist asc, id asc, take k)
      import spark.implicits._
      val qdf = st.queries.zipWithIndex
        .map { case (q, i) => (i.toLong, q.toSeq) }.toSeq
        .toDF("qid", "qv")
      // grid points are INDEPENDENT jobs (each variant builds into its
      // own dir and probes only its own graph), so a small driver pool
      // overlaps one variant's straggler tail with the next variant's
      // build (guide §2.6): the sweep was a strictly sequential chain
      // of ~6 builds + ~40 probe collects. Futures preserve variant
      // order, so `best` (first qualifying, build-major/ef-ascending)
      // and the exported grid are bit-identical to the sequential run.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(3, math.max(variants.size, 1)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val results =
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            variants.zipWithIndex.map { case (v, i) =>
              scala.concurrent.Future {
                spark.sparkContext.setJobDescription(
                  s"autotune hnsw variant $i (m=${v.m}, efc=${v.efConstruction})")
                val dir = s"$workDir/variant_$i"
                val t0 = System.nanoTime()
                AnnIndex.build(st.sample, idCol, vecCol, dir,
                  AnnIndex.Params(metric, v.m, v.efConstruction, numShards = 4))
                val builtMs = (System.nanoTime() - t0) / 1000000
                (efSweep :+ v.ef).distinct.sorted.map { ef =>
                  val t1 = System.nanoTime()
                  val byQuery: Map[Long, Set[Long]] =
                    AnnIndex.topKJoin(qdf, "qid", "qv", dir, k, ef)
                      .select(col("query_id"), col("id")).collect()
                      .groupBy(_.getLong(0))
                      .map { case (qid, rows) =>
                        qid -> rows.map(r => idOf(r, 1)).toSet }
                  val hits = st.truth.zipWithIndex.map { case (exact, qi) =>
                    exact.intersect(byQuery.getOrElse(qi.toLong, Set.empty)).size
                  }.sum
                  val searchMs = (System.nanoTime() - t1) / 1000000
                  Result(Variant(v.m, v.efConstruction, ef),
                    hits.toDouble / st.denom, builtMs, searchMs)
                }
              }
            }),
          scala.concurrent.duration.Duration.Inf).flatten
        finally pool.shutdown()
      // cheapest (build-major, ef-ascending) result meeting the target
      val best = results.find(_.recall >= targetRecall).map(_.variant)
      Report(best, results)
    } finally st.sample.unpersist()
  }

  /** Shared grid scaffolding: uniform hash-order sample (not a prefix —
    * same reasoning as Pq.trainingSample: a limit() prefix on a
    * source-ordered corpus tunes against one domain's slice), probe
    * queries, and exact ground truth by full scan (mod.rs:188-218).
    * The recall denominator uses min(k, |sample|): on a corpus smaller
    * than k even a perfect index can only return |sample| rows, and a
    * k-based denominator would reject every variant. */
  private case class SampleTruth(sample: DataFrame,
      local: Array[(Long, Array[Float])], queries: Array[Array[Float]],
      truth: Seq[Set[Long]], denom: Double)

  /** Column `at` as Long regardless of the table's id type (topK
    * preserves the source column type). */
  private def idOf(r: org.apache.spark.sql.Row, at: Int = 0): Long =
    r.get(at).asInstanceOf[Number].longValue()

  private def sampleTruth(df: DataFrame, idCol: String, vecCol: String,
      metric: Metric, k: Int, sampleSize: Int,
      numQueries: Int): SampleTruth = {
    val sample = df.select(idCol, vecCol)
      .orderBy(xxhash64(col(idCol), lit(42L)).asc)
      .limit(sampleSize).cache()
    val local: Array[(Long, Array[Float])] = sample.collect()
      .map(r => (idOf(r), r.getSeq[Float](1).toArray))
    val queries = local.sortBy(_._1).take(numQueries).map(_._2)
    val effK = math.min(k, local.length)
    val truth: Seq[Set[Long]] = queries.map { q =>
      local.map { case (id, v) => (id, metric.dist(q, v)) }
        .sortBy(x => (x._2, x._1)).take(k).map(_._1).toSet
    }.toSeq
    SampleTruth(sample, local, queries, truth,
      math.max(effK * queries.length, 1).toDouble)
  }

  /** IVF grid presets, cheapest-first (scan fraction nprobe/nCells
    * ascending within each build): the routed-path analog of the HNSW
    * (m, efc, ef) variants. nprobe is a search-time knob, so one build
    * per distinct nCells serves every nprobe row. */
  case class IvfVariant(nCells: Int, nprobe: Int)
  val ivfPresets: Seq[IvfVariant] = Seq(
    IvfVariant(16, 1), IvfVariant(16, 2), IvfVariant(16, 4),
    IvfVariant(16, 8), IvfVariant(16, 16),
    IvfVariant(64, 4), IvfVariant(64, 8), IvfVariant(64, 16))

  /** `scanFraction` is MEASURED, not nprobe/nCells: the mean over the
    * probe queries of (rows in the probed cells) / (total rows) —
    * cell-size skew makes the two differ, and the measured number is
    * the cost a 100 TB scan actually pays. */
  case class IvfResult(variant: IvfVariant, recall: Double,
      scanFraction: Double, buildMillis: Long, searchMillis: Long)

  case class IvfReport(best: Option[IvfVariant], results: Seq[IvfResult])

  /** The routed-path grid (reference find_best_variant semantics,
    * index_autotune/mod.rs:161-186: first variant in cheapest-first
    * order meeting the recall target wins). One IVF build per distinct
    * nCells; recall@k measured against an exact scan of the sample. */
  def runIvf(df: DataFrame, idCol: String, vecCol: String, workDir: String,
      metric: Metric = Metric.L2Sq, k: Int = 10, targetRecall: Double = 0.9,
      sampleSize: Int = 10000, numQueries: Int = 10,
      variants: Seq[IvfVariant] = ivfPresets): IvfReport = {
    val spark = df.sparkSession
    val st = sampleTruth(df, idCol, vecCol, metric, k, sampleSize, numQueries)
    try {
      val total = st.local.length.toDouble

      // distinct-nCells builds are independent (own dirs) — overlap
      // them on a small driver pool (guide §2.6), same discipline as
      // the HNSW grid above
      val byCells = variants.map(_.nCells).distinct
      val buildPool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(3, math.max(byCells.size, 1)))
      implicit val buildEc: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(buildPool)
      val built: Map[Int, (String, Long, Array[Array[Float]], Map[Int, Long])] =
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(byCells.map { nc =>
            scala.concurrent.Future {
              spark.sparkContext.setJobDescription(
                s"autotune ivf build (nCells=$nc)")
              val dir = s"$workDir/ivf_$nc"
              val t0 = System.nanoTime()
              val cents = IvfIndex.build(st.sample, idCol, vecCol, dir,
                IvfIndex.Params(nCells = nc, metric = metric))
              val buildMs = (System.nanoTime() - t0) / 1000000
              val sizes: Map[Int, Long] = spark.read
                .parquet(s"$dir/cells").groupBy(col("cell_id"))
                .count().collect()
                .map(r => r.getInt(0) -> r.getLong(1)).toMap
              nc -> (dir, buildMs, cents, sizes)
            }(buildEc)
          }),
          scala.concurrent.duration.Duration.Inf).toMap
        finally buildPool.shutdown()

      // one routed topKJoin job per variant (the same batching as the
      // HNSW sweep — per-probe topK jobs were pure launch overhead),
      // probed concurrently: each variant reads only its own built
      // index, and Future.sequence preserves variant order so `best`
      // (first qualifying, cheapest-first) is unchanged
      import spark.implicits._
      val qdf = st.queries.zipWithIndex
        .map { case (q, i) => (i.toLong, q.toSeq) }.toSeq
        .toDF("qid", "qv")
      val probePool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(3, math.max(variants.size, 1)))
      val probeEc: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(probePool)
      val results =
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(variants.map { v =>
            scala.concurrent.Future {
              spark.sparkContext.setJobDescription(
                s"autotune ivf probe (nCells=${v.nCells}, nprobe=${v.nprobe})")
              val (dir, buildMs, cents, sizes) = built(v.nCells)
              val t1 = System.nanoTime()
              val byQuery: Map[Long, Set[Long]] =
                IvfIndex.topKJoin(qdf, "qid", "qv", dir, k, v.nprobe)
                  .select(col("query_id"), col("id")).collect()
                  .groupBy(_.getLong(0))
                  .map { case (qid, rows) =>
                    qid -> rows.map(r => idOf(r, 1)).toSet }
              val hits = st.truth.zipWithIndex.map { case (exact, qi) =>
                exact.intersect(byQuery.getOrElse(qi.toLong, Set.empty)).size
              }.sum
              val searchMs = (System.nanoTime() - t1) / 1000000
              // measured scan fraction: rows in each query's nprobe
              // nearest cells (ties broken by cell id, matching the
              // probe path)
              val frac = st.queries.map { q =>
                val probed = cents.zipWithIndex
                  .map { case (c, i) => (metric.dist(q, c), i) }
                  .sortBy(identity).take(v.nprobe).map(_._2)
                probed.map(i => sizes.getOrElse(i, 0L)).sum.toDouble / total
              }.sum / st.queries.length
              IvfResult(v, hits.toDouble / st.denom, frac, buildMs, searchMs)
            }(probeEc)
          })(
            implicitly[scala.collection.BuildFrom[Seq[scala.concurrent.Future[IvfResult]], IvfResult, Seq[IvfResult]]],
            probeEc),
          scala.concurrent.duration.Duration.Inf)
        finally probePool.shutdown()
      val best = results.find(_.recall >= targetRecall).map(_.variant)
      IvfReport(best, results)
    } finally st.sample.unpersist()
  }

  /** Run the grid and, like the reference's `--create-index`, build the
    * full-table index with the winning variant. The measured grid is
    * exported alongside the index as `<indexPath>/autotune_results`
    * parquet (the durable analog of the reference's exported results
    * table, index_autotune/cli.rs `--export`) so search-time ef can be
    * DERIVED from a recall target via [[efForTarget]] instead of
    * pinned — fixed HNSW parameters decay with corpus size (measured:
    * ef=64 → recall 0.795 at 200k vectors where 0.97+ at ≤20k).
    * Returns the report and the built manifest (None when no variant
    * met the target). */
  def runAndCreate(df: DataFrame, idCol: String, vecCol: String,
      workDir: String, indexPath: String, metric: Metric = Metric.L2Sq,
      k: Int = 10, targetRecall: Double = 0.99, sampleSize: Int = 10000,
      numQueries: Int = 10, numShards: Int = 0,
      variants: Seq[Variant] = presets,
      efSweep: Seq[Int] = defaultEfSweep): (Report, Option[AnnIndex.Manifest]) = {
    val spark = df.sparkSession
    val report = run(df, idCol, vecCol, workDir, metric, k, targetRecall,
      sampleSize, numQueries, variants, efSweep)
    val manifest = report.best.map { v =>
      val m = AnnIndex.build(df, idCol, vecCol, indexPath,
        AnnIndex.Params(metric, v.m, v.efConstruction, numShards))
      import spark.implicits._
      report.results
        .map(r => (r.variant.m, r.variant.efConstruction, r.variant.ef,
          r.recall, r.buildMillis, r.searchMillis))
        .toDF("m", "ef_construction", "ef", "recall", "build_ms",
          "search_ms")
        .repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexPath/autotune_results")
      m
    }
    (report, manifest)
  }

  /** Search-time ef for a requested recall target, derived from the
    * `autotune_results` artifact [[runAndCreate]] exports next to the
    * index — the Spark analog of the reference's cost-estimation +
    * autotune pairing (lantern_cli/src/index_autotune/mod.rs:161-186).
    * Only rows measured at the SERVED index's build parameters count:
    * the artifact holds one row per grid variant, but a recall
    * measured on an (m, efConstruction) the index was not built with
    * says nothing about the served graph — so the rows filter to the
    * manifest's (m, efConstruction) first, then the smallest
    * qualifying ef wins. Returns None when no artifact/manifest
    * exists or no variant of the BUILT graph met the target (callers
    * fall back to an explicit ef, surfacing the gap instead of
    * silently under-recalling). */
  /** Directory content stamp for fingerprinting: a hash of the sorted
    * (name, length, mtime) triples of the directory's direct children
    * plus the directory's own mtime. Mtime alone is NOT enough (ADVICE
    * r12): on filesystems with 1 s mtime granularity, or object stores
    * without reliable directory mtimes, a rapid re-autotune can leave
    * the stamp unchanged and serve a stale derived ef/nprobe. File
    * NAMES catch that case deterministically — every Spark parquet
    * overwrite writes fresh `part-*-<uuid>` names — and lengths/mtimes
    * back them up for non-Spark writers that reuse names. */
  /** Shared by every fingerprint-cached artifact consumer (the
    * derived-ef cache here; the parquet-boundary pipeline runner in
    * [[graft.operators.PipelineBoundaries]]): one 64-bit stamp of a
    * directory listing — child (name, length, mtime) triples plus the
    * directory's own mtime — that moves whenever the artifact is
    * rewritten (fresh part-file names) or grown. */
  private[graft] def listingStamp(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val children = fs.listStatus(p)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1)
    scala.util.hashing.MurmurHash3.seqHash(children).toLong ^
      (fs.getFileStatus(p).getModificationTime << 32)
  }

  /** Cache-invalidation fingerprint for a derived-ef consumer: the
    * `autotune_results` artifact's [[listingStamp]] (a re-autotune of
    * the same path overwrites the directory — SaveMode.Overwrite in
    * [[runAndCreate]] — writing fresh part-file names, so the stamp
    * moves even under coarse mtime granularity) paired with the index
    * manifest's row count (an append/stream-append grows the index
    * WITHOUT re-measuring recall — the manifest count moves, so a
    * cached ef measured on the smaller graph stops matching). None
    * when either the artifact or a readable manifest is missing —
    * exactly the cases [[efForTarget]] returns None for, so callers
    * treat None as "nothing to cache". */
  def artifactFingerprint(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/autotune_results")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      if (!fs.exists(p)) None
      else Some((listingStamp(fs, p),
        AnnIndex.readManifest(indexPath).count))
    } catch { case _: Exception => None }
  }

  def efForTarget(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, targetRecall: Double): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/autotune_results")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val man =
      try AnnIndex.readManifest(indexPath)
      catch { case _: Exception => return None }
    spark.read.parquet(p.toString)
      .filter(col("m") === man.m &&
        col("ef_construction") === man.efConstruction &&
        col("recall") >= targetRecall)
      .orderBy(col("ef").asc)
      .limit(1).collect()
      .headOption.map(_.getAs[Int]("ef"))
  }

  /** Fingerprint-cached [[efForTarget]] — the resolution every
    * serving-path consumer (the transparent rewrite, topKJoin,
    * classifyAnn, weighted search) goes through, so the driver-side
    * parquet read is paid once per (index, target, artifact version)
    * instead of per query. A hit is served only while
    * [[artifactFingerprint]] is unchanged: a re-autotune (artifact
    * overwritten) or an append (manifest count moved) drops it and
    * re-derives. A miss (no artifact, unreadable manifest, or no
    * qualifying variant) is never cached — an artifact exported later
    * must take effect on the next resolution. */
  def efForTargetCached(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, targetRecall: Double): Option[Int] =
    artifactFingerprint(spark, indexPath).flatMap { fp =>
      val key = (indexPath, targetRecall)
      derivedEfCache.get(key) match {
        case Some((cachedFp, ef)) if cachedFp == fp => Some(ef)
        case _ =>
          val r = efForTarget(spark, indexPath, targetRecall)
          r.foreach(ef => derivedEfCache.put(key, (fp, ef)))
          r
      }
    }

  private val derivedEfCache =
    scala.collection.concurrent.TrieMap[(String, Double), ((Long, Long), Int)]()

  /** The ef an index probe should use: derived from the index's
    * autotune artifact when a recall target is given and resolvable
    * (the sf10 lesson — a pinned ef silently decays as the corpus
    * grows), else the caller's explicit ef. The explicit-ef fallback
    * surfaces the gap deliberately: an index with no measured artifact
    * has no basis for a recall claim, so the caller's number stands. */
  def probeEf(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      ef: Int, targetRecall: Option[Double]): Int =
    targetRecall.flatMap(efForTargetCached(spark, indexPath, _))
      .getOrElse(ef)

  /** IVF analog of [[efForTarget]]: the cheapest measured nprobe
    * meeting the target ON THE SERVED nCells, from the
    * `autotune_results` artifact [[runIvfAndCreate]] exports. nprobe
    * is the IVF search-breadth knob exactly as ef is HNSW's — a
    * pinned nprobe's recall decays identically as cells fill — and
    * "cheapest" is the smallest nprobe because the routed scan cost
    * is monotone in it (the artifact's measured scan_fraction).
    * Returns None when no artifact/manifest exists or no measured
    * nprobe of the built nCells met the target. */
  def nprobeForTarget(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, targetRecall: Double): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/autotune_results")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val man =
      try IvfIndex.readManifest(indexPath)
      catch { case _: Exception => return None }
    spark.read.parquet(p.toString)
      .filter(col("n_cells") === man.nCells &&
        col("recall") >= targetRecall)
      .orderBy(col("nprobe").asc)
      .limit(1).collect()
      .headOption.map(_.getAs[Int]("nprobe"))
  }

  /** Fingerprint for the derived-nprobe cache: the artifact's
    * [[listingStamp]] (a re-autotune overwrites it with fresh part
    * names) + the cells directory's stamp (an append/stream-append
    * adds generation batches under it without re-measuring recall —
    * the IVF manifest carries no row count, so the cells listing is
    * the growth signal). */
  def ivfArtifactFingerprint(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/autotune_results")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      if (!fs.exists(p)) None
      else {
        val man = IvfIndex.readManifest(indexPath)
        val cells = new org.apache.hadoop.fs.Path(
          s"$indexPath/${man.cellsDir}")
        Some((listingStamp(fs, p), listingStamp(fs, cells)))
      }
    } catch { case _: Exception => None }
  }

  /** Fingerprint-cached [[nprobeForTarget]] — same contract as
    * [[efForTargetCached]]: hits survive only while the artifact and
    * the cells tree are unchanged; misses are never cached. */
  def nprobeForTargetCached(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, targetRecall: Double): Option[Int] =
    ivfArtifactFingerprint(spark, indexPath).flatMap { fp =>
      val key = (indexPath, targetRecall)
      derivedNprobeCache.get(key) match {
        case Some((cachedFp, np)) if cachedFp == fp => Some(np)
        case _ =>
          val r = nprobeForTarget(spark, indexPath, targetRecall)
          r.foreach(np => derivedNprobeCache.put(key, (fp, np)))
          r
      }
    }

  private val derivedNprobeCache =
    scala.collection.concurrent.TrieMap[(String, Double), ((Long, Long), Int)]()

  /** The nprobe an IVF probe should use — [[probeEf]]'s routed-path
    * twin: artifact-derived when a target is given and resolvable,
    * the caller's explicit nprobe otherwise. */
  def probeNprobe(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, nprobe: Int, targetRecall: Option[Double]): Int =
    targetRecall.flatMap(nprobeForTargetCached(spark, indexPath, _))
      .getOrElse(nprobe)

  /** IVF parity of [[runAndCreate]] (reference `--create-index` +
    * `--export`, lantern_cli/src/index_autotune/cli.rs): run the IVF
    * grid and build the full-table index at the winner's nCells (nprobe
    * is a search-time knob — callers read it off `report.best`). The
    * measured grid is exported alongside the index as
    * `<indexPath>/autotune_results` parquet — the durable analog of the
    * reference's exported results table. */
  def runIvfAndCreate(df: DataFrame, idCol: String, vecCol: String,
      workDir: String, indexPath: String, metric: Metric = Metric.L2Sq,
      k: Int = 10, targetRecall: Double = 0.9, sampleSize: Int = 10000,
      numQueries: Int = 10, variants: Seq[IvfVariant] = ivfPresets)
      : (IvfReport, Option[IvfIndex.Manifest]) = {
    val spark = df.sparkSession
    val report = runIvf(df, idCol, vecCol, workDir, metric, k, targetRecall,
      sampleSize, numQueries, variants)
    val manifest = report.best.map { v =>
      IvfIndex.build(df, idCol, vecCol, indexPath,
        IvfIndex.Params(nCells = v.nCells, metric = metric))
      import spark.implicits._
      report.results
        .map(r => (r.variant.nCells, r.variant.nprobe, r.recall,
          r.scanFraction, r.buildMillis, r.searchMillis))
        .toDF("n_cells", "nprobe", "recall", "scan_fraction",
          "build_ms", "search_ms")
        .repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexPath/autotune_results")
      IvfIndex.readManifest(indexPath)
    }
    (report, manifest)
  }
}
