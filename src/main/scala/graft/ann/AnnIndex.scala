package graft.ann

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import scala.collection.concurrent.TrieMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ANN index: sharded HNSW artifacts + a manifest, built and
  * probed as Spark jobs.
  *
  * Layout under `indexPath`:
  * {{{
  *   manifest.properties     metric, dim, m, ef_construction, count, shards
  *   shard_00000.hnsw        one [[Hnsw]] graph per build partition
  *   tombstones-g<n>.bin     sorted packed-long deleted ids (optional;
  *                           monotonic generations, highest wins)
  * }}}
  *
  * The manifest mirrors the reference's index header
  * (lantern_hnsw/src/hnsw/external_index.h:38-56: m, ef_construction,
  * metric, dim, num_vectors); a shard file is the analog of the usearch
  * blob. Build = the reference's external-index job model
  * (build.c:527-587) expressed as mapPartitions; search = per-shard
  * top-k then a global k-row merge (TakeOrderedAndProject shape);
  * deletes = tombstone anti-join, compacted by [[vacuum]] (the reference
  * also leaves deleted labels in the graph and skips them at scan —
  * scan.c:294-300, delete.c).
  *
  * Scale: shards build in parallel (one graph per partition fits
  * executor memory — size shards accordingly), searches touch every
  * shard but return only k rows each, so the merge is k x shards rows —
  * trivial at any corpus size. Shard graphs are cached per executor JVM.
  */
object AnnIndex {

  /** Build parameters. Defaults = reference options.h:14-25. */
  case class Params(
      metric: Metric = Metric.L2Sq,
      m: Int = 16,
      efConstruction: Int = 128,
      numShards: Int = 0, // 0 = keep input partitioning
      pq: Option[graft.pq.Codebook] = None) // PQ-in-index (ADC search)

  case class Manifest(metric: Metric, dim: Int, m: Int, efConstruction: Int,
      count: Long, shards: Seq[String], pq: Boolean = false)

  /** Build a sharded index from (id, vector) rows. Returns the manifest. */
  def build(df: DataFrame, idCol: String, vecCol: String, indexPath: String,
      params: Params = Params()): Manifest = {
    val spark = df.sparkSession
    val data = df.select(col(idCol).cast("long"), col(vecCol))
    // hash-partition by id, not round-robin, AND sort each shard by id:
    // composition alone isn't enough — shuffle-read rows arrive in
    // block-fetch order, which varies across runs on a multi-executor
    // cluster, and HNSW graph structure depends on insertion order. With
    // both, every shard graph is a pure function of the data, so recall
    // (and any recall-derived contract row) is invariant to input
    // splits, host, and core count.
    // (numShards = 0 keeps the caller's partitioning — composition then
    // follows the input split — but insertion order is still pinned)
    val parts =
      if (params.numShards > 0)
        data.repartition(params.numShards, col(data.columns.head))
          .sortWithinPartitions(col(data.columns.head))
      else data.sortWithinPartitions(col(data.columns.head))
    val metricId = params.metric.id
    val (m, efc) = (params.m, params.efConstruction)
    val pqOpt = params.pq
    val pathStr = indexPath

    val shardInfo: Array[(String, Long, Int)] =
      parts.rdd.mapPartitionsWithIndex { (pid, rows) =>
        val buf = rows.map { r =>
          (r.getLong(0), r.getSeq[Float](1).toArray)
        }.toArray
        if (buf.isEmpty) Iterator.empty
        else {
          val dim = buf.head._2.length
          val h = new Hnsw(dim, Metric.fromId(metricId), m, efc,
            seed = pid.toLong, pq = pqOpt)
          buf.foreach { case (id, v) => h.insert(id, v) }
          val name = f"shard_$pid%05d.hnsw"
          val p = new Path(pathStr, name)
          val fs = p.getFileSystem(new Configuration())
          // task-attempt isolation: write to an attempt-unique temp file
          // and rename on success, so a speculative/retried task cannot
          // clobber a committed shard mid-write
          val attempt = org.apache.spark.TaskContext.get() match {
            case null => s"local-${System.nanoTime()}"
            case tc => tc.taskAttemptId().toString
          }
          val tmp = new Path(pathStr, s"$name.tmp-$attempt")
          val out = new DataOutputStream(new BufferedOutputStream(fs.create(tmp, true)))
          try h.write(out) finally out.close()
          if (fs.exists(p)) fs.delete(p, false)
          if (!fs.rename(tmp, p)) {
            fs.delete(tmp, false)
            require(fs.exists(p), s"failed to commit shard $name")
          }
          Iterator.single((name, buf.length.toLong, dim))
        }
      }.collect()

    require(shardInfo.nonEmpty, "cannot build an index from an empty DataFrame")
    val dims = shardInfo.map(_._3).distinct
    require(dims.length == 1,
      s"expected equally sized arrays across shards, got dims ${dims.mkString(",")}")
    val man = Manifest(params.metric, dims.head, m, efc,
      shardInfo.map(_._2).sum, shardInfo.map(_._1).sorted.toIndexedSeq,
      pq = params.pq.isDefined)
    writeManifest(indexPath, man)
    man
  }

  /** Append new rows as additional shards (reference model: INSERT
    * maintains the graph online, insert.c; Spark model: batch append +
    * periodic rebuild). */
  def append(df: DataFrame, idCol: String, vecCol: String,
      indexPath: String, subdir: Option[String] = None): Manifest = {
    val existing = readManifest(indexPath)
    // appended shards must match the existing storage mode: recover the
    // codebook from an existing shard for a PQ index (mixing raw and
    // ADC-approximated distances would bias the merged top-k)
    val cb =
      if (!existing.pq) None
      else ShardCache.get(s"$indexPath/${existing.shards.head}").pq
    val stage = subdir.getOrElse(s"append_${existing.shards.length}")
    val appended = build(df, idCol, vecCol, s"$indexPath/$stage",
      Params(existing.metric, existing.m, existing.efConstruction, pq = cb))
    require(appended.dim == existing.dim,
      s"expected equally sized arrays but got dimensions ${appended.dim} and ${existing.dim}")
    val merged = existing.copy(
      count = existing.count + appended.count,
      shards = existing.shards ++ appended.shards.map(s => s"$stage/$s"))
    writeManifest(indexPath, merged)
    merged
  }

  /** Continuous index maintenance: stream (id, vector) rows from a
    * parquet directory into the index, appending one shard batch per
    * micro-batch (foreachBatch -> [[append]]) — the Spark-native
    * expression of the reference daemon's insert loop
    * (daemon/embedding_jobs.rs:1147-1260: LISTEN/NOTIFY -> batch ->
    * insert into index). `Trigger.AvailableNow` drains the backlog and
    * stops; pass a processing-time trigger for a long-running feed.
    *
    * Exactly-once: the checkpoint is REQUIRED (it pins batch ids across
    * restarts) and the apply itself is idempotent per batch id — each
    * batch's shards stage under a batchId-derived directory, so a
    * re-delivered batch (at-least-once foreachBatch semantics after a
    * mid-batch failure) is detected in EVERY crash window: marker
    * present -> skip; manifest already lists `batch_<id>/` shards
    * (crash after the manifest commit, before the marker) -> write the
    * marker only; partial uncommitted stage (crash mid-build) -> drop
    * the stage and redo. `manifest.count` stays exact across any
    * replay. Micro-batches with zero rows just write their marker (an
    * empty append would fail the empty-DataFrame build guard). */
  def streamAppend(spark: SparkSession, srcPath: String,
      schema: org.apache.spark.sql.types.StructType, idCol: String,
      vecCol: String, indexPath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcPath)
    src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        applyStreamBatch(batch.toDF(), batchId, idCol, vecCol, indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Idempotent body of one [[streamAppend]] micro-batch (package
    * visibility so specs can replay it around simulated crashes). */
  private[graft] def applyStreamBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, indexPath: String): Unit = {
    val marker = new Path(indexPath, s"_applied_batch_$batchId")
    // the BATCH's session Hadoop conf (not the thread-local active
    // session, which foreachBatch's executor thread may not carry):
    // the marker is the commit point, and a bare Configuration cannot
    // reach spark.hadoop.*-configured stores
    val fs = marker.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(marker)) return
    val stage = s"batch_$batchId"
    val man = readManifest(indexPath)
    if (man.shards.exists(_.startsWith(stage + "/"))) {
      // crash window B: the previous attempt committed the manifest but
      // died before the marker — the batch is in the index; record it
      fs.create(marker, true).close()
    } else {
      // crash window A: a previous attempt may have staged shards
      // without committing the manifest — drop them and redo cleanly
      val stageDir = new Path(indexPath, stage)
      if (fs.exists(stageDir)) fs.delete(stageDir, true)
      if (!batch.isEmpty) append(batch, idCol, vecCol, indexPath, Some(stage))
      fs.create(marker, true).close()
    }
  }

  /** Record deleted ids; searches skip them inside the shard graphs
    * (scan.c:294-300 semantics — labels invalidated, skipped at scan).
    * Storage is a sorted packed-long file (`tombstones.bin`): 8 bytes
    * per id, readable on executors straight through the Hadoop FS with
    * no Spark job, binary-searchable once mapped into memory — a
    * million deletes is an 8 MB artifact, never a driver-held Set on
    * the probe path. */
  def delete(spark: SparkSession, indexPath: String, ids: Seq[Long]): Unit = {
    // read-merge-write: concurrent delete() calls on one index must be
    // serialized by the caller (the reference serializes via table
    // locks). Readers never hit a gap: each write is a NEW immutable
    // generation file (tombstones-g<n>.bin, readers pick the highest
    // generation) and only generations older than the previous one are
    // pruned, so a reader that listed just before a delete still finds
    // its file intact. The generation number is parsed from the newest
    // existing file and incremented — NOT derived from a clock — so
    // write order always matches generation order even when deletes
    // come from different JVMs/hosts against shared storage (a clock
    // like nanoTime has a per-boot origin: a "newer" delete could sort
    // before an older one and be served stale, or pruned outright).
    val fs = new Path(indexPath).getFileSystem(
      spark.sessionState.newHadoopConf())
    // merge from a FRESH listing, never the TTL probe cache: merging a
    // <TTL-stale set here would resurrect another JVM's recent deletes
    // into the new (winning) generation
    val merged = (TombstoneCache.getFresh(indexPath) ++ ids).distinct.sorted
    val next = TombstoneCache.nextGeneration(indexPath, fs)
    TombstoneCache.writeGeneration(indexPath, fs, next, merged)
    // prune all but the newest two generations + any legacy files
    val gens = TombstoneCache.generationFiles(indexPath, fs)
    gens.sortBy(TombstoneCache.genOrder).dropRight(2)
      .foreach(fs.delete(_, false))
    val legacyBin = new Path(indexPath, "tombstones.bin")
    if (fs.exists(legacyBin)) fs.delete(legacyBin, false)
    val legacyTxt = new Path(indexPath, "tombstones.txt")
    if (fs.exists(legacyTxt)) fs.delete(legacyTxt, false)
    // same-JVM probes see the new generation immediately; remote
    // executors converge within the listing TTL
    TombstoneCache.invalidateListing(indexPath)
  }

  private[ann] val TombstoneMagic = 0x47544f4d // "GTOM"

  /** Executor-side tombstone predicate for a probe (null = no deletes;
    * the search skips the filter branch entirely). Shared by every
    * probe path so skip semantics cannot diverge. */
  private def tombstoneSkip(indexPath: String): Long => Boolean = {
    val dead = TombstoneCache.get(indexPath)
    if (dead.isEmpty) null
    else id => java.util.Arrays.binarySearch(dead, id) >= 0
  }

  def tombstones(indexPath: String): Seq[Long] =
    TombstoneCache.get(indexPath).toSeq

  /** Rebuild the index without tombstoned rows (graph compaction the
    * reference never does — delete.c leaves holes forever).
    *
    * Fully distributed: the driver never materializes a single vector.
    * Shard PATHS parallelize one-per-task; each task loads its shard on
    * an executor, anti-joins the tombstone set there (binary search over
    * the packed file, read fresh — compacting against a <TTL-stale
    * cached set would bake a recently deleted row into the rebuilt
    * index with no tombstone), and streams the survivors straight into
    * [[build]]'s per-partition graph construction. Driver traffic is
    * shard names + the manifest — a 100 M x 1536d index compacts
    * without ever exceeding a few MB of driver heap (VacuumSpec asserts
    * the plan is RDD-backed, not a driver LocalRelation). */
  def vacuum(spark: SparkSession, indexPath: String, outPath: String): Manifest = {
    val man = readManifest(indexPath)
    build(survivors(spark, indexPath, man), "id", "vec", outPath,
      Params(man.metric, man.m, man.efConstruction))
  }

  /** The index's live (id, vector) rows as a distributed DataFrame, one
    * input partition per shard (exposed to specs so the no-driver-
    * materialization property is assertable on the plan). */
  private[graft] def survivors(spark: SparkSession, indexPath: String,
      man: Manifest): DataFrame = {
    require(!man.pq,
      "vacuum needs raw vectors; a PQ index stores only codes - rebuild from the source table instead")
    val shardPaths = man.shards.map(s => s"$indexPath/$s")
    val idxPath = indexPath
    import spark.implicits._
    spark.sparkContext
      .parallelize(shardPaths, math.max(shardPaths.size, 1))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val h = ShardCache.get(p)
          require(h.pq.isEmpty,
            "vacuum needs raw vectors; a PQ index stores only codes - rebuild from the source table instead")
          val dead = TombstoneCache.getFresh(idxPath)
          h.ids.indices.iterator
            .filter(i => java.util.Arrays.binarySearch(dead, h.ids(i)) < 0)
            .map(i => (h.ids(i), h.vecs(i)))
        }
      }
      .toDF("id", "vec")
  }

  /** Approximate top-k: per-shard HNSW search (k candidates each, search
    * breadth `ef`), tombstones skipped INSIDE each shard search (the
    * graph still navigates through dead nodes, they just cannot enter
    * the result set), global top-k merge. Returns (id, dist) ascending.
    * No tombstone state ever lives on the driver: each executor reads
    * the packed tombstone file once per version and binary-searches it. */
  def topK(spark: SparkSession, indexPath: String, query: Array[Float],
      k: Int, ef: Int = 64): DataFrame = {
    val man = readManifest(indexPath)
    import spark.implicits._
    val shardPaths = man.shards.map(s => s"$indexPath/$s")
    val idxPath = indexPath
    val hits = spark.createDataset(shardPaths)
      .repartition(math.min(shardPaths.size, 64))
      .mapPartitions { paths =>
        val skip = tombstoneSkip(idxPath)
        paths.flatMap { p =>
          ShardCache.get(p).search(query, k, math.max(ef, k), skip)
        }
      }
      .toDF("id", "dist")
    hits.orderBy(col("dist").asc, col("id").asc).limit(k)
  }

  /** [[topK]] with the search breadth DERIVED from a recall target via
    * the index's `autotune_results` artifact ([[Autotune.runAndCreate]]
    * exports it; [[Autotune.efForTarget]] resolves the cheapest
    * measured variant meeting the target) instead of a caller-pinned
    * constant — a fixed ef silently decays as the corpus grows
    * (measured: ef=64 → recall 0.795 at 200k vectors). `fallbackEf`
    * applies only when the index has no artifact or no measured
    * variant met the target. */
  def topKAtRecall(spark: SparkSession, indexPath: String,
      query: Array[Float], k: Int, targetRecall: Double,
      fallbackEf: Int = 64): DataFrame =
    topK(spark, indexPath, query, k,
      Autotune.probeEf(spark, indexPath, fallbackEf, Some(targetRecall)))

  /** Batch KNN join: top-k index neighbors for EVERY row of a query
    * DataFrame in ONE job — the throughput shape of batch scoring
    * (embed-then-retrieve pipelines, recall evaluation, k-NN
    * classification) where per-query driver round-trips would dominate.
    * Queries partition across executors; each task probes the
    * LRU-cached shard graphs locally and merges per-query results, so
    * an executor downloads each shard at most once per eviction
    * lifetime and the driver never sees more than the final
    * (queries x k) rows. Returns (query_id, id, dist, rank). */
  def topKJoin(queries: DataFrame, idCol: String, vecCol: String,
      indexPath: String, k: Int, ef: Int = 64,
      targetRecall: Option[Double] = None): DataFrame = {
    val man = readManifest(indexPath)
    val spark = queries.sparkSession
    val shardPaths = man.shards.map(s => s"$indexPath/$s")
    val idxPath = indexPath
    // recall-target serving (the sf10 lesson: a pinned ef decays as
    // the corpus grows) — derived from the index's autotune artifact
    // when resolvable, the explicit ef otherwise
    val effEf = Autotune.probeEf(spark, indexPath, ef, targetRecall)
    import spark.implicits._
    queries.select(col(idCol).cast("long"), col(vecCol))
      // null vectors have no neighbors; null (or uncastable) ids would
      // fail the non-nullable tuple encoder mid-job
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty // don't load shards for nothing
        else {
          val skip = tombstoneSkip(idxPath)
          val graphs = shardPaths.map(ShardCache.get)
          rows.flatMap { case (qid, qv) =>
            val q = qv.toArray
            graphs.flatMap(_.search(q, k, math.max(effEf, k), skip))
              .sortBy(x => (x._2, x._1))
              .take(k)
              .zipWithIndex
              .map { case ((nid, d), r) => (qid, nid, d, r + 1) }
          }
        }
      }
      .toDF("query_id", "id", "dist", "rank")
  }

  /** Validate every shard's graph invariants (reference
    * validate_index.c); returns (shard, violation) rows. */
  def validate(spark: SparkSession, indexPath: String): Seq[(String, String)] = {
    val man = readManifest(indexPath)
    man.shards.flatMap { s =>
      val errs = ShardCache.get(s"$indexPath/$s").validate()
      errs.map(e => (s, e))
    } ++ {
      val total = man.shards.map(s => ShardCache.get(s"$indexPath/$s").size.toLong).sum
      if (total != man.count)
        Seq(("manifest", s"count ${man.count} != stored $total")) else Seq.empty
    }
  }

  // ---- manifest I/O (java.util.Properties: no extra deps) ----

  def writeManifest(indexPath: String, man: Manifest): Unit = {
    val props = new java.util.Properties()
    props.setProperty("metric", man.metric.name)
    props.setProperty("dim", man.dim.toString)
    props.setProperty("m", man.m.toString)
    props.setProperty("ef_construction", man.efConstruction.toString)
    props.setProperty("count", man.count.toString)
    props.setProperty("pq", man.pq.toString)
    props.setProperty("shards", man.shards.mkString(","))
    val p = new Path(indexPath, "manifest.properties")
    val fs = p.getFileSystem(graft.HadoopConfs.driver())
    val out = fs.create(p, true)
    try props.store(out, "graft ANN index manifest")
    finally out.close()
  }

  def readManifest(indexPath: String): Manifest = {
    val p = new Path(indexPath, "manifest.properties")
    val fs = p.getFileSystem(graft.HadoopConfs.driver())
    val in = fs.open(p)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    Manifest(
      Metric.fromName(props.getProperty("metric")),
      props.getProperty("dim").toInt,
      props.getProperty("m").toInt,
      props.getProperty("ef_construction").toInt,
      props.getProperty("count").toLong,
      props.getProperty("shards").split(",").toSeq.filter(_.nonEmpty),
      Option(props.getProperty("pq")).exists(_.toBoolean))
  }
}

/** Per-executor-JVM cache of deserialized shard graphs (the analog of
  * the reference's buffer-cache-backed lazy node retriever,
  * scan.c:90-110 — immutable artifacts, so memoization works), bounded
  * by a byte budget with LRU eviction so many indexes/variants (e.g. an
  * autotune sweep) cannot pin every graph in executor memory forever.
  * Budget: `graft.ann.shardCacheBytes` system property, default 8 GiB. */
object ShardCache {
  val BudgetProp = "graft.ann.shardCacheBytes"
  private val DefaultBudget = 8L * 1024 * 1024 * 1024

  // access-ordered LinkedHashMap = LRU; all access under this lock
  // (deserialization happens outside it, so concurrent loads of
  // DIFFERENT shards don't serialize). The value carries the graph's
  // byte estimate, computed OUTSIDE the lock at load time: the
  // O(nodes x layers) size scan of a fresh multi-GB graph must never
  // run while holding the lock other tasks' cache hits need.
  private val lock = new Object
  private val cache =
    new java.util.LinkedHashMap[String, (Hnsw, Long)](64, 0.75f, true)
  private var totalBytes = 0L

  private def budget: Long =
    sys.props.get(BudgetProp).flatMap(v =>
      scala.util.Try(v.trim.toLong).toOption).getOrElse(DefaultBudget)

  def get(path: String): Hnsw = {
    lock.synchronized(Option(cache.get(path))) match {
      case Some((h, _)) => h
      case None =>
        val p = new Path(path)
        val fs = p.getFileSystem(new Configuration())
        val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
        val h = try Hnsw.read(in) finally in.close()
        val bytes = h.estimatedBytes // outside the lock: O(nodes) scan
        lock.synchronized {
          Option(cache.get(path)) match {
            case Some((raced, _)) => raced // a concurrent load won
            case None =>
              cache.put(path, (h, bytes))
              totalBytes += bytes
              evictOver(budget)
              h
          }
        }
    }
  }

  /** Evict least-recently-used graphs until under `limit` (the newest
    * entry always stays, so one oversized shard still loads). */
  private def evictOver(limit: Long): Unit = {
    val it = cache.entrySet().iterator()
    while (totalBytes > limit && cache.size() > 1 && it.hasNext) {
      val e = it.next()
      totalBytes -= e.getValue._2
      it.remove()
    }
  }

  def invalidate(prefix: String): Unit = lock.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) {
        totalBytes -= e.getValue._2
        it.remove()
      }
    }
  }

  def cachedBytes: Long = lock.synchronized(totalBytes)
  def cachedCount: Int = lock.synchronized(cache.size())
}

/** Per-executor-JVM cache of an index's packed tombstone file, keyed by
  * the file's (mtime, length) version stamp so a new `delete()` is
  * picked up without any executor coordination. The array is sorted;
  * probes binary-search it.
  *
  * The directory LISTING is itself cached per index with a short TTL
  * (`graft.ann.tombstoneListTtlMs`, default 10 s): without it every
  * task of every probe pays one `listStatus` round-trip even for an
  * index with zero tombstones — on an object store those LISTs dwarf a
  * sub-millisecond graph walk. A same-JVM `delete()` invalidates the
  * listing immediately; remote executors converge within the TTL
  * (deletes are rare, probes are the hot path). */
object TombstoneCache {
  // keyed by the concrete file read; stamp = mtime ^ shifted length
  private val cache = TrieMap[String, (Long, Array[Long])]()
  private val MaxEntries = 256 // arrays re-read on demand; a full clear is cheap

  val TtlProp = "graft.ann.tombstoneListTtlMs"
  private val DefaultTtlMs = 10000L
  // indexPath -> (cache deadline millis, resolved sorted tombstones)
  private val listingCache = TrieMap[String, (Long, Array[Long])]()
  /** Real FS listings performed per index (diagnostics: specs assert
    * the steady-state probe path performs none). */
  private val listingCounts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private[graft] def listingCount(indexPath: String): Long =
    Option(listingCounts.get(indexPath)).map(_.get()).getOrElse(0L)

  private def ttlMs: Long =
    sys.props.get(TtlProp).flatMap(v =>
      scala.util.Try(v.trim.toLong).toOption).getOrElse(DefaultTtlMs)

  private val GenName = """tombstones-g(\d+)\.bin""".r

  /** Generation number of a `tombstones-g<n>.bin` name (None for the
    * pre-round-4 clock-named `tombstones-<nanos>.bin` files). */
  private[ann] def generationNumber(name: String): Option[Long] =
    name match {
      case GenName(d) => scala.util.Try(d.toLong).toOption
      case _ => None
    }

  /** Total order over generation files: numbered generations always
    * beat legacy clock-named files, and compare numerically among
    * themselves (lexicographic order breaks once a number outgrows its
    * zero-pad). Legacy files keep their lexicographic order. */
  private[ann] def genOrder(p: Path): (Int, Long, String) =
    generationNumber(p.getName) match {
      case Some(n) => (1, n, "")
      case None => (0, 0L, p.getName)
    }

  /** Next generation number to write: newest existing + 1. */
  private[ann] def nextGeneration(indexPath: String,
      fs: org.apache.hadoop.fs.FileSystem): Long =
    generationFiles(indexPath, fs)
      .flatMap(p => generationNumber(p.getName))
      .foldLeft(0L)(math.max) + 1

  private[ann] def generationFiles(indexPath: String,
      fs: org.apache.hadoop.fs.FileSystem): Seq[Path] = {
    val dir = new Path(indexPath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("tombstones-") && n.endsWith(".bin")
      }
  }

  // Bumped by invalidateListing; a resolve-then-put only caches if no
  // invalidation happened in between. Without it a probe thread could
  // read the pre-delete listing, lose the race with delete()'s
  // invalidate, and then put the stale set back with a fresh TTL —
  // breaking the same-JVM immediate-visibility guarantee for up to
  // ttlMs.
  private val invalidations = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  // bumped whenever the bounded map is cleared, so a version observed
  // before the clear can never compare equal to one observed after it
  // (clearing alone could erase another path's fresh bump and reopen
  // the stale-caching race)
  private val invalidationEpoch = new java.util.concurrent.atomic.AtomicLong()
  private def invalidationVersion(indexPath: String): (Long, Long) =
    (invalidationEpoch.get(),
      Option(invalidations.get(indexPath)).map(_.get()).getOrElse(0L))

  /** Cache `arr` only if no invalidation raced the resolve. The put is
    * guarded twice: before (cheap skip) AND after — an invalidate that
    * lands between the pre-check and the put bumps the version, so the
    * post-check removes the just-written stale entry. Either the put
    * happens-before the invalidate's remove (removed), or after it
    * (post-check sees the bumped version and removes). Conservative
    * either way: the worst outcome is an uncached listing. */
  private def putIfCurrent(indexPath: String, v0: (Long, Long),
      deadline: Long, arr: Array[Long]): Unit =
    if (invalidationVersion(indexPath) == v0) {
      if (listingCache.size >= MaxEntries) listingCache.clear()
      listingCache.put(indexPath, (deadline, arr))
      if (invalidationVersion(indexPath) != v0)
        listingCache.remove(indexPath)
    }

  /** Row-level skip probe for the codegen `tombstone_live` filter
    * expression (stable public entry point for generated code). */
  def isLive(indexPath: String, id: Long): Boolean = {
    val dead = get(indexPath)
    dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0
  }

  def get(indexPath: String): Array[Long] = {
    val now = System.currentTimeMillis()
    listingCache.get(indexPath) match {
      case Some((deadline, arr)) if now < deadline => arr
      case _ =>
        val v0 = invalidationVersion(indexPath)
        val arr = resolve(indexPath)
        putIfCurrent(indexPath, v0, now + ttlMs, arr)
        arr
    }
  }

  /** Drop the cached listing for one index (same-JVM delete()). The
    * version map is bounded by clearing it when it outgrows the cache
    * cap: probes that read a now-cleared version conservatively skip
    * caching (their recheck sees a different value), so the clear can
    * never resurrect a stale listing. */
  private[ann] def invalidateListing(indexPath: String): Unit = {
    if (invalidations.size > 4 * MaxEntries) {
      // epoch first: a reader racing the clear sees either the old map
      // (old epoch mismatch later) or the cleared map under a new epoch
      invalidationEpoch.incrementAndGet()
      invalidations.clear()
    }
    invalidations.computeIfAbsent(indexPath,
      _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
    listingCache.remove(indexPath)
  }

  /** Read one SPECIFIC tombstone file, bypassing every cache layer —
    * for write paths that must pin the file they act on to the listing
    * they derived it from (IVF consolidate: the generation it reads
    * must be exactly the generation it watermarks, or a racing
    * delete() slips between the listing and the read). Generations are
    * cumulative merges, so the newest file IS the full set. */
  private[ann] def readPinned(p: Path,
      fs: org.apache.hadoop.fs.FileSystem): Array[Long] = readBin(p, fs)

  /** Write a dead-id set as the numbered generation file
    * `tombstones-g<gen>.bin` — the ONE place the on-disk tombstone
    * format is produced (delete's merge write and IvfIndex's
    * legacy-file migration both go through here). create(overwrite =
    * false): an already-exists race surfaces as IOException for the
    * caller to resolve. */
  private[ann] def writeGeneration(indexPath: String,
      fs: org.apache.hadoop.fs.FileSystem, gen: Long,
      ids: Array[Long]): Path = {
    val p = new Path(indexPath, f"tombstones-g$gen%012d.bin")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, false)))
    try {
      out.writeInt(AnnIndex.TombstoneMagic)
      out.writeInt(ids.length)
      ids.foreach(out.writeLong)
    } finally out.close()
    p
  }

  /** Fresh read that bypasses (and refreshes) the TTL cache — for WRITE
    * paths (delete merge, vacuum) where serving a <TTL-stale set would
    * lose or resurrect another writer's deletes. Probes use [[get]]. */
  private[ann] def getFresh(indexPath: String): Array[Long] = {
    val v0 = invalidationVersion(indexPath)
    val arr = resolve(indexPath)
    putIfCurrent(indexPath, v0, System.currentTimeMillis() + ttlMs, arr)
    arr
  }

  private def resolve(indexPath: String): Array[Long] = {
    listingCounts.computeIfAbsent(indexPath,
      _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
    val fs = new Path(indexPath).getFileSystem(new Configuration())
    val gens = generationFiles(indexPath, fs)
    if (gens.nonEmpty) readBin(gens.maxBy(genOrder), fs)
    else {
      val legacyBin = new Path(indexPath, "tombstones.bin")
      if (fs.exists(legacyBin)) readBin(legacyBin, fs)
      else legacyTxt(indexPath, fs)
    }
  }

  private def readBin(p: Path,
      fs: org.apache.hadoop.fs.FileSystem): Array[Long] = {
    val st = fs.getFileStatus(p)
    val stamp = st.getModificationTime ^ (st.getLen << 20)
    val key = p.toString
    cache.get(key) match {
      case Some((s, arr)) if s == stamp => arr
      case _ =>
        val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
        val arr =
          try {
            require(in.readInt() == AnnIndex.TombstoneMagic,
              s"$p is not a graft tombstone file")
            val n = in.readInt()
            val a = new Array[Long](n)
            var i = 0
            while (i < n) { a(i) = in.readLong(); i += 1 }
            a
          } finally in.close()
        if (cache.size >= MaxEntries) cache.clear() // unbounded paths guard
        cache.put(key, (stamp, arr))
        arr
    }
  }

  /** Pre-round-3 indexes stored deletes as `tombstones.txt` (one id per
    * line); read it when no packed file exists, so old deletions stay
    * hidden and the next delete() migrates them into the bin format.
    * Cached like the bin path (the probe path would otherwise re-read
    * the file per task); lines are trimmed (CRLF tolerance). */
  private def legacyTxt(indexPath: String,
      fs: org.apache.hadoop.fs.FileSystem): Array[Long] = {
    val p = new Path(indexPath, "tombstones.txt")
    if (!fs.exists(p)) Array.emptyLongArray
    else {
      val st = fs.getFileStatus(p)
      val stamp = st.getModificationTime ^ (st.getLen << 20)
      val key = p.toString
      cache.get(key) match {
        case Some((s, arr)) if s == stamp => arr
        case _ =>
          val in = scala.io.Source.fromInputStream(fs.open(p), "UTF-8")
          val arr =
            try in.getLines().map(_.trim).filter(_.nonEmpty)
              .map(_.toLong).toArray.sorted
            finally in.close()
          if (cache.size >= MaxEntries) cache.clear()
          cache.put(key, (stamp, arr))
          arr
      }
    }
  }
}
