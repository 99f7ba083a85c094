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
  *   manifest.properties   metric, dim, m, ef_construction, count, shards
  *   shard_00000.hnsw      one [[Hnsw]] graph per build partition
  *   tombstones.txt        deleted ids, one per line (optional)
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
    val parts =
      if (params.numShards > 0) data.repartition(params.numShards) else data
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
      shardInfo.map(_._2).sum, shardInfo.map(_._1).sorted,
      pq = params.pq.isDefined)
    writeManifest(indexPath, man)
    man
  }

  /** Append new rows as additional shards (reference model: INSERT
    * maintains the graph online, insert.c; Spark model: batch append +
    * periodic rebuild). */
  def append(df: DataFrame, idCol: String, vecCol: String,
      indexPath: String): Manifest = {
    val existing = readManifest(indexPath)
    // appended shards must match the existing storage mode: recover the
    // codebook from an existing shard for a PQ index (mixing raw and
    // ADC-approximated distances would bias the merged top-k)
    val cb =
      if (!existing.pq) None
      else ShardCache.get(s"$indexPath/${existing.shards.head}").pq
    val tmpPath = s"$indexPath/append_${existing.shards.length}"
    val appended = build(df, idCol, vecCol, tmpPath,
      Params(existing.metric, existing.m, existing.efConstruction, pq = cb))
    require(appended.dim == existing.dim,
      s"expected equally sized arrays but got dimensions ${appended.dim} and ${existing.dim}")
    val merged = existing.copy(
      count = existing.count + appended.count,
      shards = existing.shards ++
        appended.shards.map(s => s"append_${existing.shards.length}/$s"))
    writeManifest(indexPath, merged)
    merged
  }

  /** Record deleted ids; searches anti-join them out (scan.c:294-300
    * semantics — labels invalidated, skipped at scan). */
  def delete(spark: SparkSession, indexPath: String, ids: Seq[Long]): Unit = {
    val p = new Path(indexPath, "tombstones.txt")
    val fs = p.getFileSystem(new Configuration())
    val prior = tombstones(indexPath)
    val out = fs.create(p, true)
    try out.write((prior ++ ids).distinct.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    ShardCache.invalidate(indexPath)
  }

  def tombstones(indexPath: String): Seq[Long] = {
    val p = new Path(indexPath, "tombstones.txt")
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else {
      val in = scala.io.Source.fromInputStream(fs.open(p), "UTF-8")
      try in.getLines().filter(_.nonEmpty).map(_.toLong).toList
      finally in.close()
    }
  }

  /** Rebuild the index without tombstoned rows (graph compaction the
    * reference never does — delete.c leaves holes forever). */
  def vacuum(spark: SparkSession, indexPath: String, outPath: String): Manifest = {
    val man = readManifest(indexPath)
    val dead = tombstones(indexPath).toSet
    val rows = scan(spark, indexPath)
      .filter(r => !dead.contains(r._1))
    import spark.implicits._
    val df = spark.createDataset(rows).toDF("id", "vec")
    build(df, "id", "vec", outPath,
      Params(man.metric, man.m, man.efConstruction))
  }

  /** All (id, vector) rows stored in the index (driver-side; test/ops
    * utility, not a data path). */
  private def scan(spark: SparkSession, indexPath: String): Seq[(Long, Array[Float])] = {
    val man = readManifest(indexPath)
    man.shards.flatMap { s =>
      val h = ShardCache.get(s"$indexPath/$s")
      require(h.pq.isEmpty,
        "vacuum/scan needs raw vectors; a PQ index stores only codes - rebuild from the source table instead")
      h.ids.indices.map(i => (h.ids(i), h.vecs(i)))
    }
  }

  /** Approximate top-k: per-shard HNSW search (k candidates each, search
    * breadth `ef`), tombstone filter, global top-k merge. Returns
    * (id, dist) ascending. */
  def topK(spark: SparkSession, indexPath: String, query: Array[Float],
      k: Int, ef: Int = 64): DataFrame = {
    val man = readManifest(indexPath)
    val dead = tombstones(indexPath).toSet
    // deleted ids may occupy top slots, so over-fetch — but bounded:
    // searching every shard with breadth k+|dead| would degrade to a
    // near-exhaustive scan under heavy deletion (vacuum is the answer
    // there, not wider probes)
    val overFetch = k + math.min(dead.size, 4 * k + 100)
    import spark.implicits._
    val shardPaths = man.shards.map(s => s"$indexPath/$s")
    val hits = spark.createDataset(shardPaths)
      .repartition(math.min(shardPaths.size, 64))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          ShardCache.get(p).search(query, overFetch, math.max(ef, overFetch))
        }
      }
      .toDF("id", "dist")
    // small tombstone sets fold into the scan filter; large ones join
    // (an isin list of millions of ids would bloat the plan)
    val live =
      if (dead.isEmpty) hits
      else if (dead.size <= 1000) hits.filter(!col("id").isin(dead.toSeq: _*))
      else {
        val deadDf = spark.createDataset(dead.toSeq).toDF("id")
        hits.join(deadDf, Seq("id"), "left_anti")
      }
    live.orderBy(col("dist").asc, col("id").asc).limit(k)
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
    val fs = p.getFileSystem(new Configuration())
    val out = fs.create(p, true)
    try props.store(out, "graft ANN index manifest")
    finally out.close()
  }

  def readManifest(indexPath: String): Manifest = {
    val p = new Path(indexPath, "manifest.properties")
    val fs = p.getFileSystem(new Configuration())
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
  * scan.c:90-110 — immutable artifacts, so plain memoization works). */
object ShardCache {
  private val cache = TrieMap[String, Hnsw]()

  def get(path: String): Hnsw = cache.getOrElseUpdate(path, {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try Hnsw.read(in) finally in.close()
  })

  def invalidate(prefix: String): Unit =
    cache.keys.filter(_.startsWith(prefix)).foreach(cache.remove)
}
