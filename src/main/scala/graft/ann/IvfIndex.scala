package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index: the partition-pruning scale path for
  * similarity search — the complement of the HNSW graph shards.
  *
  * Build: train coarse centroids on a sample (seeded k-means, reused
  * from the PQ module), assign each vector to its nearest cell, and
  * write the table PARTITIONED BY cell_id. Search: pick the `nprobe`
  * cells nearest to the query on the driver (the centroid table is
  * tiny) and brute-force top-k over ONLY those partitions — the
  * `cell_id IN (...)` filter is a partition filter, so the scan reads
  * nprobe/nCells of the data. At 100 TB that pruning, not CPU, is the
  * win; `.explain` shows it as PartitionFilters on the parquet scan.
  *
  * Probing more cells trades latency for recall exactly like HNSW's
  * `ef` (IVF semantics from the public FAISS/IVFADC literature; the
  * reference's quantized search is its PQ cousin, pqtable.c).
  */
object IvfIndex {

  case class Params(nCells: Int = 64, metric: Metric = Metric.L2Sq,
      sampleLimit: Int = 10000, seed: Long = 42L)

  /** Train centroids, assign cells, write the partitioned table +
    * centroid sidecar. Returns the centroids. */
  def build(df: DataFrame, idCol: String, vecCol: String, outPath: String,
      params: Params = Params()): Array[Array[Float]] = {
    val spark = df.sparkSession
    val sample = df.select(vecCol).limit(params.sampleLimit).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot build an IVF index from an empty table")
    // a coarse quantizer converges in few iterations (FAISS uses ~25)
    val cents = graft.pq.Pq.kmeans(sample,
      math.min(params.nCells, sample.length), params.seed, maxIters = 25)
    val bc = spark.sparkContext.broadcast(cents)
    val metric = params.metric
    val assign = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      val cs = bc.value
      while (c < cs.length) {
        val d = metric.dist(arr, cs(c))
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best
    }
    df.select(col(idCol), col(vecCol))
      .withColumn("cell_id", assign(col(vecCol)))
      // cluster rows by the partition key before the partitioned write:
      // one file per cell instead of (cells x tasks) small files
      .repartition(col("cell_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell_id")
      .parquet(s"$outPath/cells")
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "centroid")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/centroids")
    cents
  }

  /** Top-k over the `nprobe` nearest cells only. */
  def topK(spark: SparkSession, indexPath: String, query: Array[Float],
      k: Int, nprobe: Int = 4, metric: Metric = Metric.L2Sq): DataFrame = {
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val probes = cents
      .map { case (id, c) => (id, metric.dist(query, c)) }
      .sortBy(x => (x._2, x._1)).take(math.max(nprobe, 1)).map(_._1)
    val cells = spark.read.parquet(s"$indexPath/cells")
      .filter(col("cell_id").isin(probes.toSeq: _*)) // partition filter
    val vecCol = cells.columns.filterNot(c => c == "cell_id").apply(1)
    val idCol = cells.columns.head
    val distFn = metric match {
      case Metric.L2Sq => graft.functions.l2sq_dist _
      case Metric.Cos => graft.functions.cos_dist _
      case other =>
        throw new IllegalArgumentException(s"IVF does not support ${other.name}")
    }
    cells
      .withColumn("dist", distFn(col(vecCol), graft.functions.vecLit(query.toSeq)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("id"), col("dist"))
  }
}
