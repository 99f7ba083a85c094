package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{nearest_centroid_d, vec_sum}

/** Distributed Lloyd's k-means over embedding columns, Spark-first:
  * no MLlib, just the engine's own primitives — assignment is the
  * codegen [[graft.functions.nearest_centroid_d]] argmin riding the
  * scan (centroids are one reference object, k·dim doubles), the
  * update is ONE `groupBy(cid).agg(vec_sum, count)` whose result is k
  * rows collected to the driver. Per iteration: one job, one shuffle
  * of k·partitions partial-sum arrays — never the vectors.
  *
  * Everything is deterministic and engine-replayable:
  * - seeding: the k rows with the smallest (md5(id:salt), id) — a
  *   pure function of the data, no RNG;
  * - assignment ties break to the lowest centroid id (strict `<`);
  * - an emptied cluster keeps its previous centroid;
  * - callers wanting BIT-exact cross-engine replay feed vectors on an
  *   exact binary grid (see the contract query's 1/16384 quantization)
  *   so every partial sum is exact and merge order cannot matter.
  *
  * At 100 TB: cache/checkpoint `docs` before calling — each iteration
  * re-scans it (iters + 1 scans total); the driver holds only k·dim
  * doubles. Reference context: the engine's PQ/IVF trainers
  * (graft.pq.Pq) are the float k-means path tuned for codebooks; this
  * is the general clustering operator a data pipeline calls directly. */
object Clustering {

  /** The k seed centroids: rows with smallest (md5(id:salt), id).
    * `vecCol` must be array<double>; null vectors are ignored. */
  def seedCentroids(docs: DataFrame, idCol: Column, vecCol: Column,
      k: Int, salt: String = "kmeans"): Array[Array[Double]] = {
    require(k > 0, "k must be positive")
    val rows = docs
      .filter(vecCol.isNotNull)
      .select(vecCol.as("v"),
        md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
          .as("h"),
        idCol.as("i"))
      .orderBy(col("h").asc, col("i").asc)
      .limit(k)
      .collect()
    require(rows.length == k, s"need at least $k rows to seed $k clusters")
    rows.map { r =>
      // row-level null vectors were filtered above; element-level nulls
      // would otherwise surface as an opaque NPE on unboxing — fail
      // with the same clear error nearest_centroid_d raises
      val v = r.getSeq[Any](0)
      require(v.forall(_ != null),
        "seedCentroids: null vector element in a seed row")
      v.map(_.asInstanceOf[Double]).toArray
    }
  }

  /** `iters` Lloyd iterations from the deterministic seeds; returns
    * (assignments `(id, cid)`, final centroids). Null vectors are
    * ignored, like every SQL aggregate — they take no part in seeding,
    * updates, or the returned assignments. */
  def kmeans(docs: DataFrame, idCol: Column, vecCol: Column, k: Int,
      iters: Int, salt: String = "kmeans")
      : (DataFrame, Array[Array[Double]]) = {
    require(iters >= 0, "iters must be non-negative")
    var cents = seedCentroids(docs, idCol, vecCol, k, salt)
    val base = docs.select(idCol.as("id"), vecCol.as("v"))
      .filter(col("v").isNotNull)
    for (_ <- 1 to iters) {
      val upd = base
        .select(nearest_centroid_d(col("v"), cents).as("cid"), col("v"))
        .groupBy(col("cid"))
        .agg(vec_sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()) // emptied cluster keeps its centroid
      upd.foreach { r =>
        val n = r.getLong(2)
        next(r.getInt(0)) = r.getSeq[Double](1).map(_ / n).toArray
      }
      cents = next
    }
    (base.select(col("id"), nearest_centroid_d(col("v"), cents).as("cid")),
      cents)
  }

  /** SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws: beating power law scaling via data pruning",
    * arXiv:2206.14486): cluster the embedding space with [[kmeans]],
    * measure each example's squared distance to its assigned centroid
    * — SMALL distance = prototypical/easy/redundant, LARGE = hard/
    * informative — and keep the hardest `keepFrac` of EACH cluster
    * (the paper's finding: with abundant data, pruning the easy
    * prototypes is the selection that beats random).
    *
    * Scale shape: assignment and distance ride the scan (the codegen
    * argmin over one broadcast k·dim centroid array, then one l2sq
    * kernel against the selected centroid); the per-cluster threshold
    * is ONE k-row aggregate broadcast back for VALUE gating — the
    * keepTopFraction discipline, never a per-cluster rank window
    * (cid has k values; a rank window would pour each cluster through
    * a single reducer's sort). Ties exactly AT a threshold drop
    * together. `exact = true` is the contract path (interpolated
    * percentile over deterministic dists replays in DuckDB
    * quantile_cont); percentile_approx stays the 100 TB default.
    *
    * Returns the kept rows as (id, cid, dist). `keepFrac = 1.0`
    * keeps every assigned row (no threshold pass). */
  def prototypePrune(docs: DataFrame, idCol: Column, vecCol: Column,
      k: Int, iters: Int, keepFrac: Double, salt: String = "kmeans",
      exact: Boolean = false): DataFrame =
    pruneWithCentroids(docs, idCol, vecCol,
      kmeans(docs, idCol, vecCol, k, iters, salt)._2, keepFrac, exact)

  /** (id, cid, dist) against a FIXED centroid array — the scoring
    * scan behind [[prototypePrune]]/[[clusterBalance]], exposed so
    * callers holding persisted centroids (a cluster deployment stores
    * them as a tiny table; the contract queries share one driver
    * array) skip the Lloyd build. */
  def assignWithDist(docs: DataFrame, idCol: Column, vecCol: Column,
      cents: Array[Array[Double]]): DataFrame = {
    val centsCol = array(cents.map(c => array(c.map(lit): _*)): _*)
    docs
      .select(idCol.as("id"), vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("cid", nearest_centroid_d(col("v"), cents))
      // index-order double fold (the q_embed_outliers idiom — the
      // float codegen kernels would lose the exact-grid determinism)
      .withColumn("dist", aggregate(
        zip_with(col("v"), element_at(centsCol, col("cid") + 1),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .select(col("id"), col("cid"), col("dist"))
  }

  /** [[prototypePrune]] against precomputed centroids. `knownRows`:
    * the caller's exact row count for `docs` when it holds one (a
    * persisted per-corpus stat — the contract row caches it per data
    * dir, the [[graft.text.TextOps.temperatureQuotas]] bounded-stat
    * discipline); -1 counts here. */
  def pruneWithCentroids(docs: DataFrame, idCol: Column, vecCol: Column,
      cents: Array[Array[Double]], keepFrac: Double,
      exact: Boolean = false, knownRows: Long = -1L): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1,
      s"keepFrac must be in (0, 1], got $keepFrac")
    val scored = assignWithDist(docs, idCol, vecCol, cents)
    if (keepFrac == 1.0) return scored
    val thr =
      if (exact) Percentiles
        // the corpus count is a row-group metadata read on the source
        // scan; handing it to the dispatch spares the probe a full
        // pass of the scoring lineage at either extreme (measured
        // 27 s at sf100, where the probe's only possible answer was
        // already "past the builtin's memory cap")
        .exactQuantilesBy(scored, Seq("cid"), col("dist"),
          Seq(1.0 - keepFrac), "__thrs",
          knownRows = if (knownRows >= 0) knownRows else docs.count())
        .select(col("cid"), element_at(col("__thrs"), 1).as("__thr"))
      else scored.groupBy(col("cid")).agg(
        percentile_approx(col("dist"), lit(1.0 - keepFrac), lit(10000))
          .as("__thr"))
    scored.join(broadcast(thr), "cid")
      .filter(col("dist") > col("__thr"))
      .select(col("id"), col("cid"), col("dist"))
  }

  /** Cluster-balanced selection: cluster the embedding space with
    * [[kmeans]], apportion a total budget across clusters by the
    * temperature rule ([[graft.text.TextOps.temperatureQuotas]] over
    * cluster sizes — alpha < 1 caps dominant clusters and boosts rare
    * ones, the diversity-preserving selection a pretraining mix
    * applies over topic/semantic clusters), then keep each cluster's
    * quota by the blocked deterministic mix rank. The cluster-level
    * twin of per-source alpha-sampling: same math, but the strata are
    * LEARNED from the embeddings instead of read from metadata.
    *
    * Scale shape: kmeans as documented above; quota derivation is a
    * k-row driver collect; the keep-set is
    * [[graft.text.TextOps.mixToBudget]]'s blocked two-phase rank on
    * the cluster id (k is small — exactly the low-cardinality case
    * the blocked rank exists for). Returns (id, cid, mix_rank). */
  def clusterBalance(docs: DataFrame, idCol: Column, vecCol: Column,
      k: Int, iters: Int, alpha: Double, total: Long,
      salt: String = "kmeans"): DataFrame =
    balanceWithCentroids(docs, idCol, vecCol,
      kmeans(docs, idCol, vecCol, k, iters, salt)._2, alpha, total, salt)

  /** [[clusterBalance]] against precomputed centroids.
    *
    * Action fold (§5): the quota derivation and the mix's per-block
    * prefix totals both aggregate the SAME assignment frame — one
    * collect of the per-(cluster, block) counts feeds both, so each
    * call runs the argmin scan twice (decide, then rank+keep) instead
    * of three times. The collected frame is bounded by
    * k·16^blockHexChars rows (k is small by construction), and the
    * driver-side prefix arithmetic is the window's exactly. */
  def balanceWithCentroids(docs: DataFrame, idCol: Column, vecCol: Column,
      cents: Array[Array[Double]], alpha: Double, total: Long,
      salt: String = "kmeans"): DataFrame = {
    val assign = docs
      .select(idCol.as("id"), vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .select(col("id"), nearest_centroid_d(col("v"), cents).as("cid"))
    val byCid = assign.withColumn("__cids", col("cid").cast("string"))
    val blkCounts = byCid
      .groupBy(col("__cids").as("__src"),
        graft.text.TextOps.mixBlockCol(col("id"), salt).as("__blk"))
      .agg(count(lit(1)).as("__tot"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val srcCounts = blkCounts.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
    val quotas = graft.text.TextOps.temperatureQuotasFromCounts(
      srcCounts, alpha, total).toMap
    graft.text.TextOps.mixToBudget(byCid, col("id"), col("__cids"),
        quotas, salt, knownBlockCounts = Some(blkCounts))
      .select(col("id"), col("cid"), col("mix_rank"))
  }
}
