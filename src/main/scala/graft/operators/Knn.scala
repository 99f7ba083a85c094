package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{l2sq_dist, cos_dist, hamming_dist}

/** Exact K-nearest-neighbor search and composite weighted vector search.
  *
  * Semantics of the reference's `ORDER BY col <-> q LIMIT k` scan
  * (lantern_hnsw/src/hnsw/scan.c) on the exact path: distance to a query
  * vector, ascending, top k. Spark-first shape: a declarative
  * `orderBy(dist).limit(k)` that Catalyst plans as TakeOrderedAndProject —
  * a per-partition top-k followed by a k-row merge on the driver, so no
  * full shuffle/sort happens at any scale. The approximate path (sharded
  * ANN index) lives in [[graft.ann.AnnIndex]].
  */
object Knn {

  sealed trait Metric { def dist(v: Column, q: Column): Column }
  case object L2Sq extends Metric {
    def dist(v: Column, q: Column): Column = l2sq_dist(v, q)
  }
  case object Cos extends Metric {
    def dist(v: Column, q: Column): Column = cos_dist(v, q)
  }
  case object Hamming extends Metric {
    def dist(v: Column, q: Column): Column = hamming_dist(v, q).cast("double")
  }

  /** Exact top-k: rows with the k smallest `metric(vecCol, q)`,
    * ascending, ties broken by `tieBreaker` for determinism. */
  def knn(
      df: DataFrame,
      vecCol: Column,
      query: Column,
      k: Int,
      metric: Metric = L2Sq,
      tieBreaker: Option[Column] = None,
      distName: String = "dist"): DataFrame = {
    val withDist = df.withColumn(distName, metric.dist(vecCol, query))
    val order = col(distName).asc +: tieBreaker.map(_.asc).toSeq
    withDist.orderBy(order: _*).limit(k)
  }

  /** Streaming KNN cursor (reference scan.c:240-292): the first batch
    * fetches `initK` rows (default 10, GUC `lantern_hnsw.init_k`,
    * options.h:44); reading past a batch re-runs the search with k
    * doubled, stopping with a warning at `maxK` (1000). Iterator of
    * rows in distance order — each re-run is a fresh
    * TakeOrderedAndProject, so no state is held on executors. */
  def knnCursor(
      df: DataFrame,
      vecCol: Column,
      query: Column,
      metric: Metric = L2Sq,
      tieBreaker: Option[Column] = None,
      initK: Int = 10,
      maxK: Int = 1000): Iterator[org.apache.spark.sql.Row] =
    new Iterator[org.apache.spark.sql.Row] {
      // Refills re-run the search with doubled k; without a total order,
      // equal-distance rows straddling a batch boundary could reorder
      // between runs (skipping/duplicating rows). Default tiebreak =
      // struct of all columns: a lexicographic TOTAL order over rows
      // (a hash tiebreak could collide on two distinct equal-distance
      // rows, leaving the order non-total across re-runs).
      private val tb = tieBreaker.getOrElse(
        struct(df.columns.map(col).toIndexedSeq: _*))
      private var k = initK
      private var batch = knn(df, vecCol, query, k, metric, Some(tb)).collect()
      private var i = 0
      private var exhausted = false

      override def hasNext: Boolean = {
        if (i < batch.length) true
        else if (exhausted || batch.length < k) false // corpus smaller than k
        else if (k >= maxK) {
          // reference warns and stops the cursor at the 1000 cap
          exhausted = true
          false
        } else {
          k = math.min(k * 2, maxK)
          batch = knn(df, vecCol, query, k, metric, Some(tb)).collect()
          i < batch.length
        }
      }

      override def next(): org.apache.spark.sql.Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = batch(i); i += 1; r
      }
    }

  /** One weighted term of a multi-column search. */
  case class WeightedTerm(weight: Double, vecCol: Column, query: Column,
      metric: Metric = L2Sq)

  /** Multi-vector-column weighted ranking, the exact (`exact=true`) path
    * of `lantern.weighted_vector_search` (lantern_hnsw/sql/lantern.sql:732-762):
    * joint metric sum(w_i * dist_i), optional max-distance filter, top k.
    *
    * The approximate path of the reference (per-column ANN candidates with
    * LIMIT ef, UNION, DISTINCT, re-rank — lantern.sql:769-817) is
    * [[weightedSearchCandidates]]. */
  def weightedSearch(
      df: DataFrame,
      terms: Seq[WeightedTerm],
      k: Int,
      maxDist: Option[Double] = None,
      tieBreaker: Option[Column] = None): DataFrame = {
    val joint = terms.map(t => lit(t.weight) * t.metric.dist(t.vecCol, t.query))
      .reduce(_ + _)
    val withDist = df.withColumn("joint_dist", joint)
    val filtered = maxDist.fold(withDist)(m => withDist.filter(col("joint_dist") <= m))
    val order = col("joint_dist").asc +: tieBreaker.map(_.asc).toSeq
    filtered.orderBy(order: _*).limit(k)
  }

  /** Weighted search with ANN index probes: each term's candidate set
    * comes from its column's index (`AnnIndex.topK(ef)`), the union is
    * joined back to the table for the other columns, and the joint
    * metric re-ranks — the reference's approximate weighted path
    * (lantern.sql:769-817: per-column ANN CTE LIMIT ef, UNION, DISTINCT
    * ON id, re-rank). At scale only `ef x terms` rows ever leave the
    * indexes; the join back is a broadcast of that candidate set. */
  def weightedSearchAnn(
      df: DataFrame,
      idColName: String,
      terms: Seq[(WeightedTerm, String)], // (term, its index path)
      k: Int,
      ef: Int,
      maxDist: Option[Double] = None): DataFrame = {
    val spark = df.sparkSession
    val candidateIds = terms.map { case (t, indexPath) =>
      val q = graft.ann.QueryVectors.fromColumn(spark, t.query)
      graft.ann.AnnIndex.topK(spark, indexPath, q, ef, ef).select("id")
    }.reduce(_ unionByName _).distinct()
    val candidates = df.join(
      org.apache.spark.sql.functions.broadcast(candidateIds),
      df(idColName) === candidateIds("id"), "inner")
      .drop(candidateIds("id")) // by reference: the table may have its own "id"
    weightedSearch(candidates, terms.map(_._1), k, maxDist,
      Some(col(idColName)))
  }

  /** Candidate-generation variant: per-term top-ef candidate sets unioned
    * and deduplicated by `idCol`, then re-ranked by the joint metric
    * (lantern_hnsw/sql/lantern.sql:769-817). With an ANN index per column
    * each candidate set is an index probe ([[weightedSearchAnn]]); with
    * none it is an exact top-ef (TakeOrderedAndProject), still cheaper
    * than scoring all metrics on every row when the table is wide. */
  def weightedSearchCandidates(
      df: DataFrame,
      idColName: String,
      terms: Seq[WeightedTerm],
      k: Int,
      ef: Int,
      maxDist: Option[Double] = None): DataFrame = {
    val candidates = terms.map { t =>
      df.withColumn("__cand_dist", t.metric.dist(t.vecCol, t.query))
        .orderBy(col("__cand_dist").asc, col(idColName).asc)
        .limit(ef)
        .drop("__cand_dist")
    }.reduce(_ unionByName _)
      .dropDuplicates(Seq(idColName))
    weightedSearch(candidates, terms, k, maxDist, Some(col(idColName)))
  }
}
