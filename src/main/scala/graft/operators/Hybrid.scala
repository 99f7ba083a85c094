package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse several bounded hit lists (a BM25 ranking, a
  * vector KNN ranking, ...) with Reciprocal Rank Fusion from the public
  * IR literature (Cormack et al., SIGIR 2009):
  * `score(d) = Σ_r w_r / (k0 + rank_r(d))`, k0 = 60.
  *
  * RRF needs only ranks, so it composes rankings whose scores live on
  * incomparable scales — exactly the BM25-then-vector shape of hybrid
  * search over a training corpus. Inputs are bounded top-N hit lists by
  * the semantics of fusion (run the top-N operators first); the batched
  * [[rrfPerQuery]] is the one implementation — every stage partitioned
  * by the query key — and the single-probe [[rrf]] is that same code
  * path under a constant key.
  */
object Hybrid {

  /** One ranking: a bounded hit-list frame plus the total order that
    * ranks it (include an id tiebreak for determinism). */
  case class Ranked(df: DataFrame, order: Seq[Column], weight: Double = 1.0)

  /** Batched fusion — the at-scale shape: ONE job fuses the hit lists
    * of many queries at once (a recall-eval sweep, a serving batch, a
    * hard-negative miner running thousands of probes). Every `Ranked`
    * frame carries `queryCol` alongside `idCol`; rank windows, the
    * full-outer hit-list join, and the final top-k are ALL partitioned
    * by the query key, so each window partition holds exactly one
    * query's bounded top-N list — no single-partition stage anywhere,
    * and the fusion parallelism grows with the query count. Feed it
    * the per-query outputs of the batch retrieval operators
    * ([[graft.ann.IvfIndex.topKJoin]], [[graft.ann.AnnIndex.topKJoin]])
    * — the same composition the single-query [[rrf]] does for one
    * probe. Returns (queryCol, idCol, rrf_score), top k per query by
    * (rrf_score desc, id asc). */
  def rrfPerQuery(queryCol: String, idCol: String, inputs: Seq[Ranked],
      k: Int, k0: Int = 60): DataFrame = {
    require(inputs.nonEmpty, "rrf needs at least one ranking")
    val scored = inputs.zipWithIndex.map { case (r, i) =>
      r.df
        .withColumn("__rank", row_number().over(
          Window.partitionBy(col(queryCol)).orderBy(r.order: _*)))
        .select(col(queryCol), col(idCol),
          (lit(r.weight) / (lit(k0) + col("__rank"))).as(s"__rrf$i"))
    }
    val joined = scored
      .reduce((a, b) => a.join(b, Seq(queryCol, idCol), "full_outer"))
    val total = inputs.indices
      .map(i => coalesce(col(s"__rrf$i"), lit(0.0)))
      .reduce(_ + _)
    joined
      .withColumn("rrf_score", total)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_score").desc, col(idCol).asc)))
      .filter(col("__rk") <= k)
      .select(col(queryCol), col(idCol), col("rrf_score"))
  }

  /** Fuse the rankings into (idCol, rrf_score) descending, top k. Rows
    * absent from a ranking simply contribute nothing for it (full outer
    * join over the hit lists).
    *
    * This single-probe form IS [[rrfPerQuery]] under one constant query
    * key — the partitioned code path, so the two forms cannot drift.
    * Catalyst folds the constant key out of the window partition specs,
    * leaving the one-partition plan a single probe's bounded top-N hit
    * lists warrant (ranking a thousand-row list is trivial; a batch of
    * probes should call [[rrfPerQuery]] directly, whose real query key
    * keeps every stage partitioned). */
  def rrf(idCol: String, inputs: Seq[Ranked], k: Int,
      k0: Int = 60): DataFrame = {
    val tagged = inputs.map(r => r.copy(df = r.df.withColumn("__q", lit(0))))
    rrfPerQuery("__q", idCol, tagged, k, k0)
      .drop("__q")
      .orderBy(col("rrf_score").desc, col(idCol).asc)
  }
}
