package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ann.Metric

/** Maximal-marginal-relevance diversified retrieval (Carbonell &
  * Goldstein, SIGIR 1998) — the standard re-ranking step between a
  * similarity search and a RAG/labeling consumer: plain top-k returns
  * near-duplicate neighbors; MMR greedily trades relevance against
  * redundancy so the k results COVER the neighborhood. Expressed with
  * distances: pick argmax of `-lambda * dist(d, q) + (1 - lambda) *
  * min over selected s of dist(d, s)` (the diversity term is 0 for
  * the first pick), ties broken by id ascending.
  *
  * Spark shape — the same two-regime decision as the reference's
  * weighted re-rank and this repo's KNN cursor: the CANDIDATE search
  * is distributed (exact [[Knn.knn]] top-N here; swap in an ANN probe
  * at index scale), and the greedy loop — inherently sequential in k,
  * each step reading the previous picks — runs driver-side over the
  * BOUNDED collected candidates (`candN` rows, a re-ranking input,
  * never the corpus). At 100 TB the corpus never moves: only the
  * top-`candN` rows (≤ a few hundred) cross to the driver.
  *
  * Determinism: every score is double arithmetic in a fixed operation
  * order (`-lambda * dq + (1 - lambda) * minDist`, sequential-order
  * distance accumulation — [[Metric.dist]] matches the SQL
  * `list_sum(list_transform(...))` replay bit-for-bit), so an oracle
  * can unroll the greedy steps and compare exact bits; scores round
  * to 6dp for OUTPUT only, never before a comparison. */
object Mmr {

  /** Diversified top-k: (rank, id, dist, score) in selection order. */
  def diversifiedTopK(df: DataFrame, idCol: Column, vecCol: Column,
      query: Array[Float], k: Int, lambda: Double = 0.7,
      candN: Int = 50, metric: Metric = Metric.L2Sq): DataFrame = {
    require(k > 0 && candN >= k, "need 0 < k <= candN")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val qLit = graft.functions.vecLit(query.toSeq)
    val knnMetric = metric match {
      case Metric.L2Sq => Knn.L2Sq
      case Metric.Cos => Knn.Cos
      case Metric.Hamming => Knn.Hamming
    }
    // distributed candidate stage: exact top-candN with id tiebreak.
    // Null-vector rows are filtered up front: Knn.knn orders them
    // LAST rather than dropping them, and a null candidate would NPE
    // the driver-side greedy (or rank as distance 0)
    val cands: Array[(Long, Array[Float], Double)] =
      Knn.knn(df.select(idCol.as("id"), vecCol.as("v"))
            .filter(col("v").isNotNull),
          col("v"), qLit, candN, knnMetric, Some(col("id")))
        .select(col("id"), col("v"), col("dist"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    // greedy selection over the bounded candidates
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val remaining = scala.collection.mutable.LinkedHashMap.from(
      cands.iterator.map(c => c._1 -> c))
    val selVecs = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    while (selected.length < k && remaining.nonEmpty) {
      val best = remaining.values.map { case (id, v, dq) =>
        val minDist =
          if (selVecs.isEmpty) 0.0
          else selVecs.map(s => metric.dist(v, s)).min
        (id, v, dq, -lambda * dq + (1 - lambda) * minDist)
      }.reduceLeft { (a, b) =>
        // argmax score, ties by id ascending
        if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a
      }
      selected += ((best._1, best._3, best._4))
      selVecs += best._2
      remaining.remove(best._1)
    }
    // HALF_UP, matching Spark's round() and DuckDB's round()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    selected.zipWithIndex.map { case ((id, dq, score), i) =>
      (i + 1, id, r6(dq), r6(score))
    }.toSeq.toDF("rank", "id", "dist", "score")
  }
}
