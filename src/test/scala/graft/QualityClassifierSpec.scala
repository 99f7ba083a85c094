package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** Planted separable corpus: positive docs speak list-A words,
    * negative docs list-B, with a shared filler word both classes use. */
  private val posWords = Seq("clean", "curated", "edited", "cited")
  private val negWords = Seq("spam", "clickbait", "garbled", "keyword")
  private def planted(n: Int): Seq[(Long, String, Boolean)] =
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val words = if (pos) posWords else negWords
      val text = (0 until 8).map(j => words((i + j) % words.size))
        .mkString(" ") + " shared"
      (i.toLong, text, pos)
    }

  test("fixed-point weights and scores match a hand computation") {
    val docs = Seq(
      (1L, "good good fine", true),
      (2L, "good bad", true),
      (3L, "bad bad fine", false)).toDF("doc_id", "text", "pos")
    val dim = 64
    val counts = QualityClassifier.trainCounts(docs, col("text"),
      col("pos"), dim)
    val byTok = docs.select(explode(graft.functions.tokenize(col("text")))
        .as("t")).distinct()
      .select(col("t"), QualityClassifier.bucketOf(col("t"), dim).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct buckets (no collisions expected among 3 tokens in 64)
    assert(byTok.values.toSet.size == 3)
    val cm = counts.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cm(byTok("good")) == (3L, 0L))
    assert(cm(byTok("bad")) == (1L, 2L))
    assert(cm(byTok("fine")) == (1L, 1L))
    val w = QualityClassifier.fixedPointWeights(counts)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wm(byTok("good")) == (4L * 1000000L) / 5L) // (3+1)*S/(3+0+2)
    assert(wm(byTok("bad")) == (2L * 1000000L) / 5L)
    assert(wm(byTok("fine")) == (2L * 1000000L) / 4L)
    val scored = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w, dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // doc 1: good+good+fine = 800000+800000+500000 = 2100000 / 3
    assert(scored(1L) == (2100000L, 3L, 700000L))
    // doc 2: good+bad = 800000+400000 / 2
    assert(scored(2L) == (1200000L, 2L, 600000L))
    // doc 3: bad+bad+fine = 400000+400000+500000 / 3
    assert(scored(3L) == (1300000L, 3L, 433333L))
  }

  test("empty and unseen-vocabulary documents score (0, 0, 0)") {
    val train = Seq((1L, "alpha beta", true), (2L, "gamma", false))
      .toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(train, col("text"), col("pos"))
    val w = QualityClassifier.fixedPointWeights(counts)
    val docs = Seq((10L, ""), (11L, "unseen words only"), (12L, "alpha"))
      .toDF("doc_id", "text")
    val scored = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(scored(10L) == (0L, 0L, 0L))
    assert(scored(11L) == (0L, 0L, 0L))
    assert(scored(12L) == (666666L, 1L, 666666L)) // (1+1)*S/(1+0+2)
  }

  test("log-odds NB separates the planted corpus perfectly") {
    val docs = planted(60).toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(docs, col("text"), col("pos"))
    val scores = QualityClassifier
      .scoreLogOdds(docs, col("doc_id"), col("text"), counts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val labels = planted(60).map(t => t._1 -> t._3).toMap
    assert(labels.forall { case (id, pos) =>
      if (pos) scores(id) > 0 else scores(id) < 0 })
  }

  test("fixed-point score separates the planted corpus with a SCALE/2 threshold") {
    val docs = planted(60).toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(docs, col("text"), col("pos"))
    val w = QualityClassifier.fixedPointWeights(counts)
    val scored = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val labels = planted(60).map(t => t._1 -> t._3).toMap
    val mid = QualityClassifier.Scale / 2
    assert(labels.forall { case (id, pos) =>
      if (pos) scored(id) > mid else scored(id) < mid })
  }

  test("keepTopFraction gates the corpus to the positive half") {
    val docs = planted(60).toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(docs, col("text"), col("pos"))
    val w = QualityClassifier.fixedPointWeights(counts)
    val scored = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w)
    val kept = QualityClassifier
      .keepTopFraction(scored, col("score_fp"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val labels = planted(60).map(t => t._1 -> t._3).toMap
    // the planted corpus separates perfectly, so the top half IS the
    // positive class
    assert(kept == labels.filter(_._2).keySet)
    // frac = 1.0 keeps EVERYTHING — the strict-> filter must not drop
    // the minimum-scoring tie block
    assert(QualityClassifier.keepTopFraction(scored, col("score_fp"), 1.0)
      .count() == 60)
  }

  test("exact-percentile gate (the contract path) agrees with approx away from ties") {
    val docs = planted(60).toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(docs, col("text"), col("pos"))
    val w = QualityClassifier.fixedPointWeights(counts)
    val scored = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w)
    // exact = true is the DuckDB-replayable contract variant; approx is
    // the one-pass 100-TB default. On a corpus whose quantile does not
    // sit inside a tie block the kept sets are identical — the swap is
    // a precision statement, not a semantics change.
    val exact = QualityClassifier
      .keepTopFraction(scored, col("score_fp"), 0.5, exact = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = QualityClassifier
      .keepTopFraction(scored, col("score_fp"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == approx)
    // and the exact threshold is the interpolated percentile: with the
    // planted corpus's perfect separation the kept set IS the top half
    val labels = planted(60).map(t => t._1 -> t._3).toMap
    assert(exact == labels.filter(_._2).keySet)
  }

  test("tierByQuantile bins into quantile buckets; threshold ties sink lower") {
    import spark.implicits._
    // scores 1..8: exact quartile thresholds (2.75, 4.5, 6.25) ->
    // tiers {1,2}->1, {3,4}->2, {5,6}->3, {7,8}->4
    val scored = (1L to 8L).map(i => (i, i)).toDF("doc_id", "score_fp")
    val tiers = QualityClassifier
      .tierByQuantile(scored, col("score_fp"), 4, exact = true)
      .orderBy("doc_id").collect().map(_.getAs[Int]("tier")).toSeq
    assert(tiers == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // a score exactly AT a threshold sinks to the lower tier: with
    // scores 1,1,1,3 and 2 tiers the median is 1.0 — the three 1s are
    // NOT strictly above it
    val tied = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 3L))
      .toDF("doc_id", "score_fp")
    val t2 = QualityClassifier
      .tierByQuantile(tied, col("score_fp"), 2, exact = true)
      .orderBy("doc_id").collect().map(_.getAs[Int]("tier")).toSeq
    assert(t2 == Seq(1, 1, 1, 2))
    // exact and approx agree away from interpolation ties
    val big = (1L to 100L).map(i => (i, i * 10)).toDF("doc_id", "score_fp")
    val e = QualityClassifier.tierByQuantile(big, col("score_fp"), 5,
      exact = true).orderBy("doc_id").collect().map(_.getAs[Int]("tier")).toSeq
    val a = QualityClassifier.tierByQuantile(big, col("score_fp"), 5)
      .orderBy("doc_id").collect().map(_.getAs[Int]("tier")).toSeq
    assert(e == a)
  }

  test("gate on an empty corpus returns empty, both percentile variants") {
    import spark.implicits._
    val scored = Seq.empty[(Long, Long)].toDF("doc_id", "score_fp")
    // percentile over zero rows yields a null threshold; the strict >
    // filter then keeps nothing — no crash, no spurious rows
    assert(QualityClassifier
      .keepTopFraction(scored, col("score_fp"), 0.25).count() == 0)
    assert(QualityClassifier
      .keepTopFraction(scored, col("score_fp"), 0.25, exact = true)
      .count() == 0)
  }

  test("spark.ml logistic regression reaches full accuracy on the planted corpus") {
    val docs = planted(80).toDF("doc_id", "text", "pos")
    val model = QualityClassifier.trainLogReg(docs, col("text"), col("pos"))
    val scored = QualityClassifier
      .scoreLogReg(model, docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val labels = planted(80).map(t => t._1 -> t._3).toMap
    val correct = labels.count { case (id, pos) =>
      scored(id) == (if (pos) 1.0 else 0.0) }
    assert(correct == 80, s"only $correct/80 correct")
  }

  test("scoring plan: weight join broadcasts, no shuffle on the corpus side beyond the doc groupBy") {
    val docs = planted(40).toDF("doc_id", "text", "pos")
    val counts = QualityClassifier.trainCounts(docs, col("text"), col("pos"))
    val w = QualityClassifier.fixedPointWeights(counts)
    val plan = QualityClassifier
      .scoreFixedPoint(docs, col("doc_id"), col("text"), w)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
