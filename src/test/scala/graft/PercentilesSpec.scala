package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** The distributed exact-percentile histogram must agree with Spark's
  * builtin `percentile` aggregate BIT-FOR-BIT — same interpolation rule
  * (r = p * (n-1), Hive branch form), same null handling, same grouped
  * row set — while executing through spillable shapes (hash aggregate +
  * window sort) instead of one non-spillable ObjectHashAggregate map. */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  private val probsAll = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def builtin(values: Seq[Double], p: Double): Double = {
    val df = values.toDF("v")
    df.agg(percentile(col("v"), lit(p))).collect()(0).getDouble(0)
  }

  private def ours(values: Seq[Double], probs: Seq[Double]): Seq[Double] = {
    val df = values.toDF("v").repartition(7)
    val rows = Percentiles.exactQuantiles(df, col("v"), probs, "q").collect()
    assert(rows.length == 1, "exactly one global row")
    rows(0).getSeq[Double](0)
  }

  test("bit-parity with the builtin on random doubles with ties") {
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(500)(rnd.nextInt(40) * 1.0) ++
      Seq.fill(500)(rnd.nextDouble() * 100.0) ++
      Seq.fill(17)(13.37) // a heavy tie
    val got = ours(values, probsAll)
    probsAll.zip(got).foreach { case (p, q) =>
      val want = builtin(values, p)
      assert(java.lang.Double.doubleToLongBits(q) ==
        java.lang.Double.doubleToLongBits(want),
        s"p=$p: got $q want $want (bit-exact)")
    }
  }

  test("integer scores at quarter probs are exact (the contract claim)") {
    val values = (0 until 101).map(_.toDouble) // n=101, r = p*100 integral
    val got = ours(values, Seq(0.25, 0.5, 0.75))
    assert(got == Seq(25.0, 50.0, 75.0))
    // non-integral position interpolates exactly on an integer grid
    val got2 = ours((0 until 100).map(_.toDouble), Seq(0.25)) // r = 24.75
    assert(got2 == Seq(24.75))
  }

  test("edge cases: single row, constant column, probs 0 and 1") {
    assert(ours(Seq(7.5), probsAll).forall(_ == 7.5))
    assert(ours(Seq.fill(64)(3.0), probsAll).forall(_ == 3.0))
    val vs = Seq(5.0, 1.0, 9.0, 1.0)
    assert(ours(vs, Seq(0.0)) == Seq(1.0))
    assert(ours(vs, Seq(1.0)) == Seq(9.0))
  }

  test("nulls are dropped; all-null input yields an empty frame") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(2.0)), (2L, None), (3L, Some(4.0)), (4L, None))
      .toDF("id", "v")
    val got = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      .collect()(0).getSeq[Double](0)
    assert(got == Seq(3.0))
    val empty = Percentiles.exactQuantiles(
      df.filter(col("v").isNull).select(col("id"), col("v")),
      col("v"), Seq(0.5), "q")
    assert(empty.count() == 0, "empty frame, not a null row")
  }

  test("grouped variant matches groupBy(percentile) row-for-row") {
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(900) { i =>
      (s"g${i % 5}", if (i % 3 == 0) rnd.nextInt(10) * 1.0
                     else rnd.nextDouble() * 50.0)
    }.toDF("k", "v").repartition(9)
    val want = df.groupBy("k")
      .agg(percentile(col("v"), lit(0.25)).as("a"),
        percentile(col("v"), lit(0.9)).as("b"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val got = Percentiles
      .exactQuantilesBy(df, Seq("k"), col("v"), Seq(0.25, 0.9), "q")
      .collect().map { r =>
        val q = r.getSeq[Double](1); r.getString(0) -> (q(0), q(1))
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (a, b)) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(want(k)._1), s"$k p=0.25")
      assert(java.lang.Double.doubleToLongBits(b) ==
        java.lang.Double.doubleToLongBits(want(k)._2), s"$k p=0.9")
    }
  }

  test("probs order is preserved in the output array") {
    val vs = (1 to 9).map(_.toDouble)
    assert(ours(vs, Seq(0.9, 0.1, 0.5)) == Seq(8.2, 1.8, 5.0))
  }

  test("partition-layout independence") {
    val vs = Seq.tabulate(300)(i => (i % 23) * 1.5)
    val a = ours(vs, probsAll)
    val df1 = vs.toDF("v").repartition(1)
    val b = Percentiles.exactQuantiles(df1, col("v"), probsAll, "q")
      .collect()(0).getSeq[Double](0)
    assert(a == b)
  }

  test("the plan buffers values in NO object aggregate — histogram + " +
      "window only (the final collect_list folds |probs| rows)") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val plan = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("),
      "must not fall back to the builtin percentile aggregate")
    // every ObjectHashAggregate in the plan is memory-bounded: the
    // final assembly folds |probs| rows, the slice-boundary sketch is
    // a fixed-accuracy percentile_approx — never an exact value buffer
    plan.linesIterator.filter(_.contains("ObjectHashAggregate"))
      .foreach(l => assert(l.contains("collect_list(struct(__j")
        || l.contains("percentile_approx(__v"),
        s"unexpected object aggregate: $l"))
    assert(plan.contains("Window"), "local cumulative counts ride a window")
    assert(!plan.contains("Exchange SinglePartition"),
      s"no stage may funnel the value frame through one partition:\n$plan")
  }

  test("the histogram shuffle is computed once and REUSED by every " +
      "consumer (deterministic slices keep the plan canonical)") {
    val df = (1 to 5000).map(i => (i % 700) * 0.5).toDF("v").repartition(6)
    val q = Percentiles.exactQuantiles(df, col("v"), Seq(0.25, 0.9), "q")
    q.collect() // materialize so AQE finalizes the reused stages
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      plan.contains("StageMaterialization") || plan.contains("ReusedQueryStage")
      || plan.contains("TableCacheQueryStage"),
      s"histogram consumers must share one exchange:\n$plan")
  }
}
