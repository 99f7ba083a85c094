package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** The distributed exact-percentile histogram must agree with Spark's
  * builtin `percentile` aggregate BIT-FOR-BIT — same interpolation rule
  * (r = p * (n-1), Hive branch form INCLUDING the equal-order-statistics
  * short-circuit), same null handling, same grouped row set — while
  * executing through spillable shapes (hash aggregate + window sort)
  * instead of one non-spillable ObjectHashAggregate map. Dispatch is
  * adaptive (builtin under a distinct-count probe bound, prefix sum
  * above it / when forced); BOTH arms are pinned here: the prefix-sum
  * tests force `graft.percentile.maxBuiltinDistinct = 0` so they never
  * silently degrade into builtin-vs-builtin comparisons. */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  private val probsAll = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def withThreshold[T](n: Long)(body: => T): T = {
    spark.conf.set(GraftConf.PercentileMaxBuiltinDistinct, n.toString)
    try body
    finally spark.conf.unset(GraftConf.PercentileMaxBuiltinDistinct)
  }
  private def forcePrefixSum[T](body: => T): T = withThreshold(0L)(body)
  private def withRowsFloor[T](n: Long)(body: => T): T = {
    spark.conf.set(GraftConf.PercentileMaxBuiltinRows, n.toString)
    try body
    finally spark.conf.unset(GraftConf.PercentileMaxBuiltinRows)
  }

  private def builtin(values: Seq[Double], p: Double): Double = {
    val df = values.toDF("v")
    df.agg(percentile(col("v"), lit(p))).collect()(0).getDouble(0)
  }

  /** The PREFIX-SUM arm, forced. */
  private def ours(values: Seq[Double], probs: Seq[Double]): Seq[Double] =
    forcePrefixSum {
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

  test("tie spanning a fractional position returns the tied value " +
      "EXACTLY (the builtin's equal-order-statistics branch, not the " +
      "1-ulp-drifting interpolation)") {
    // all values 0.1: interpolating (0.7)*0.1 + (0.3)*0.1 in double is
    // 0.09999999999999999 — one ulp OFF the builtin's short-circuit
    val values = Seq.fill(11)(0.1) // n=11, p=0.33 -> r=3.3, lov == upv
    val got = ours(values, Seq(0.33))
    val want = builtin(values, 0.33)
    assert(java.lang.Double.doubleToLongBits(got.head) ==
      java.lang.Double.doubleToLongBits(want),
      s"got ${got.head} want $want (bit-exact)")
    assert(got.head == 0.1)
    // and a tie BLOCK inside mixed data whose boundary spans r
    val mixed = Seq(0.0, 0.0, 0.0) ++ Seq.fill(5)(0.1) ++ Seq(7.0, 9.0)
    val p = 0.45 // n=10, r=4.05 — both order stats inside the 0.1 block
    assert(java.lang.Double.doubleToLongBits(ours(mixed, Seq(p)).head) ==
      java.lang.Double.doubleToLongBits(builtin(mixed, p)))
  }

  test("±Infinity values stay in the ONE global group (NaN-safe key)") {
    val values = Seq(1.0, 2.0, Double.PositiveInfinity,
      Double.NegativeInfinity)
    // `ours` asserts exactly one global row — the old v*0 key sent
    // infinite rows (v*0 = NaN) to a second group
    val got = ours(values, Seq(0.0, 0.5, 1.0))
    assert(got(0) == Double.NegativeInfinity)
    assert(got(2) == Double.PositiveInfinity)
    assert(java.lang.Double.doubleToLongBits(got(1)) ==
      java.lang.Double.doubleToLongBits(builtin(values, 0.5)))
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

  test("nulls are dropped; all-null input yields an empty frame " +
      "(both arms)") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(2.0)), (2L, None), (3L, Some(4.0)), (4L, None))
      .toDF("id", "v")
    for (thr <- Seq(0L, 1000000L)) withThreshold(thr) {
      val got = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
        .collect()(0).getSeq[Double](0)
      assert(got == Seq(3.0), s"threshold $thr")
      val empty = Percentiles.exactQuantiles(
        df.filter(col("v").isNull).select(col("id"), col("v")),
        col("v"), Seq(0.5), "q")
      assert(empty.count() == 0,
        s"empty frame, not a null row (threshold $thr)")
    }
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
    val got = forcePrefixSum {
      Percentiles
        .exactQuantilesBy(df, Seq("k"), col("v"), Seq(0.25, 0.9), "q")
        .collect().map { r =>
          val q = r.getSeq[Double](1); r.getString(0) -> (q(0), q(1))
        }.toMap
    }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (a, b)) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(want(k)._1), s"$k p=0.25")
      assert(java.lang.Double.doubleToLongBits(b) ==
        java.lang.Double.doubleToLongBits(want(k)._2), s"$k p=0.9")
    }
  }

  test("both dispatch arms are bit-equal on the same frame " +
      "(global and grouped)") {
    val rnd = new scala.util.Random(23)
    val df = Seq.tabulate(700) { i =>
      (s"g${i % 3}",
        if (i % 4 == 0) 0.1 else rnd.nextInt(50) * 0.7 + rnd.nextDouble())
    }.toDF("k", "v").repartition(5)
    def run(thr: Long): (Seq[Double], Map[String, Seq[Double]]) =
      withThreshold(thr) {
        val g = Percentiles.exactQuantiles(df, col("v"), probsAll, "q")
          .collect()(0).getSeq[Double](0)
        val by = Percentiles
          .exactQuantilesBy(df, Seq("k"), col("v"), probsAll, "q")
          .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
        (g, by)
      }
    val (gPrefix, byPrefix) = run(0L)          // forced prefix sum
    val (gBuiltin, byBuiltin) = run(10000000L) // probe routes to builtin
    def bits(xs: Seq[Double]) = xs.map(java.lang.Double.doubleToLongBits)
    assert(bits(gPrefix) == bits(gBuiltin), "global arms bit-equal")
    assert(byPrefix.keySet == byBuiltin.keySet)
    byPrefix.foreach { case (k, v) =>
      assert(bits(v) == bits(byBuiltin(k)), s"group $k arms bit-equal")
    }
  }

  test("null keys form their own group, matching the builtin " +
      "(both arms — the offset joins are null-safe)") {
    val df = Seq(
      (Option("a"), 1.0), (Option.empty[String], 2.0),
      (Option.empty[String], 4.0), (Option("a"), 3.0),
      (Option("b"), 5.0), (Option.empty[String], 8.0))
      .toDF("k", "v").repartition(3)
    val want = df.groupBy("k")
      .agg(percentile(col("v"), lit(0.5)).as("q"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(want.contains(None), "fixture must exercise a null key")
    for (thr <- Seq(0L, 1000000L)) withThreshold(thr) {
      val got = Percentiles
        .exactQuantilesBy(df, Seq("k"), col("v"), Seq(0.5), "q")
        .collect()
        .map(r => Option(r.getString(0)) -> r.getSeq[Double](1).head)
        .toMap
      assert(got.keySet == want.keySet, s"threshold $thr: row set")
      got.foreach { case (k, q) =>
        assert(java.lang.Double.doubleToLongBits(q) ==
          java.lang.Double.doubleToLongBits(want(k)),
          s"threshold $thr, key $k")
      }
    }
  }

  test("a compressed file scan's sizeInBytes must NOT route a " +
      "many-row narrow-domain frame into the builtin (its buffer is " +
      "unspillable; parquet RLE sits far under any bytes/row floor)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pctl_rle").toString
    // 50k rows of ONE value: dictionary+RLE packs the column into a
    // few hundred bytes on disk — the old 16-bytes/row stats hint
    // read that as "under 1000 rows" and misrouted
    Seq.fill(50000)(3.0).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    withRowsFloor(1000L) {
      val q = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile("),
        s"50k rows over a 1000-row floor took the builtin arm:\n$plan")
      assert(plan.contains("Window"), "expected the prefix-sum arm")
      assert(q.collect()(0).getSeq[Double](0) == Seq(3.0))
    }
  }

  test("stats negative short-circuit: when the input is provably past " +
      "every builtin bound, the probe pass never runs (dispatch " +
      "executes NOTHING at plan-construction time)") {
    // an expression that throws on ANY row evaluation: if the dispatch
    // ran its probe aggregate here, construction itself would raise
    val boom = col("v") +
      expr("raise_error('probe must not run')").cast("double")
    // a Range leaf, NOT a LocalRelation: ConvertToLocalRelation would
    // evaluate the projection EAGERLY in the optimizer and fire the
    // raise_error before any dispatch decision is made. Range reports
    // an exact rowCount stat (5000 > rows floor + 1.5 * distinct cap),
    // so this exercises the rowCount negative short-circuit directly
    val df = spark.range(5000).select(col("id").cast("double").as("v"))
    withRowsFloor(10L) { withThreshold(10L) {
      val q = Percentiles.exactQuantiles(df, boom, Seq(0.5), "q")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile("), "must take the prefix sum")
      assert(plan.contains("Window"))
    } }
  }

  test("knownRows replaces the probe at both extremes (no execution " +
      "at dispatch time; caller counts are authoritative)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pctl_kr").toString
    (1 to 50).map(_.toDouble).toDF("v")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir) // file leaf: no rowCount stats
    val boom = col("v") +
      expr("raise_error('probe must not run')").cast("double")
    // under the floor -> builtin directly, probe skipped
    val q = Percentiles.exactQuantiles(df, boom, Seq(0.5), "q",
      knownRows = 50L)
    assert(q.queryExecution.executedPlan.toString.contains("percentile("),
      "a caller-bounded input must take the builtin arm probe-free")
    // past the hard cap -> prefix sum directly, probe skipped
    withRowsFloor(10L) { withThreshold(10L) {
      val q2 = Percentiles.exactQuantiles(df, boom, Seq(0.5), "q",
        knownRows = 50L)
      val p2 = q2.queryExecution.executedPlan.toString
      assert(!p2.contains("percentile(") && p2.contains("Window"),
        "a caller-overflowing count must take the prefix sum probe-free")
    } }
    // and the knownRows route returns the builtin's exact value
    val got = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q",
      knownRows = 50L).collect()(0).getSeq[Double](0).head
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(
        builtin((1 to 50).map(_.toDouble), 0.5)))
  }

  test("a stats-less leaf (placeholder sizeInBytes) falls through to " +
      "the probe instead of tripping the negative short-circuit") {
    // an RDD-backed LogicalRDD without origin stats reports the
    // session's placeholder defaultSizeInBytes (Long.MaxValue); the
    // short-circuit must IGNORE that value — otherwise it would
    // permanently route every such plan into the prefix sum, skipping
    // the probe and the builtin arm exactly where the probe is
    // cheapest (a materialized boundary re-reads without recomputing
    // its lineage)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 20).map(i =>
        org.apache.spark.sql.Row(i.toDouble)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    withRowsFloor(10L) { withThreshold(1000L) {
      // 20 rows, 20 distinct: inside the probe bound (10 + 1.5*20),
      // outside every stats bound -> only the probe can route this to
      // the builtin arm
      val q = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      assert(q.queryExecution.executedPlan.toString.contains("percentile("),
        "a stats-less bounded input must reach the builtin via the probe")
      assert(q.collect()(0).getSeq[Double](0) ==
        Seq(builtin((1 to 20).map(_.toDouble), 0.5)))
    } }
  }

  test("the positive row-floor routes are clamped to the distinct cap " +
      "(a floor raised past maxBuiltinDistinct must not route an " +
      "all-distinct frame into the unspillable buffer)") {
    val df = spark.range(50).select(col("id").cast("double").as("v"))
    // floor 1000 > distinct cap 10: both positive routes (knownRows
    // and the Range leaf's exact rowCount = 50, each under the raw
    // floor) must be clamped to min(floor, cap) = 10 and fall through
    // to the probe, which sees 50 distinct > 10 -> prefix sum
    withRowsFloor(1000L) { withThreshold(10L) {
      val viaKnown = Percentiles.exactQuantiles(df, col("v"), Seq(0.5),
        "q", knownRows = 50L)
      val pk = viaKnown.queryExecution.executedPlan.toString
      assert(!pk.contains("percentile(") && pk.contains("Window"),
        s"knownRows route ignored the distinct cap:\n$pk")
      val viaStats = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      val ps = viaStats.queryExecution.executedPlan.toString
      assert(!ps.contains("percentile(") && ps.contains("Window"),
        s"rowCount route ignored the distinct cap:\n$ps")
      assert(viaKnown.collect()(0).getSeq[Double](0) ==
        Seq(builtin((0 until 50).map(_.toDouble), 0.5)))
    } }
  }

  test("probs order is preserved in the output array") {
    val vs = (1 to 9).map(_.toDouble)
    assert(ours(vs, Seq(0.9, 0.1, 0.5)) == Seq(8.2, 1.8, 5.0))
  }

  test("partition-layout independence") {
    val vs = Seq.tabulate(300)(i => (i % 23) * 1.5)
    val a = ours(vs, probsAll)
    val df1 = vs.toDF("v").repartition(1)
    val b = forcePrefixSum {
      Percentiles.exactQuantiles(df1, col("v"), probsAll, "q")
        .collect()(0).getSeq[Double](0)
    }
    assert(a == b)
  }

  test("adaptive dispatch: bounded input routes to the builtin " +
      "aggregate; forced threshold 0 runs the prefix sum, probe-free") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    // default threshold (100k) — 100 distinct values probe under it
    val builtinPlan = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
      .queryExecution.executedPlan.toString
    assert(builtinPlan.contains("percentile("),
      s"bounded input must take the builtin arm:\n$builtinPlan")
    assert(!builtinPlan.contains("Window"),
      "the builtin arm has no window stage")
    forcePrefixSum {
      val p = Percentiles.exactQuantiles(df, col("v"), Seq(0.5), "q")
        .queryExecution.executedPlan.toString
      assert(!p.contains("percentile("), "threshold 0 forces the prefix sum")
    }
  }

  test("the prefix-sum plan buffers values in NO object aggregate — " +
      "histogram + window only (the final collect_list folds |probs| " +
      "rows)") {
    forcePrefixSum {
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
  }

  test("the histogram shuffle is computed once and REUSED by every " +
      "consumer (deterministic slices keep the plan canonical)") {
    forcePrefixSum {
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
}
