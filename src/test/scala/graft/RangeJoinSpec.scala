package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized interval join: inclusive bounds, multi-bucket intervals,
  * overlap multiplicity, degenerate intervals, and the equi-join plan. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, 100L),
    (2L, 10L, 150L),
    (3L, 10L, 250L),
    (4L, 20L, 100L)
  ).toDF("id", "k", "ts")

  private def run(right: org.apache.spark.sql.DataFrame, w: Long = 100L) =
    RangeJoin.intervalJoin(
        points, col("k"), col("ts"),
        right, col("k"), col("s"), col("e"),
        payload = Seq("iv" -> col("iv")), bucketWidthUs = w)
      .orderBy("id", "iv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))

  test("inclusive bounds on both ends; key must match") {
    val iv = Seq((100L, 10L, 100L, 150L), (200L, 30L, 0L, 1000L))
      .toDF("iv", "k", "s", "e")
    assert(run(iv).toSeq == Seq((1L, 100L), (2L, 100L)),
      "ts == start and ts == end both match; key 20/30 rows do not")
  }

  test("an interval spanning many buckets still matches every point in it") {
    // [95, 260] spans buckets 0,1,2 at width 100
    val iv = Seq((100L, 10L, 95L, 260L)).toDF("iv", "k", "s", "e")
    assert(run(iv).toSeq == Seq((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("overlapping intervals yield one row per match; empty intervals drop") {
    val iv = Seq(
      (100L, 10L, 90L, 160L),
      (101L, 10L, 140L, 200L),
      (102L, 10L, 300L, 200L) // end < start: filtered out, never explodes
    ).toDF("iv", "k", "s", "e")
    assert(run(iv).toSeq == Seq((1L, 100L), (2L, 100L), (2L, 101L)))
  }

  test("seeded-random equivalence with the brute-force definition") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.tabulate(150)(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(60).toLong))
      // spans 0..25 across bucket width 10: 1-4 buckets per interval,
      // some degenerate (end < start)
      val ivs = Seq.tabulate(60) { i =>
        val s = rnd.nextInt(60).toLong
        (1000L + i, rnd.nextInt(5).toLong, s, s + rnd.nextInt(26) - 3L)
      }
      val out = RangeJoin.intervalJoin(
          pts.toDF("id", "k", "ts"), col("k"), col("ts"),
          ivs.toDF("iv", "k", "s", "e"), col("k"), col("s"), col("e"),
          payload = Seq("iv" -> col("iv")), bucketWidthUs = 10L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3)))
        .sorted.toSeq
      val expected = (for {
        (id, pk, ts) <- pts
        (iv, ik, s, e) <- ivs
        if pk == ik && ts >= s && ts <= e
      } yield (id, iv)).sorted
      assert(out == expected, s"seed $seed diverged")
    }
  }

  test("plan is a pure equi-join on (key, bucket): no cartesian, no range join") {
    val iv = Seq((100L, 10L, 90L, 160L)).toDF("iv", "k", "s", "e")
    val df = RangeJoin.intervalJoin(points, col("k"), col("ts"),
      iv, col("k"), col("s"), col("e"),
      payload = Seq("iv" -> col("iv")), bucketWidthUs = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range predicate leaked out of the equi-join keys:\n$plan")
  }
}
