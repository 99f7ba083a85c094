package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Backward as-of join: pick semantics, equal-timestamp inclusion,
  * deterministic ties, tolerance, and the one-Exchange plan shape. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, 100L), // user 10 at t=100
    (2L, 10L, 205L),
    (3L, 20L, 50L),  // user 20 before any right row
    (4L, 30L, 100L)  // user 30 has no right rows at all
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    (101L, 10L, 100L, 1.0), // equal ts as left id=1: matches (<=)
    (102L, 10L, 100L, 2.0), // same (k, ts): greater tie wins
    (103L, 10L, 200L, 3.0),
    (104L, 20L, 60L, 4.0)   // after left id=3: no match
  ).toDF("rid", "k", "ts", "v")

  private def run(tol: Option[Long] = None) =
    AsOfJoin.asofBackward(
        left, col("k"), col("ts"),
        right, col("k"), col("ts"),
        payload = Seq("rid" -> col("rid"), "rv" -> col("v")),
        rightTie = col("rid"), toleranceUs = tol)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))

  test("latest at-or-before match; ties pick the greatest tiebreak") {
    val out = run()
    assert(out(0) == ((1L, Some(102L), Some(2.0))),
      "equal-ts right row must match, and rid=102 wins the (k,ts) tie")
    assert(out(1) == ((2L, Some(103L), Some(3.0))))
    assert(out(2) == ((3L, None, None)), "right row after left ts: no match")
    assert(out(3) == ((4L, None, None)), "key with no right rows: no match")
  }

  test("tolerance nulls out stale matches; the boundary is inclusive") {
    val tight = run(tol = Some(3L))
    assert(tight(0) == ((1L, Some(102L), Some(2.0))), "lag 0 <= 3 survives")
    assert(tight(1) == ((2L, None, None)), "lag 5 > 3 nulls out")
    val exact = run(tol = Some(5L))
    // left id=2 at ts=205 matches rid=103 at ts=200: lag exactly 5
    assert(exact(1) == ((2L, Some(103L), Some(3.0))), "lag == tolerance keeps")
  }

  test("plan has exactly one Exchange: union + window, never a join") {
    val df = AsOfJoin.asofBackward(
      left, col("k"), col("ts"),
      right, col("k"), col("ts"),
      payload = Seq("rid" -> col("rid")), rightTie = col("rid"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("seeded-random equivalence with the brute-force definition") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // few keys + coarse timestamps force heavy key and ts collisions
      val lRows = Seq.tabulate(150)(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      val rRows = Seq.tabulate(80)(i =>
        (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      val tol = if (seed % 2 == 0) Some(7L) else None
      val out = AsOfJoin.asofBackward(
          lRows.toDF("id", "k", "ts"), col("k"), col("ts"),
          rRows.toDF("rid", "k", "ts"), col("k"), col("ts"),
          payload = Seq("rid" -> col("rid")), rightTie = col("rid"),
          toleranceUs = tol)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      val expected = lRows.map { case (id, k, ts) =>
        val cands = rRows.filter(r => r._2 == k && r._3 <= ts &&
          tol.forall(t => ts - r._3 <= t))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._3, r._1))._1))
      }.toMap
      assert(out == expected, s"seed $seed (tol=$tol) diverged")
    }
  }

  test("payload rides as one struct: a match never mixes right rows") {
    // two right rows where the later one carries a NULL payload value;
    // independent per-column lasts would resurrect the older value
    val r2 = Seq(
      (201L, 10L, 100L, Some(7.0)),
      (202L, 10L, 150L, None: Option[Double])
    ).toDF("rid", "k", "ts", "v")
    val out = AsOfJoin.asofBackward(
        left.filter(col("id") === 2L), col("k"), col("ts"),
        r2, col("k"), col("ts"),
        payload = Seq("rid" -> col("rid"), "rv" -> col("v")),
        rightTie = col("rid"))
      .collect()
    assert(out(0).getLong(3) == 202L)
    assert(out(0).isNullAt(4),
      "the matched row's null payload must stay null — not backfill from an older right row")
  }
}
