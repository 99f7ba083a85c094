package graft

import org.apache.spark.sql.functions._
import graft.functions.{vec_avg, vec_sum}

/** vec_sum / vec_avg: the element-wise vector aggregate behind
  * per-group embedding centroids. */
class VecAggSpec extends SparkSpec {

  import spark.implicits._

  test("vec_sum and vec_avg across partitions match the serial result") {
    val rows = (1 to 97).map(i =>
      (i % 3, Seq(i.toDouble, -i.toDouble, i / 2.0)))
    val df = rows.toDF("g", "v").repartition(7)
    val out = df.groupBy("g")
      .agg(vec_sum(col("v")).as("s"), vec_avg(col("v")).as("m"),
        count(lit(1)).as("n"))
      .orderBy("g").collect()
    for (r <- out) {
      val g = r.getInt(0)
      val want = rows.filter(_._1 == g).map(_._2)
      val wantSum = want.transpose.map(_.sum)
      assert(r.getSeq[Double](1) == wantSum, s"sum g=$g")
      assert(r.getSeq[Double](2) == wantSum.map(_ / want.size), s"avg g=$g")
    }
  }

  test("float arrays are accepted and accumulate in double") {
    val df = Seq((1, Seq(0.5f, 0.25f)), (1, Seq(1.5f, 0.75f)))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(vec_sum(col("v"))).collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 1.0))
  }

  test("null vectors are ignored; an all-null group sums to null") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, null: Seq[Double]),
      (2, null: Seq[Double])).toDF("g", "v")
    val out = df.groupBy("g").agg(vec_sum(col("v")).as("s"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(1.0, 2.0))
    assert(out(1).isNullAt(1))
  }

  test("a group of empty vectors sums to an empty array, not null") {
    // repartition forces the serialize/deserialize path between the
    // partial and final aggregation — a dim-0 buffer must survive it
    val df = Seq((1, Seq.empty[Double]), (1, Seq.empty[Double]))
      .toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(vec_sum(col("v")).as("s")).collect()
    assert(!out(0).isNullAt(1) && out(0).getSeq[Double](1).isEmpty)
  }

  test("dimension mismatch fails instead of silently truncating") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(vec_sum(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }
}
