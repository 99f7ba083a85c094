package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Decade probe for the temporal join operators: hash-deterministic
  * synthetic corpora (no driver data, no RNG state) at whatever row
  * count the host holds, timing [[AsOfJoin.asofBackward]] and
  * [[RangeJoin.intervalJoin]] and counting their shuffles — the
  * measured backing for the "one Exchange / never per-key cartesian"
  * claims at sizes the contract fixtures cannot reach.
  *
  *   runMain graft.tools.JoinProbe [nLeft=1000000] [keys=10000] [threads=8]
  */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val keys = args.lift(1).map(_.toInt).getOrElse(10000)
    val threads = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // left: n points over `keys` keys, ~1 per minute per key stream;
    // right: n/10 intervals (resp. n/10 as-of anchors), same key space.
    // Every value is a pure function of the row id (xxhash64 mixes).
    val left = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(keys.toLong)).as("k"),
      (col("id") * 60000000L + pmod(xxhash64(col("id"), lit(1)),
        lit(59000000L))).as("ts"))
      .cache()
    val right = spark.range(n / 10).select(
      (col("id") * 7L).as("rid"),
      pmod(xxhash64(col("id"), lit(2)), lit(keys.toLong)).as("k"),
      (col("id") * 600000000L + pmod(xxhash64(col("id"), lit(3)),
        lit(590000000L))).as("ts"))
      .cache()
    left.count(); right.count()

    def timed(name: String)(f: => (Long, String)): Unit = {
      val t0 = System.nanoTime()
      val (rows, plan) = f
      val s = (System.nanoTime() - t0) / 1e9
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val cartesian = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      println(f"$name%-14s $s%8.2f s  $rows%12d rows  " +
        f"$exchanges exchanges  cartesian=$cartesian")
    }

    // count MATCHED rows, not rows: a bare count() lets Catalyst prune
    // the window projection away and times only the union scan
    timed("asof") {
      val df = AsOfJoin.asofBackward(
        left, col("k"), col("ts"),
        right, col("k"), col("ts"),
        payload = Seq("rid" -> col("rid"), "rts" -> col("ts")),
        rightTie = col("rid"))
      (df.filter(col("rid").isNotNull).count(),
        df.queryExecution.executedPlan.toString)
    }
    timed("asof_tol") {
      val df = AsOfJoin.asofBackward(
        left, col("k"), col("ts"),
        right, col("k"), col("ts"),
        payload = Seq("rid" -> col("rid")),
        rightTie = col("rid"), toleranceUs = Some(3600000000L))
      (df.filter(col("rid").isNotNull).count(),
        df.queryExecution.executedPlan.toString)
    }
    timed("interval") {
      val iv = right.withColumn("e", col("ts") + 3600000000L)
      val df = RangeJoin.intervalJoin(
        left, col("k"), col("ts"),
        iv, col("k"), col("ts"), col("e"),
        payload = Seq("rid" -> col("rid")), bucketWidthUs = 3600000000L)
      (df.count(), df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
