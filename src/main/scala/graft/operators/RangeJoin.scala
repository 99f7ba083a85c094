package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval join: match left point rows `(key, ts)` to
  * right interval rows `(key, [start, end])`, bounds inclusive — the
  * point-in-interval primitive behind session attribution, outage
  * blame, and validity-window lookups.
  *
  * Scale shape: Spark plans `l.k = r.k AND l.ts BETWEEN r.s AND r.e`
  * as an equi-join on the key with the range as a POST-JOIN filter —
  * per-key cartesian, quadratic in per-key row counts (one hot key
  * stalls the stage). This implementation makes the range part of the
  * JOIN KEY: intervals explode into the fixed-width time buckets they
  * overlap, points map to their single bucket, and the join is a pure
  * hash equi-join on `(key, bucket)` followed by the exact BETWEEN
  * residual. The explosion factor is bounded by
  * `span / bucketWidth + 1` — pick the bucket width near the typical
  * interval span and it is ~2. Both sides shuffle once; nothing is
  * ever per-key quadratic.
  *
  * Inner-join semantics: one output row per (point, interval) match —
  * a point inside two overlapping intervals matches both (callers
  * aggregate as needed). Payload rides as named right-side columns.
  */
object RangeJoin {

  /** @param leftTsUs / startUs / endUs epoch-microsecond longs
    *   (integer time: exact bucket arithmetic, engine-portable)
    * @param bucketWidthUs bucket width; intervals explode into
    *   `(end div w) - (start div w) + 1` buckets each
    * @param payload right-side columns carried onto matches, by output
    *   name (must not collide with left columns) */
  def intervalJoin(
      left: DataFrame, leftKey: Column, leftTsUs: Column,
      right: DataFrame, rightKey: Column, startUs: Column, endUs: Column,
      payload: Seq[(String, Column)], bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, s"bucket width must be positive: $bucketWidthUs")
    require(payload.nonEmpty, "interval join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val collisions = payload.map(_._1).toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"payload output names collide with left columns: $collisions")
    require(!leftCols.exists(_.startsWith("__rj")),
      "left side must not already carry __rj columns")

    // `div` = integer division: bucket ids stay exact at any epoch
    // (a double floor() would be fine to 2^53 but exact is free here)
    val r = right
      .filter(endUs >= startUs)
      .select(
        rightKey.as("__rj_k"),
        startUs.cast("long").as("__rj_s"),
        endUs.cast("long").as("__rj_e"),
        struct(payload.map { case (n, c) => c.as(n) }: _*).as("__rj_r"))
      .withColumn("__rj_b", explode(expr(
        s"sequence(__rj_s div $bucketWidthUs, __rj_e div $bucketWidthUs)")))
    val l = left.select(
      (leftKey.as("__rj_k") +:
        leftTsUs.cast("long").as("__rj_ts") +:
        leftCols.map(col)): _*)
      .withColumn("__rj_b", expr(s"__rj_ts div $bucketWidthUs"))

    l.join(r, Seq("__rj_k", "__rj_b"))
      .filter(col("__rj_ts") >= col("__rj_s") &&
        col("__rj_ts") <= col("__rj_e"))
      .select(
        leftCols.map(col) ++ payload.map { case (n, _) =>
          col("__rj_r").getField(n).as(n)
        }: _*)
  }
}
