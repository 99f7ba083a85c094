package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single right row
  * with the greatest right timestamp <= the left timestamp among rows
  * sharing the key — the temporal-alignment primitive behind event
  * enrichment ("state as of the event"), point-in-time feature lookups
  * and trade/quote matching.
  *
  * Scale shape: the naive formulation is a range join — Spark plans
  * `l.k = r.k AND r.ts <= l.ts` with the range predicate as a
  * post-join filter, quadratic in the per-key row count. This
  * implementation never builds a join at all: both sides are tagged
  * and UNIONED, shuffled ONCE on the key, sorted per key by
  * (ts, side, tiebreak), and the match is `last(payload struct,
  * ignoreNulls)` over an unbounded-preceding row window — right rows
  * sort before left rows at equal timestamps, so `<=` semantics fall
  * out of the sort order, and the whole right payload travels as ONE
  * struct so a match can never mix columns from different right rows.
  * One Exchange + one sort is the floor for any per-key temporal
  * alignment; per-key skew is ordinary window skew, and nothing is
  * ever quadratic.
  *
  * Streaming note: the same alignment under watermarks is
  * `flatMapGroupsWithState` keeping the latest right row per key —
  * [[graft.streaming.EventStreams]]' keyed-state shape; this is the
  * batch plan.
  */
object AsOfJoin {

  /** @param leftTsUs / rightTsUs event time as epoch MICROSECONDS
    *   (integer time makes the ordering and the tolerance arithmetic
    *   exact and engine-portable; see `unix_micros`)
    * @param payload right-side columns to carry onto matches, by
    *   output name (must not collide with left columns). Unmatched
    *   left rows get nulls.
    * @param rightTie deterministic tiebreak among right rows sharing
    *   (key, ts) — the greatest wins, like a "latest version" pick.
    *   Required: without it a tied-timestamp match would depend on
    *   partition order.
    * @param toleranceUs match only within `leftTs - rightTs <=
    *   toleranceUs` when set; older matches null out (pandas
    *   merge_asof `tolerance`). */
  def asofBackward(
      left: DataFrame, leftKey: Column, leftTsUs: Column,
      right: DataFrame, rightKey: Column, rightTsUs: Column,
      payload: Seq[(String, Column)], rightTie: Column,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val collisions = payload.map(_._1).toSet
      .intersect(leftCols.toSet + "__asof_k" + "__asof_ts" + "__asof_side" +
        "__asof_tie" + "__asof_r" + "__asof_m")
    require(collisions.isEmpty,
      s"payload output names collide with left columns: $collisions")
    require(!leftCols.exists(_.startsWith("__asof")),
      "left side must not already carry __asof columns")

    val r = right.select(
      rightKey.as("__asof_k"),
      rightTsUs.cast("long").as("__asof_ts"),
      lit(0).as("__asof_side"),
      coalesce(rightTie.cast("long"), lit(Long.MinValue)).as("__asof_tie"),
      struct(
        (rightTsUs.cast("long").as("__asof_rts") +:
          payload.map { case (n, c) => c.as(n) }): _*).as("__asof_r"))
    val l = left.select(
      (leftKey.as("__asof_k") +:
        leftTsUs.cast("long").as("__asof_ts") +:
        lit(1).as("__asof_side") +:
        lit(0L).as("__asof_tie") +:
        leftCols.map(col)): _*)

    val w = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
        col("__asof_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = col("__asof_m")
    val inTol = toleranceUs.fold(lit(true))(t =>
      col("__asof_ts") - m.getField("__asof_rts") <= t)
    val matched = m.isNotNull && inTol

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_m",
        last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(
        leftCols.map(col) ++ payload.map { case (n, _) =>
          when(matched, m.getField(n)).as(n)
        }: _*)
  }
}
