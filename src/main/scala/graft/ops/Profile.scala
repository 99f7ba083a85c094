package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data profiling (the validation step every ingest pipeline
  * runs before anything else touches the corpus): per-column row
  * count, null count, exact distinct count, and min/max, emitted in
  * long format `(col_name, n_rows, n_null, n_distinct, min_s, max_s)`.
  *
  * Scale shape: ALL columns profile in ONE aggregation pass — Spark
  * plans the multi-column `count(distinct ...)` through its native
  * Expand operator (one input row fans out to #cols+1 aggregation
  * streams, each partially aggregated map-side), so the corpus is
  * scanned once regardless of how many columns are profiled. min/max
  * ride the same pass. Nothing driver-side except the #cols-row
  * result.
  *
  * Exact `count(distinct)` is the CONTRACT semantics (DuckDB-checkable
  * and what a validation gate asserts against); at 100 TB swap
  * `exactDistinct = false` to profile with `approx_count_distinct`
  * (HLL, one pass, no Expand) — the published-practice default for
  * profiling dashboards.
  *
  * min/max stringify through a fixed cast so heterogeneous column
  * types share one output schema; timestamps profile as epoch
  * microseconds to stay engine-portable. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"columns not in the frame: $bad")
    def norm(c: String): Column = {
      val dt = df.schema(c).dataType.typeName
      if (dt == "timestamp") unix_micros(col(c))
      // NTZ needs the cast; under the UTC session it is the same instant
      else if (dt == "timestamp_ntz") unix_micros(col(c).cast("timestamp"))
      else col(c)
    }
    val aggs = cols.flatMap { c =>
      val v = norm(c)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(v.isNull, 1)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(v)
         else approx_count_distinct(v)).as(s"__nd_$c"),
        min(v).cast("string").as(s"__min_$c"),
        max(v).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_rows"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
