package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated percentiles.
  *
  * Spark's builtin `percentile` aggregate is exact but buffers a
  * per-distinct-value count map inside ONE ObjectHashAggregate task per
  * group — non-spillable, and for a global percentile that single task
  * holds every distinct score in the corpus. This operator computes the
  * same number (bit-for-bit: position `r = p * (n-1)`, linear
  * interpolation between the floor/ceil order statistics — the
  * Hive/DuckDB `quantile_cont` rule) through plan shapes that spill:
  *
  *   1. value histogram: `groupBy(value).count()` — map-side partial
  *      aggregation, Tungsten hash aggregate, spills to sort;
  *   2. exact global ranks by a DISTRIBUTED PREFIX SUM over the
  *      distinct-value frame: deterministic quantile-boundary slices
  *      of each key's value range, local cumulative counts per slice
  *      (a window partitioned by (keys, slice) — every sort is
  *      partition-local and spills), plus exclusive per-slice offsets
  *      from windows over the tiny slice-totals frame, broadcast back;
  *   3. each requested probability joins its two covering rows and
  *      interpolates — pure Catalyst arithmetic, no UDF, no driver
  *      action (results stay in-plan as a 1-row / per-key frame for
  *      the broadcast-threshold discipline used by the quality gate).
  *
  * Dispatch is ADAPTIVE: plan statistics or a one-row probe route
  * bounded inputs through the builtin `percentile` aggregate —
  * bit-identical and several stages cheaper — keeping the prefix sum
  * for the unbounded case it exists for. The rule and its measured
  * cost model live at the dispatch site below;
  * `graft.percentile.maxBuiltinDistinct <= 0` forces the prefix sum
  * (and skips the probe's extra input scan).
  *
  * At 100 TB nothing here concentrates: even an all-distinct
  * continuous score column flows through balanced range slices — no
  * single-reducer sort, no unspillable map, no `WindowExec` moving
  * "all data to a single partition". The only small frame is the
  * slice-totals table (|keys| × shuffle partitions), so the grouped
  * variant assumes a bounded key domain (cluster ids, sources — the
  * engine's uses). `percentile_approx` remains the production default
  * everywhere; this is the contract path the DuckDB oracle replays
  * exactly.
  *
  * Reference analog: the reference computes its quality-threshold
  * cuts with ordinary SQL `percentile_cont` inside Postgres
  * (lantern-style extensions lean on the host executor); the Spark
  * re-expression has to supply the distributed execution itself.
  */
object Percentiles {

  /** Exact interpolated quantiles of `valueCol` (cast to double, nulls
    * dropped) at `probs`, as a ONE-ROW frame with a single
    * `array<double>` column `outCol` (probs order preserved). Empty or
    * all-null input yields an EMPTY frame (callers cross-joining the
    * threshold see zero rows, exactly as a null-threshold filter would
    * produce). */
  def exactQuantiles(df: DataFrame, valueCol: Column, probs: Seq[Double],
      outCol: String, knownRows: Long = -1L): DataFrame =
    quantilesBy(df, Nil, valueCol, probs, outCol, knownRows)

  /** Per-group exact interpolated quantiles: one row per distinct key
    * combination with `keys :+ outCol` (array<double>, probs order).
    * Groups whose values are all null are absent, matching
    * `groupBy(keys).agg(percentile(...))` row-wise. A NULL key value
    * forms its own group, exactly as the builtin's groupBy does (the
    * internal offset joins are null-safe `<=>` equalities).
    *
    * `knownRows`: the caller's exact row count for the value frame,
    * when it has one cheaply (a metadata count of the source scan —
    * [[graft.operators.Clustering.pruneWithCentroids]] passes its
    * corpus count). It replaces the dispatch probe at both extremes:
    * under the row floor the builtin runs directly; past the hard cap
    * the prefix sum runs directly (measured: the probe re-derives the
    * whole scoring lineage — 27 s of the prune row at sf100 — where
    * the caller's count is a row-group metadata read). Null values
    * among the counted rows only ever shrink the frame, so the
    * builtin routing stays safe; a count mostly made of nulls at
    * worst lands on the always-correct prefix sum. */
  def exactQuantilesBy(df: DataFrame, keys: Seq[String], valueCol: Column,
      probs: Seq[Double], outCol: String,
      knownRows: Long = -1L): DataFrame = {
    require(keys.nonEmpty, "use exactQuantiles for the global variant")
    quantilesBy(df, keys, valueCol, probs, outCol, knownRows)
  }

  private def quantilesBy(df: DataFrame, keys0: Seq[String],
      valueCol: Column, probs: Seq[Double], outCol: String,
      knownRows: Long = -1L): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1], got $probs")
    // The global variant rides the grouped code under a constant key,
    // DERIVED from the value column (`v * 0`, never folded: the values
    // are NaN-filtered but Catalyst cannot assume that) — a foldable
    // literal key would be constant-folded OUT of the window partition
    // specs below, turning the bounded slice-totals windows into
    // unpartitioned ones (WindowExec warning + SinglePartition
    // exchange). Also gives uniform empty-input semantics (empty
    // frame, never a null row). nanvl keeps ±Infinity values (which
    // pass the isnan filter but make `v * 0` NaN) in the ONE group —
    // the builtin treats infinities as ordinary ordered values.
    val keys = if (keys0.nonEmpty) keys0 else Seq("__g")
    val keyCols = keys.map(col)
    val vCast = valueCol.cast("double")
    val keySrc: Seq[Column] =
      if (keys0.nonEmpty) keyCols
      else Seq(nanvl(vCast * lit(0.0), lit(0.0)).as("__g"))
    val filtered = df
      .select(keySrc :+ vCast.as("__v"): _*)
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    // Adaptive dispatch. The two arms' costs are measured and
    // different in kind: the builtin's non-codegen ObjectHashAggregate
    // pays a generic-map update per ROW (~25 µs/row at the sf10
    // century), the prefix sum pays per DISTINCT VALUE (histogram +
    // window sorts, ~35 µs/distinct) plus ~1.5 s of fixed multi-stage
    // overhead — so on an all-distinct continuous column the builtin
    // wins until its buffer hits memory (measured: prune@200k-distinct
    // builtin 8 s vs prefix 10 s), while on a narrow integer domain
    // the prefix sum wins as soon as rows outgrow the overhead
    // (measured: gate@sf10 builtin 10.09 s vs prefix 1.43 s over ~300
    // distinct scores). Hence: builtin iff the TOTAL distinct-pair
    // count D fits the memory cap (`maxBuiltinDistinct`, default 1M —
    // the builtin's buffer across all final-agg tasks is exactly the
    // pair domain, ~48 MB at the cap) AND rows R sit inside the
    // overhead-or-ratio regime (R <= `maxBuiltinRows` floor, default
    // 100k, OR R <= floor + 1.5·D — the measured cost crossover).
    // `maxBuiltinDistinct <= 0` forces the prefix sum probe-free (how
    // the specs pin the arm, and the escape hatch for callers whose
    // lineage is too expensive to scan twice).
    val maxBuiltin = graft.GraftConf
      .percentileMaxBuiltinDistinct(df.sparkSession)
    val maxBuiltinRows = graft.GraftConf
      .percentileMaxBuiltinRows(df.sparkSession)
    val probsArr = array(probs.map(lit): _*)
    if (maxBuiltin > 0) {
      val optimized = filtered.queryExecution.optimizedPlan
      val stats = optimized.stats
      // NEGATIVE short-circuit: past floor + 1.5·maxBuiltinDistinct
      // rows, the row condition below fails for EVERY distinct count
      // the memory cap admits — the probe's outcome is a foregone
      // "unbounded", and its cost is a full pass of the input lineage
      // (the expensive part of the dispatch at the 100 TB design
      // point). Skip it when stats already put the input past that
      // cap: rowCount directly, or sizeInBytes at a generous
      // 1 KiB/row (a wrong skip only ever lands on the always-correct
      // spillable prefix sum — the benign direction — so the margin
      // can be loose where the positive check below must be stingy).
      val hardRowCap =
        BigInt(maxBuiltinRows) + BigInt(3) * BigInt(maxBuiltin) / 2
      // sizeInBytes is only meaningful when every leaf reported a real
      // size: a leaf WITHOUT stats (e.g. an RDD-backed LogicalRDD
      // boundary) reports the session's placeholder defaultSizeInBytes
      // (Long.MaxValue by default), which propagates upward and would
      // trip the short-circuit — permanently skipping the probe and the
      // builtin arm exactly where the probe is cheapest (a materialized
      // boundary re-reads without recomputing its lineage). Such plans
      // fall through to the probe instead.
      val placeholderSize =
        BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
      val overByStats =
        (knownRows >= 0 && BigInt(knownRows) > hardRowCap) ||
        stats.rowCount.exists(_ > hardRowCap) ||
        (stats.sizeInBytes > hardRowCap * 1024 &&
          stats.sizeInBytes < placeholderSize)
      // POSITIVE pre-check: when Catalyst's statistics already bound
      // the input under the row floor, the probe job is skipped and
      // the builtin arm costs ONE pass of the lineage. R <= floor
      // bounds D <= R, but "inside the buffer" additionally needs
      // D <= maxBuiltinDistinct — a config raising the row floor past
      // the distinct cap must not route an over-cap all-distinct frame
      // into the unspillable buffer, so the floor used here is clamped
      // to min(maxBuiltinRows, maxBuiltinDistinct). Only an exact
      // rowCount (CBO/AQE) is trusted outright. sizeInBytes is a
      // HINT, honored only for in-memory leaves (LocalRelation
      // estimates >= 8 bytes/row by construction): a file scan's
      // sizeInBytes is the COMPRESSED on-disk size — an
      // RLE/dictionary column can sit far under a byte per row, and
      // the non-CBO visitor passes Filter stats through unchanged —
      // so a many-row low-cardinality parquet frame would be
      // misrouted into the builtin's unspillable buffer, the exact
      // narrow-domain-at-scale case the cost model measures at ~7x
      // slower. Misrouting HERE is the dangerous direction; leaves
      // without real stats (LogicalRDD boundaries report
      // defaultSizeInBytes = huge) fall through to the probe — which
      // is cheap exactly there, because a materialized boundary
      // re-reads without recomputing its lineage.
      val inMemoryLeavesOnly = optimized.collectLeaves().forall { l =>
        val n = l.getClass.getSimpleName
        n == "LocalRelation" || n == "OneRowRelation"
      }
      val rowFloor = math.min(maxBuiltinRows, maxBuiltin)
      val boundedByStats =
        (knownRows >= 0 && knownRows <= rowFloor) ||
        stats.rowCount.exists(_ <= BigInt(rowFloor)) ||
        (inMemoryLeavesOnly &&
          stats.sizeInBytes <= BigInt(rowFloor) * 8)
      lazy val boundedByProbe = {
        // one map-side-combined global aggregate, ONE row collected
        // (audited bounded collect): total rows R, plus the HLL
        // distinct D of (keys, value) pairs — the pair total is both
        // the builtin's whole buffer domain (memory axis) and the
        // prefix sum's histogram size (time axis)
        val r = filtered
          .agg(count(lit(1)).as("__rows"),
            approx_count_distinct(struct(keyCols :+ col("__v"): _*))
              .as("__d"))
          .collect()(0)
        val (rows, distinct) = (r.getLong(0), r.getLong(1))
        distinct <= maxBuiltin &&
          rows <= maxBuiltinRows + (3L * distinct) / 2
      }
      if (boundedByStats || (!overByStats && boundedByProbe)) {
        val out = filtered
          .groupBy(keyCols: _*)
          .agg(percentile(col("__v"), probsArr).as(outCol))
        return if (keys0.nonEmpty) out else out.drop("__g")
      }
    }
    val hist = filtered
      .groupBy(keyCols :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    // Distributed prefix sum over the distinct-value frame — the
    // textbook shape, in pure Catalyst: slice each key's value range,
    // take LOCAL cumulative counts inside each (key, slice), and add
    // the exclusive offset of every earlier slice of the same key,
    // computed by windows over the per-slice totals (≤ |keys| × nP
    // rows — the one frame this operator assumes is small). NO stage
    // funnels the corpus-scale distinct frame through one reducer.
    //
    // Slices come from approx-quantile BOUNDARIES of the distinct
    // values (slice id = #boundaries strictly below v), NOT from
    // spark_partition_id over a repartitionByRange: the boundaries
    // only balance the slices — the exact ranks never depend on them —
    // and keeping every derived frame DETERMINISTIC lets Spark's
    // ReuseExchange collapse the histogram shuffle to ONE computation
    // under all four consumers (bounds, cumsum window, slice totals,
    // per-key totals). A nondeterministic slice id defeats canonical
    // plan equality and every consumer replays the whole input
    // lineage — a corpus scan + scoring chain in the quality gate.
    val nP = math.max(2, df.sparkSession.sessionState.conf.numShufflePartitions)
    val bounds = hist.groupBy(keyCols: _*)
      .agg(percentile_approx(col("__v"),
        array((1 until nP).map(i => lit(i.toDouble / nP)): _*),
        lit(1000)).as("__bnd"))
    val sliced = joinNullSafe(hist, broadcast(bounds), keys)
      .withColumn("__pid", aggregate(col("__bnd"), lit(0),
        (acc, b) => acc + when(col("__v") > b, 1).otherwise(0)))
      .drop("__bnd")
    val wLoc = Window.partitionBy(keyCols :+ col("__pid"): _*)
      .orderBy(col("__v"))
    val local = sliced.withColumn("__lc", sum(col("__c")).over(wLoc))
    // exclusive slice offsets + per-key totals from TWO windows over
    // the tiny slice-totals frame (≤ |keys| × nP rows; both windows
    // share one (keys)-partitioned exchange) — cheaper by several
    // stages than a broadcast self-join + separate per-key aggregate
    val totals = sliced.groupBy(keyCols :+ col("__pid"): _*)
      .agg(sum(col("__c")).as("__pt"))
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy(keyCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = totals
      .withColumn("__off", coalesce(sum(col("__pt")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__pt")).over(wKey))
      .drop("__pt")
    // 0-based rank interval [__lo, __hi) covered by each distinct value
    val ranked = joinNullSafe(local, broadcast(offs), keys :+ "__pid")
      .withColumn("__hi", col("__off") + col("__lc"))
      .withColumn("__lo", col("__hi") - col("__c"))
    // Each prob j wants order statistics at floor(r) and ceil(r),
    // r = p * (n-1); a distinct value covers rank q iff lo <= q < hi.
    // The covering rows are the same row or adjacent ones, so one
    // filtered explode + a tiny re-aggregate recovers both.
    val contrib = ranked
      .select(keyCols ++ Seq(col("__v"), col("__lo"), col("__hi"),
        col("__n"), posexplode(probsArr).as(Seq("__j", "__p"))): _*)
      .withColumn("__r", col("__p") * (col("__n") - 1))
      .withColumn("__isLo",
        floor(col("__r")) >= col("__lo") && floor(col("__r")) < col("__hi"))
      .withColumn("__isHi",
        ceil(col("__r")) >= col("__lo") && ceil(col("__r")) < col("__hi"))
      .filter(col("__isLo") || col("__isHi"))
    val perProb = contrib
      .groupBy(keyCols :+ col("__j"): _*)
      .agg(first(col("__r")).as("__r"),
        max(when(col("__isLo"), col("__v"))).as("__lov"),
        max(when(col("__isHi"), col("__v"))).as("__upv"))
      // the Hive/Spark `percentile` interpolation, BOTH branches: the
      // builtin also returns lowerKey directly when the floor/ceil
      // order statistics are the SAME value (a tie spanning the
      // fractional position) — computing (c-r)*v + (r-f)*v there can
      // drift from v by 1 ulp, and keepTopFraction's strict >
      // threshold would flip the kept set on tie-heavy data
      .withColumn("__q", when(ceil(col("__r")) === floor(col("__r"))
          || col("__lov") === col("__upv"), col("__lov"))
        .otherwise((ceil(col("__r")) - col("__r")) * col("__lov")
          + (col("__r") - floor(col("__r"))) * col("__upv")))
    val out = perProb
      .groupBy(keyCols: _*)
      // collect_list here folds at most |probs| rows per key — the only
      // object aggregate in the plan, bounded by the caller's constant
      .agg(transform(
        array_sort(collect_list(struct(col("__j"), col("__q")))),
        x => x("__q")).as(outCol))
    if (keys0.nonEmpty) out else out.drop("__g")
  }

  /** Inner join on `on` with NULL-SAFE key equality (`<=>`), keeping
    * the left side's key columns — the `join(df, usingColumns)` shape
    * a null-key group needs (plain equality silently drops it, where
    * the builtin's groupBy emits one). The right side's keys are
    * renamed before the condition so the self-derived frames here
    * (bounds/offs both descend from the histogram) resolve without
    * ambiguity. */
  private def joinNullSafe(left: DataFrame, right: DataFrame,
      on: Seq[String]): DataFrame = {
    val renamed = on.foldLeft(right)((d, k) =>
      d.withColumnRenamed(k, s"__r_$k"))
    val cond = on.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    left.join(renamed, cond).drop(on.map(k => s"__r_$k"): _*)
  }
}
