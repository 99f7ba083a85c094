package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scale-ratio regression gate: bench the whole contract at TWO scale
  * factors in one JVM, join per-query, and assert every query's
  * growth stays inside its family's bound — the decade/century
  * discipline (per-query small→large ratios, worst-ratio hunting) as
  * one reusable entry point instead of a hand-derived spreadsheet.
  *
  * `runMain graft.tools.ScaleGate <smallDir> <largeDir>
  *   [dataRatio=10] [slack=3.0] [floorSec=10]`
  *
  * Verdict rule (see [[ScaleGate.verdict]]): a query passes iff its
  * large-side seconds ≤ max(small-side seconds × dataRatio × slack,
  * floorSec). The multiplicative bound catches superlinear blowups
  * (a quadratic operator at 10× data runs ~100× — far outside
  * 10 × 3); the absolute floor keeps overhead-dominated sub-second
  * queries (job launch, codegen, fixed-k probes) from tripping the
  * gate on noise. Prints ONE JSON line with per-query ratios, the
  * worst offenders, and an overall pass — exit nonzero on any
  * failure or errored query.
  *
  * Timing discipline (ADVICE r13): one UNTIMED warm-up sweep over the
  * small dir runs first, so the timed small pass measures steady state
  * instead of absorbing all JIT/codegen/first-touch warm-up (a cold
  * small side systematically loosens every small×ratio×slack bound);
  * and [[graft.SharedState]] is cleared between the two timed passes,
  * so the small side's resident caches and eager checkpoints never
  * inflate the large side's GC (or OOM the gate itself on scale pairs
  * bigger than the sf0.1→sf1 default). */
object ScaleGate {

  final case class Row(name: String, small: Double, large: Double,
      ratio: Double, bound: Double, ok: Boolean)

  /** The pure comparator: per-query verdicts from two timing maps.
    * Queries missing on either side are failures (a query that
    * errored at one scale must not vanish from the gate). */
  def verdict(small: Map[String, Double], large: Map[String, Double],
      dataRatio: Double, slack: Double, floorSec: Double): Seq[Row] = {
    require(dataRatio > 0 && slack > 0 && floorSec >= 0,
      "dataRatio and slack must be positive, floorSec non-negative")
    (small.keySet ++ large.keySet).toSeq.sorted.map { name =>
      (small.get(name), large.get(name)) match {
        case (Some(s), Some(l)) =>
          val bound = math.max(s * dataRatio * slack, floorSec)
          Row(name, s, l, if (s > 0) l / s else Double.PositiveInfinity,
            bound, l <= bound)
        case (s, l) =>
          Row(name, s.getOrElse(-1.0), l.getOrElse(-1.0),
            Double.PositiveInfinity, 0.0, ok = false)
      }
    }
  }

  private def runAll(spark: SparkSession, dir: String): Map[String, Double] = {
    SparkEntry.prepare(spark, dir) // builds outside the timed region
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, dir).count(); Some(name -> (System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[scalegate] $name FAILED at $dir: ${e.getMessage}")
        None // missing on one side = gate failure via verdict()
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val smallDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val largeDir = args.lift(1).getOrElse("target/sf1")
    val dataRatio = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val slack = args.lift(3).map(_.toDouble).getOrElse(3.0)
    val floorSec = args.lift(4).map(_.toDouble).getOrElse(10.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    runAll(spark, smallDir) // untimed warm-up: JIT/codegen/first-touch
    // COLD-SYMMETRIC timed passes (ADVICE r14): both sides first drop
    // the per-JVM caches AND the memoized one-shot state (completed
    // door runs, per-process boundary artifact roots) — otherwise the
    // stateful rows (pipeline_stream / pipeline_boundaries / absorb)
    // measure a cached small side against a cold large side and the
    // ratios are noise. Each runAll's prepare() then pays the cold
    // builds OUTSIDE the timed per-query region, at both scales alike.
    def reset(): Unit = {
      graft.SharedState.clear()
      graft.queries.TextQueries.resetEphemeralState()
    }
    reset()
    val small = runAll(spark, smallDir)
    reset()
    val large = runAll(spark, largeDir)
    val rows = verdict(small, large, dataRatio, slack, floorSec)
    val bad = rows.filterNot(_.ok)
    val worst = rows.filter(_.ok).sortBy(-_.ratio).take(5)
    // explicit-locale formatting: the f interpolator uses the JVM
    // default locale, whose decimal comma would emit invalid JSON
    def fmt(p: String, v: Double): String =
      if (java.lang.Double.isFinite(v))
        String.format(java.util.Locale.ROOT, p, Double.box(v))
      else "-1" // a failed side's Infinity ratio would be invalid JSON
    def j(rs: Seq[Row]): String = rs.map(r =>
      s""""${r.name}":{"small":${fmt("%.3f", r.small)},"large":${fmt("%.3f", r.large)},"ratio":${fmt("%.2f", r.ratio)},"bound":${fmt("%.2f", r.bound)},"ok":${r.ok}}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_gate","small":"$smallDir","large":"$largeDir","data_ratio":$dataRatio,"slack":$slack,"floor_sec":$floorSec,"n":${rows.size},"failures":${bad.size},"queries":${j(rows)},"worst_ok":${j(worst)}}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
