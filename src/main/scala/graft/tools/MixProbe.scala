package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-scale probe for [[graft.text.TextOps.mixToBudget]]: measures
  * the blocked two-phase rank against the naive per-source window
  * shape it replaced (row_number over Window.partitionBy(source) —
  * every row of a source through ONE reducer's sort), and asserts the
  * two select the IDENTICAL kept set (the block key is a prefix of
  * the sort key, so the rewrite is bit-equivalent by construction).
  *
  * Args are bare positional integers:
  * `MixProbe [n] [sources] [threads]` (defaults 1000000 5 32).
  */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // n docs over k sources, ~60% of the corpus budgeted back out —
    // large enough that the kept side cannot hide the sort cost
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % k).cast("string")).as("source"))
      .cache()
    docs.count()
    val budgets = (0 until k)
      .map(i => s"src$i" -> (n.toLong * 6 / (10 * k))).toMap

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm both paths once (codegen + scan cache), then measure
    val blocked = graft.text.TextOps.mixToBudget(
      docs, col("doc_id"), col("source"), budgets)
    blocked.count()
    val (nb, tBlocked) = timed(blocked.count())

    // the pre-rewrite shape, inline for comparison
    val rankKey = md5(concat(col("doc_id").cast("string"), lit(":graft"))
      .cast("binary"))
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(col("source") === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(rankKey.asc, col("doc_id").asc)
    val naive = docs.withColumn("mix_rank", row_number().over(w).cast("long"))
      .filter(col("mix_rank") <= budgetCol)
    naive.count()
    val (nn, tNaive) = timed(naive.count())

    println(f"mixToBudget decade: n=$n%,d docs, $k sources, " +
      f"budget=${budgets.values.sum}%,d kept")
    println(f"blocked two-phase rank: $tBlocked%.2fs ($nb%,d rows)")
    println(f"naive per-source window: $tNaive%.2fs ($nn%,d rows)")

    // bit-equivalence of the kept (doc_id, mix_rank) sets
    val diff = blocked.select(col("doc_id"), col("mix_rank"))
      .exceptAll(naive.select(col("doc_id"), col("mix_rank"))).count() +
      naive.select(col("doc_id"), col("mix_rank"))
        .exceptAll(blocked.select(col("doc_id"), col("mix_rank"))).count()
    println(s"kept-set symmetric difference: $diff (must be 0)")
    require(diff == 0, "blocked rank diverged from the reference shape")

    // budget-growth monotonicity at the decade (the property mixture
    // ablations depend on): growing every budget 20% only ADDS members
    // in rank order — the smaller kept set is a strict subset
    val grown = graft.text.TextOps.mixToBudget(
      docs, col("doc_id"), col("source"),
      budgets.map { case (s, b) => s -> b * 12 / 10 })
    val escaped = blocked.select(col("doc_id"), col("mix_rank"))
      .exceptAll(grown.select(col("doc_id"), col("mix_rank"))).count()
    println(s"members lost under 1.2x budget growth: $escaped (must be 0)")
    require(escaped == 0, "budget growth must be rank-monotone")
    spark.stop()
  }
}
