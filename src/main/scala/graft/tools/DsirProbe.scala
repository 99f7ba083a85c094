package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale probe for [[graft.text.Dsir]]: synthesizes a raw pool
  * with a planted in-domain minority (docs drawing from the target's
  * vocabulary slice) inside an out-of-domain majority, trains the
  * hashed importance model, scores + selects, and reports
  *
  *  - wall time of the train pass (two slice aggregates to one dense
  *    4096-row table) and the score+select pass (narrow explode →
  *    broadcast weight join → integer agg → TakeOrdered);
  *  - selection precision: the fraction of the selected top-n that is
  *    planted in-domain (the statistic DSIR exists to maximize — a
  *    hash-bucket model that had collapsed would score ~ the plant
  *    rate, i.e. ~1/32 here);
  *  - partitioning-independence of the selected id set (integer
  *    scores + deterministic tiebreak: the same set at any layout).
  *
  * Args: `DsirProbe [n] [threads]` (defaults 2000000 32).
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 24-token docs. In-domain text draws from a 500-token vocabulary
    // (base 0); out-of-domain from a disjoint 20000-token one. The
    // target slice is n/20 in-domain docs; the raw pool plants 1-in-32
    // in-domain docs in an out-of-domain majority.
    def text(base: org.apache.spark.sql.Column, vocab: Int) =
      concat_ws(" ", transform(sequence(lit(0), lit(23)),
        j => concat(lit("w"), pmod(col("id") * 31 + j * 7 + base, lit(vocab)))))
    val target = spark.range(n / 20).select(col("id"),
      text(lit(0), 500).as("text")).cache()
    val planted = col("id") % 32 === 0
    val raw = spark.range(n).select(col("id"),
      when(planted, text(lit(0), 500))
        .otherwise(concat(lit("x"), text(lit(500), 20000))).as("text"),
      planted.as("in_domain")).cache()
    val nPlanted = raw.filter(col("in_domain")).count()
    target.count()
    println(f"corpus: n=$n%,d raw (planted in-domain $nPlanted%,d), " +
      f"target=${n / 20}%,d")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (w, tTrain) = timed {
      val t = graft.text.Dsir.importanceWeights(target, raw,
        col("text"), col("text")).cache()
      t.count(); t
    }
    println(f"train:  $tTrain%.2f s (dense ${w.count()}%,d-bucket table)")

    val sel = n / 64 // half the planted mass
    def select() = graft.text.Dsir.resampleTopN(
      graft.text.Dsir.score(raw, col("id"), col("text"), w), sel)
    select().count() // warm codegen
    val (ids, tScore) = timed(
      select().collect().map(_.getLong(0)).toSet)
    val hits = raw.filter(col("in_domain"))
      .filter(col("id").isInCollection(ids)).count()
    println(f"score+select: $tScore%.2f s for top $sel%,d of $n%,d; " +
      f"precision ${hits.toDouble / sel}%.4f (collapse would be ~${1 / 32.0}%.4f)")

    val ids2 = graft.text.Dsir.resampleTopN(
      graft.text.Dsir.score(raw.repartition(threads * 3), col("id"),
        col("text"), w), sel).collect().map(_.getLong(0)).toSet
    assert(ids == ids2, "selection must be partitioning-independent")
    println("partitioning-independence: OK (identical selected set)")
    require(hits.toDouble / sel > 0.9,
      "planted in-domain docs must dominate the selection")
    spark.stop()
  }
}
