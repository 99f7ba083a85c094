package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Corpus-scale BPE merge-learning probe: runs
  * [[graft.text.Bpe.trainDistributed]] at a realistic merge budget over
  * a real corpus and reports the per-round cost curve (the scale
  * question for 32k-50k production vocabularies: each round is one
  * combiner-aggregated pair-count job, inherently sequential in rank
  * like every public BPE trainer — throughput is rounds/sec, and the
  * curve shows whether rounds stay flat as the vocabulary grows).
  * Usage: BpeTrainProbe [corpusDir=/root/testdata/sf0.1] [budget=2000]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budget = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    var lastT = t0
    var lastN = 0
    val merges = graft.text.Bpe.trainDistributed(docs, col("text"), budget,
      progress = n =>
        if (n % 250 == 0) {
          val now = System.nanoTime()
          val seg = (now - lastT) / 1e9
          println(f"  rounds ${lastN + 1}%5d..$n%5d: $seg%6.1fs " +
            f"(${(n - lastN) / seg}%.1f rounds/s)")
          lastT = now
          lastN = n
        })
    val totalS = (System.nanoTime() - t0) / 1e9
    println(f"trainDistributed: ${merges.length} merges over $nDocs docs " +
      f"in $totalS%.1fs (${merges.length / totalS}%.2f rounds/s, " +
      "checkpoint every 16 rounds)")
    // round-trip the artifact for good measure
    val out = java.nio.file.Files.createTempDirectory("bpe_probe").toString
    graft.text.Bpe.save(spark, merges, s"$out/merges")
    val tok = graft.text.Bpe.load(spark, s"$out/merges")
    require(tok.merges == merges, "save/load round-trip diverged")
    println(s"merge table saved+reloaded OK ($out/merges)")
    spark.stop()
  }
}
