package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.VectorQueries

/** Times hyperplane-LSH candidate generation across band geometries on a
  * real corpus dir — the feedback loop for the band-width contract.
  * Args: [sfDir] [runs=3]. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    println(s"rows=${emb.count()}")
    for ((bands, bits) <- Seq((2, 8), (4, 16), (2, 16), (4, 8))) {
      for (r <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = Dedup.hyperplanePairs(emb, col("vec_id"), col("embedding"),
          VectorQueries.hyperplanes, bands = bands, bitsPerBand = bits).count()
        println(f"bands=$bands bits=$bits run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n cand pairs)")
      }
    }
    spark.stop()
  }
}
