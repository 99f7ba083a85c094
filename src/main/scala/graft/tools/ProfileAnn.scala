package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ann.{AnnIndex, Metric}

/** Ad-hoc profiling main: isolates ANN build vs search time. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count() // session warmup
    val q = Array.tabulate(64)(i => ((i * 37) % 19 - 9) / 16.0f)
    (1 to 2).foreach { round =>
      val dir = java.nio.file.Files.createTempDirectory("prof").toString
      val t0 = System.nanoTime()
      AnnIndex.build(emb, "vec_id", "embedding", dir,
        AnnIndex.Params(Metric.L2Sq, numShards = 4))
      val t1 = System.nanoTime()
      AnnIndex.topK(spark, dir, q, 10, 64).count()
      val t2 = System.nanoTime()
      AnnIndex.topK(spark, dir, q, 10, 64).count()
      val t3 = System.nanoTime()
      println(f"round $round: build ${(t1-t0)/1e9}%.2fs coldSearch ${(t2-t1)/1e9}%.2fs warmSearch ${(t3-t2)/1e9}%.2fs")
    }
    spark.stop()
  }
}
