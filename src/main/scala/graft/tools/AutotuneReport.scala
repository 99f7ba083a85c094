package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ann.{Autotune, Metric}

/** Prints both autotune grids (HNSW: recall@10 / build / search per
  * (m, ef_construction, ef); IVF: recall@10 / measured scan fraction
  * per (nCells, nprobe)) over a scale factor's embeddings — measured
  * evidence for the recall/cost trade-off documented in SURVEY.md.
  * Args: [sfDir=/root/testdata/sf0.1] [sampleSize=5000] [numQueries=10]. */
object AutotuneReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sampleSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val numQueries = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val work = java.nio.file.Files.createTempDirectory("tune").toString
    val report = Autotune.run(emb, "vec_id", "embedding", work,
      metric = Metric.L2Sq, k = 10, targetRecall = 0.99,
      sampleSize = sampleSize, numQueries = numQueries)
    println("HNSW grid:")
    println("| m | ef_construction | ef | recall@10 | build ms | search ms |")
    println("|---|---|---|---|---|---|")
    report.results.foreach { r =>
      println(f"| ${r.variant.m} | ${r.variant.efConstruction} | ${r.variant.ef} | ${r.recall}%.3f | ${r.buildMillis} | ${r.searchMillis} |")
    }
    println(s"best: ${report.best}")
    val ivf = Autotune.runIvf(emb, "vec_id", "embedding", s"$work/ivf",
      metric = Metric.L2Sq, k = 10, targetRecall = 0.9,
      sampleSize = sampleSize, numQueries = numQueries)
    println("IVF grid:")
    println("| nCells | nprobe | recall@10 | scan frac | build ms | search ms |")
    println("|---|---|---|---|---|---|")
    ivf.results.foreach { r =>
      println(f"| ${r.variant.nCells} | ${r.variant.nprobe} | ${r.recall}%.3f | ${r.scanFraction}%.4f | ${r.buildMillis} | ${r.searchMillis} |")
    }
    println(s"ivf best: ${ivf.best}")
    spark.stop()
  }
}
