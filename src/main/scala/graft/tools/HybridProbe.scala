package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{AnnIndex, IvfIndex, Metric}
import graft.operators.Hybrid

/** Batched hybrid-retrieval throughput probe — the at-scale serving
  * shape ([[Hybrid.rrfPerQuery]] fusing the batch outputs of
  * [[IvfIndex.topKJoin]] and [[AnnIndex.topKJoin]]) measured with a
  * REAL query batch, plus the plan invariants that make it scale:
  * no single-partition stage anywhere, and every rank window
  * partitioned by the query id (fusion parallelism grows with the
  * query count, not the corpus).
  *
  * Args: [sfDir] [nQueries=10000] [runs=3]. Honors SPARK_GRAFT_CPUS
  * (default 8). Prints per-run wall clocks and ONE summary JSON line.
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(10000)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpusN = emb.count()
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    println(s"corpus=$corpusN dim=$dim queries=$nQ")

    val work = java.nio.file.Files
      .createTempDirectory("graft_hybrid_probe").toString
    var t0 = System.nanoTime()
    IvfIndex.build(emb, "vec_id", "embedding", s"$work/ivf",
      IvfIndex.Params(nCells = 64, metric = Metric.L2Sq))
    println(f"ivf build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    AnnIndex.build(emb.repartition(8), "vec_id", "embedding",
      s"$work/hnsw", AnnIndex.Params(metric = Metric.Cos, numShards = 8))
    println(f"hnsw build: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // deterministic query batch, generated IN-PLAN (spark.range — no
    // driver-side materialization, queries partition across the
    // cluster like any production batch): the contract rows' 1/16
    // grid, phase-shifted per query id
    def queries(n: Int): DataFrame = spark.range(n)
      .select(col("id").as("qid"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => ((i * 37 + col("id") * 11) % 19 - 9).cast("double") / 16.0)
          .cast("array<float>").as("qv")) // 1/16 grid: exact in float

    def fused(n: Int): DataFrame = {
      val q = queries(n)
      val ivf = IvfIndex.topKJoin(q, "qid", "qv", s"$work/ivf", 20,
          nprobe = 4, queryBound = Some(n.toLong))
        .select(col("query_id"), col("id"), col("dist").as("dl"))
      val ann = AnnIndex.topKJoin(q, "qid", "qv", s"$work/hnsw", 20,
          ef = 64)
        .select(col("query_id"), col("id"), col("dist").as("dc"))
      Hybrid.rrfPerQuery("query_id", "id", Seq(
        Hybrid.Ranked(ivf, Seq(col("dl").asc, col("id").asc)),
        Hybrid.Ranked(ann, Seq(col("dc").asc, col("id").asc))), 10)
    }

    // plan invariants (the golden-spec discipline, asserted at probe
    // scale): nothing funnels through one partition, and every window
    // partitions on the query key
    val plan = fused(nQ).queryExecution.executedPlan.toString
    require(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage in the batched fusion plan:\n$plan")
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    require(winSpecs.nonEmpty && winSpecs.forall(s =>
      s.contains("query_id") || s.contains("qid")),
      s"a fusion window is not partitioned by the query key: $winSpecs")
    println(s"plan ok: ${winSpecs.length} query-partitioned windows, " +
      "no single-partition stage")

    // warm the shard caches once so runs measure the steady state
    fused(nQ).count()
    val times = (1 to runs).map { r =>
      val t = System.nanoTime()
      val rows = fused(nQ).count()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"run $r: $sec%.2f s ($rows fused rows)")
      sec
    }
    // parallelism ∝ query count: quarter batch must not cost a
    // quarter-batch's fixed overhead times four — report the ratio
    val tQuarter = {
      val t = System.nanoTime()
      fused(nQ / 4).count()
      (System.nanoTime() - t) / 1e9
    }
    val best = times.min
    // Locale.ROOT formatting (the ScaleGate discipline — a comma
    // decimal separator breaks the JSON line)
    def d3(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.3f", Double.box(x))
    println(s"""{"probe":"hybrid_batch","corpus":$corpusN,"n_queries":$nQ,"best_sec":${d3(best)},"qps":${(nQ / best).toLong},"quarter_batch_sec":${d3(tQuarter)},"windows":${winSpecs.length}}""")
    spark.stop()
  }
}
