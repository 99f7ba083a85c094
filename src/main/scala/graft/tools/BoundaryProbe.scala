package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recorded resume-from-boundary run for the parquet-boundary pipeline
  * ([[graft.operators.PipelineBoundaries]]):
  *
  * `runMain graft.tools.BoundaryProbe [sfDir] [cpus] [deleteStage]`
  *
  * Run 1 builds every boundary into a fresh artifact root (cold), run
  * 2 must serve every boundary from disk, run 3 deletes `deleteStage`
  * (default ndk) and must recompute ONLY it and its chained suffix,
  * and the final check pins the parquet-boundary selection bit-equal
  * to the per-JVM checkpoint runner's. One JSON line per run with the
  * computed-stage set and wall seconds — the at-scale evidence that
  * the staleness chain resumes instead of recomputing the funnel. */
object BoundaryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val deleteStage = args.lift(2).getOrElse("ndk")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("graft_boundary_probe").toString
    def run(label: String): (Seq[org.apache.spark.sql.Row], Set[String]) = {
      val t0 = System.nanoTime()
      val (stages, reports) = graft.queries.TextQueries
        .pipelineBoundariesRun(spark, dir, root = Some(root))
      val rows = stages.last._2
        .orderBy(col("source").asc, col("mix_rank").asc).collect().toSeq
      val computed = reports().filter(_.computed).map(_.stage)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"boundary","run":"$label","sf_dir":"$dir","secs":$secs%.2f,"selected":${rows.size},"computed":[${computed.map(s => s""""$s"""").mkString(",")}]}""")
      (rows, computed.toSet)
    }

    val (rows1, c1) = run("cold")
    val (rows2, c2) = run("warm")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$root/$deleteStage"))
    val (rows3, c3) = run(s"resume-after-delete-$deleteStage")

    // parity vs the checkpoint runner (same stage graph, per-JVM
    // materialization): the two policies must agree row-for-row
    val ck = graft.queries.TextQueries.pipelineStages(spark, dir)
      .last._2.orderBy(col("source").asc, col("mix_rank").asc)
      .collect().toSeq
    val allStages = Set("c4", "gok", "cls", "exd", "sh", "ndk")
    val suffixOk = c3.contains(deleteStage) && !c3.exists(s =>
      allStages.contains(s) && s < "zzz" &&
        (Seq("c4", "gok", "cls", "exd", "sh", "ndk")
          .indexOf(s) < Seq("c4", "gok", "cls", "exd", "sh", "ndk")
          .indexOf(deleteStage)))
    val ok = c1 == allStages && c2.isEmpty && suffixOk &&
      rows2 == rows1 && rows3 == rows1 && ck == rows1
    println(s"""{"probe":"boundary","verdict":{"cold_all_computed":${c1 == allStages},"warm_all_served":${c2.isEmpty},"resume_suffix_only":$suffixOk,"parity_checkpoint_runner":${ck == rows1},"ok":$ok}}""")
    rm(new java.io.File(root))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
