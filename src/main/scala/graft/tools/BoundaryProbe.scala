package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recorded resume-from-boundary run for the parquet-boundary pipeline
  * ([[graft.operators.PipelineBoundaries]]):
  *
  * `runMain graft.tools.BoundaryProbe [sfDir] [cpus] [deleteStage] [root]`
  *
  * Run 1 builds every boundary into the artifact root (cold), run 2
  * must serve every boundary from disk, run 3 deletes `deleteStage`
  * (default exd — a MIDDLE stage, so the cascade property is
  * exercised: the prefix must stay served AND the suffix must all
  * recompute) and asserts the recomputed set is EXACTLY
  * {deleteStage..selected}; the final check pins the parquet-boundary
  * selection bit-equal to the per-JVM checkpoint runner's. Pass an
  * explicit `root` to exercise cross-JVM resume (two invocations of
  * this probe against the same root: the second's cold run serves
  * everything). One JSON line per run with the computed-stage set and
  * wall seconds — the at-scale evidence that the staleness chain
  * resumes instead of recomputing the funnel. */
object BoundaryProbe {
  private val allStages =
    Seq("c4", "gok", "cls", "exd", "sh", "ndk", "selected")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val deleteStage = args.lift(2).getOrElse("exd")
    require(allStages.contains(deleteStage),
      s"deleteStage must be one of $allStages")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = args.lift(3).getOrElse(java.nio.file.Files
      .createTempDirectory("graft_boundary_probe").toString)
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
    // the cascade must recompute EXACTLY the deleted stage and its
    // chained suffix — a prefix recompute means the staleness chain
    // over-invalidates, a missing suffix stage means a stale boundary
    // was served after its upstream moved
    val expectedSuffix = allStages.dropWhile(_ != deleteStage).toSet
    val suffixOk = c3 == expectedSuffix
    // with an explicit reused root, run 1 is a cross-JVM RESTART: the
    // correct outcome is zero recomputes, not an all-stage build
    val coldOk =
      if (args.lift(3).nonEmpty && c1.isEmpty) true
      else c1 == allStages.toSet
    val ok = coldOk && c2.isEmpty && suffixOk &&
      rows2 == rows1 && rows3 == rows1 && ck == rows1
    println(s"""{"probe":"boundary","verdict":{"cold_ok":$coldOk,"cold_restart_served":${c1.isEmpty},"warm_all_served":${c2.isEmpty},"resume_exact_suffix":$suffixOk,"parity_checkpoint_runner":${ck == rows1},"ok":$ok}}""")
    if (args.lift(3).isEmpty) rm(new java.io.File(root))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
