package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recorded restart run for the streaming door's PERSISTED prepared
  * corpus artifacts ([[graft.operators.PipelineBoundaries.Derived]],
  * resolved by `TextQueries.doorArtifacts`):
  *
  * `runMain graft.tools.DoorProbe [sfDir] [cpus] [root]`
  *
  * One invocation = one JVM = one ingest-job (re)start. The probe
  * resolves the batch pipeline's seven boundaries plus the five
  * derived door artifacts (hash table, signatures, hashed shingles,
  * bloom blob, DSIR-weight blob) into `root`, reports exactly which
  * were computed vs served, then curates one ingest drop against the
  * ARTIFACT-served corpus and checks row parity against the per-JVM
  * derived corpus. Invoke it twice with the same root: the first run
  * is the cold build; the second — a fresh JVM — must report ZERO
  * computed artifacts before its first micro-batch, the restart
  * semantics the reference daemon gets from its stored job specs
  * (lantern_extras/src/daemon.rs:149-171). Exit is nonzero on a
  * parity failure. */
object DoorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val root = args.lift(2).getOrElse(java.nio.file.Files
      .createTempDirectory("graft_door_probe").toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val (corpus, reports) =
      graft.queries.TextQueries.doorArtifacts(spark, dir,
        root = Some(root))
    val prepSecs = (System.nanoTime() - t0) / 1e9
    val boundaryStages =
      Set("c4", "gok", "cls", "exd", "sh", "ndk", "selected")
    val computed = reports.filter(_.computed).map(_.stage)
    val (cb, cd) = computed.partition(boundaryStages.contains)

    // one ingest drop against the artifact-served corpus, then the
    // same drop against the per-JVM derived corpus: bit parity
    val arrivals = graft.queries.TextQueries.pipeArrivals(spark, dir)
    def door(c: graft.streaming.IngestPipeline.PreparedCorpus) =
      graft.streaming.IngestPipeline.curateBatch(arrivals,
          col("doc_id"), col("source"), col("text"), c)
        .orderBy(col("doc_id").asc).collect().toSeq
    val t1 = System.nanoTime()
    val served = door(corpus)
    val doorSecs = (System.nanoTime() - t1) / 1e9
    val derived = door(
      graft.queries.TextQueries.pipeStreamCorpusDerived(spark, dir))
    val parity = served == derived

    def arr(s: Seq[String]) = s.map(x => s""""$x"""").mkString("[", ",", "]")
    println(String.format(java.util.Locale.ROOT,
      """{"probe":"door","sf_dir":"%s","root":"%s","prep_secs":%.2f,"door_secs":%.2f,"survivors":%d,"computed_boundaries":%s,"computed_door":%s,"restart_zero_recompute":%b,"parity_artifact_vs_derived":%b}""",
      dir, root, Double.box(prepSecs), Double.box(doorSecs),
      Int.box(served.size), arr(cb), arr(cd),
      Boolean.box(computed.isEmpty), Boolean.box(parity)))
    spark.stop()
    if (!parity) sys.exit(1)
  }
}
