package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-boundary runner for the composed curation pipeline — the
  * CLUSTER-literal form of [[CurationPipeline]]'s materialization
  * policy: each stage boundary is written as a parquet artifact under
  * one root directory and re-read by every downstream consumer, so a
  * pipeline whose stages run as SEPARATE jobs (the production shape
  * the per-JVM `SharedState` checkpoints only approximate) resumes
  * from whatever boundaries are still valid instead of recomputing
  * the funnel from the input scan.
  *
  * Reference context: this is the engine-level analog of the
  * reference daemon's job-table persistence
  * (lantern_extras/src/daemon.rs:121-399 — jobs record their
  * progress durably and a restarted daemon resumes from the stored
  * state rather than re-running finished work).
  *
  * Staleness discipline (the listing-stamp fingerprint the autotune
  * artifact cache already uses, [[graft.ann.Autotune.listingStamp]]):
  * every stage's expected fingerprint CHAINS through the actual
  * on-disk identity of its upstream boundary —
  *
  *   expected(stage_i) = md5(resolvedChain(stage_{i-1}) ++ stage_i)
  *   resolvedChain(stage_i) = expected(stage_i) ++ listingStamp(dir_i)
  *
  * seeded by the caller's input fingerprint (input-data listing stamp
  * + a parameter string). A boundary is served from disk only while
  * its stored marker equals its expected fingerprint; because the
  * chain folds in the LISTING STAMP of each resolved artifact (part
  * file names are fresh per write), a recomputed upstream boundary
  * invalidates everything downstream of it, a deleted boundary
  * recomputes itself and cascades, and a changed input (new files,
  * new lengths, new mtimes) or changed parameters recomputes the
  * whole funnel — while an untouched prefix is NEVER recomputed.
  *
  * Scale shape: validity checks are driver-side directory listings
  * (milliseconds); a served boundary is a bare parquet scan leaf —
  * zero lineage, zero re-analysis, readable by any number of
  * downstream jobs on any executor. Writes commit atomically: the
  * stage output lands in a hidden `.tmp` sibling (fingerprint marker
  * included) and renames over the final directory, so a crash
  * mid-write leaves either the old valid artifact or a missing one —
  * never a half-written boundary that validates. Single writer per
  * root directory is assumed (one pipeline owner per artifact root —
  * the reference daemon's one-runner-per-job-table discipline).
  */
object PipelineBoundaries {

  /** What happened to one stage this run: `computed` = the thunk ran
    * and the artifact was (re)written; false = served from disk. */
  final case class StageReport(stage: String, path: String,
      computed: Boolean, fingerprint: String)

  /** Input-side fingerprint seed: the listing stamps of every input
    * path (the autotune discipline — names + lengths + mtimes) plus
    * the caller's parameter string (budgets, thresholds, pipeline
    * version), so both data changes and parameter changes invalidate
    * the chain from the root. */
  def seedOf(spark: SparkSession, inputPaths: Seq[String],
      params: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val stamps = inputPaths.map { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      s"$p=${graft.ann.Autotune.listingStamp(fs, path)}"
    }
    (stamps :+ s"params=$params").mkString(";")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** One run's cache hook over `rootDir`, seeded by [[seedOf]]. NOT
    * thread-safe and NOT reusable — build a fresh instance per
    * pipeline invocation (the chain state advances as
    * [[CurationPipeline.stages]] calls the hook in stage order). */
  final class Runner(spark: SparkSession, rootDir: String, seed: String) {
    private val conf = spark.sessionState.newHadoopConf()
    private val root = new Path(rootDir)
    private val fs = root.getFileSystem(conf)
    private var chain: String = md5Hex(seed)
    private val log = ArrayBuffer.empty[StageReport]
    private val Marker = "_graft_fingerprint"

    /** Per-stage resolution reports, in pipeline order. */
    def reports: Seq[StageReport] = log.toSeq

    private def readMarker(dir: Path): Option[String] = {
      val m = new Path(dir, Marker)
      // ANY read failure (missing, truncated, checksum mismatch after
      // an out-of-band edit) means "not valid — recompute", never a
      // crash: the marker is a validity witness, not data
      try {
        if (!fs.exists(m)) None
        else {
          val in = fs.open(m)
          try {
            val buf = new Array[Byte](64)
            val n = in.read(buf)
            Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim)
          } finally in.close()
        }
      } catch { case _: java.io.IOException => None }
    }

    /** The hook to pass as [[CurationPipeline.stages]]' `cache`. */
    def cache(stage: String, f: () => DataFrame): DataFrame = {
      val dir = new Path(root, stage)
      val expected = md5Hex(s"$chain:$stage")
      val success = new Path(dir, "_SUCCESS")
      val valid = fs.exists(dir) && fs.exists(success) &&
        readMarker(dir).contains(expected)
      if (!valid) {
        val tmp = new Path(root, s".${stage}.tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        f().write.mode("overwrite").parquet(tmp.toString)
        val out = fs.create(new Path(tmp, Marker), true)
        try out.write(expected.getBytes("UTF-8")) finally out.close()
        if (fs.exists(dir)) fs.delete(dir, true)
        if (!fs.rename(tmp, dir))
          throw new java.io.IOException(
            s"PipelineBoundaries: could not commit boundary $tmp -> $dir")
      }
      // downstream validity chains through the ARTIFACT's identity:
      // a recompute writes fresh part files, so the stamp — and with
      // it every downstream expected fingerprint — moves
      chain = md5Hex(
        s"$expected:${graft.ann.Autotune.listingStamp(fs, dir)}")
      log += StageReport(stage, dir.toString, !valid, expected)
      spark.read.parquet(dir.toString)
    }
  }
}
