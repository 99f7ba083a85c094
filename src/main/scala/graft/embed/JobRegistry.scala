package graft.embed

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding job registry (reference daemon job API:
  * `add_embedding_job` / `get_embedding_job_status` / `get_embedding_jobs`
  * / `cancel_embedding_job` / `resume_embedding_job`,
  * lantern_extras/src/daemon.rs:121-399, jobs table
  * `_lantern_extras_internal.embedding_generation_jobs`).
  *
  * Spark shape: the registry is a parquet-backed table of job rows; the
  * daemon loop is [[runPending]], which executes each enabled job as a
  * batch [[Embeddings.embedColumn]] write. Incremental daemon mode maps
  * to [[Embeddings.streamEmbed]] keyed off the same job row.
  *
  * Durability: registry updates commit by write-temp + fs-rename — the
  * new state is written COMPLETELY to a sidecar dir, the previous
  * registry is renamed aside, and the sidecar renamed into place, so a
  * crashed writer can never leave a truncated registry: every crash
  * window leaves either the old state, the new state, or the old state
  * recoverable from its aside-name (readers restore it on next access;
  * the uncommitted update is simply lost, which is what uncommitted
  * means). Concurrency matches the reference's ONE-bgworker daemon
  * model: methods serialize in-JVM; two daemon processes sharing a
  * registry path are out of contract (last-writer-wins on the rename).
  */
class JobRegistry(spark: SparkSession, registryPath: String) {
  import JobRegistry._

  private def hadoopFs =
    new org.apache.hadoop.fs.Path(registryPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
  private def dst = new org.apache.hadoop.fs.Path(registryPath)
  private def aside = new org.apache.hadoop.fs.Path(registryPath + ".old")
  private def tmp = new org.apache.hadoop.fs.Path(registryPath + ".tmp")

  /** A writer that crashed between renaming the registry aside and
    * committing the replacement leaves no live registry; restore the
    * aside copy (the last committed state). */
  private def recoverIfNeeded(): Unit = {
    val fs = hadoopFs
    if (!fs.exists(dst) && fs.exists(aside)) fs.rename(aside, dst)
  }

  private def readAll(): Seq[Job] = synchronized {
    recoverIfNeeded()
    val fs = hadoopFs
    if (!fs.exists(dst)) Seq.empty
    else {
      import spark.implicits._
      spark.read.parquet(registryPath).as[Job].collect().toSeq
    }
  }

  private def writeAll(jobs: Seq[Job]): Unit = synchronized {
    import spark.implicits._
    val fs = hadoopFs
    // 1. complete new state lands in the fixed tmp dir (Overwrite also
    //    clears debris from a writer that crashed mid-write)
    spark.createDataset(jobs).toDF()
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // 2. commit by renames: previous state aside, new state in place.
    //    Hadoop rename reports failure by RETURNING FALSE, not
    //    throwing — an unchecked failed rename here would either nest
    //    tmp inside the still-present dst or let the final delete
    //    destroy the only committed copy.
    if (fs.exists(aside)) fs.delete(aside, true)
    if (fs.exists(dst) && !fs.rename(dst, aside))
      throw new java.io.IOException(
        s"registry commit: failed to rename $dst aside")
    if (!fs.rename(tmp, dst)) {
      // restore the committed state before failing loudly
      if (fs.exists(aside)) fs.rename(aside, dst)
      throw new java.io.IOException(
        s"registry commit: failed to move $tmp into place")
    }
    fs.delete(aside, true)
  }

  def addEmbeddingJob(srcPath: String, textCol: String, outCol: String,
      dstPath: String, runtime: String, model: String): Long = {
    val jobs = readAll()
    val id = if (jobs.isEmpty) 1L else jobs.map(_.job_id).max + 1
    writeAll(jobs :+ Job(id, srcPath, textCol, outCol, dstPath, runtime,
      model, Status.Enabled, "", System.currentTimeMillis()))
    id
  }

  def getJobs: DataFrame = {
    import spark.implicits._
    spark.createDataset(readAll()).toDF()
  }

  def getJobStatus(jobId: Long): Option[String] =
    readAll().find(_.job_id == jobId).map(_.status)

  def getJobFailures(jobId: Long): Option[String] =
    readAll().find(_.job_id == jobId).map(_.error).filter(_.nonEmpty)

  def cancelJob(jobId: Long): Unit = setStatus(jobId, Status.Canceled)

  def resumeJob(jobId: Long): Unit = setStatus(jobId, Status.Enabled)

  private def setStatus(jobId: Long, status: String, error: String = ""): Unit =
    writeAll(readAll().map(j =>
      if (j.job_id == jobId) j.copy(status = status, error = error) else j))

  /** Incremental daemon mode for one job (reference
    * daemon/embedding_jobs.rs:1147-1260: catch-up scan then follow):
    * Structured Streaming over the job's source through
    * [[Embeddings.streamEmbed]]. The default AvailableNow trigger
    * drains the backlog and stops — the daemon's catch-up sweep; the
    * checkpoint pins batch ids so a restart never re-embeds rows.
    * Marks the job completed on a clean drain, failed otherwise. */
  def runStreaming(jobId: Long, checkpoint: String,
      batchSize: Int = 64): Unit = {
    val job = readAll().find(_.job_id == jobId).getOrElse(
      throw new NoSuchElementException(s"no embedding job $jobId"))
    require(job.status == Status.Enabled,
      s"job $jobId is ${job.status}, not ${Status.Enabled}")
    try {
      val schema = spark.read.parquet(job.src_path).schema
      val q = Embeddings.streamEmbed(spark, job.src_path, job.dst_path,
        checkpoint, schema, job.text_col, job.out_col,
        Runtimes.forName(job.runtime), job.model, batchSize)
      q.awaitTermination()
      setStatus(jobId, Status.Completed)
    } catch {
      case e: Throwable =>
        setStatus(jobId, Status.Failed,
          Option(e.getMessage).getOrElse(e.getClass.getName))
        throw e
    }
  }

  /** One daemon sweep: run every enabled job to completion (batch).
    * Returns the ids that ran. */
  def runPending(batchSize: Int = 64): Seq[Long] = {
    val pending = readAll().filter(_.status == Status.Enabled)
    pending.map { job =>
      try {
        val src = spark.read.parquet(job.src_path)
        val out = Embeddings.embedColumn(src, job.text_col, job.out_col,
          Runtimes.forName(job.runtime), job.model, batchSize)
        out.write.mode(SaveMode.Overwrite).parquet(job.dst_path)
        setStatus(job.job_id, Status.Completed)
      } catch {
        case e: Throwable =>
          setStatus(job.job_id, Status.Failed,
            Option(e.getMessage).getOrElse(e.getClass.getName))
      }
      job.job_id
    }
  }
}

object JobRegistry {
  case class Job(job_id: Long, src_path: String, text_col: String,
      out_col: String, dst_path: String, runtime: String, model: String,
      status: String, error: String, created_at: Long)

  object Status {
    val Enabled = "enabled"
    val Completed = "completed"
    val Failed = "failed"
    val Canceled = "canceled"
  }
}
