package graft.embed

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Daemon job registry for the reference's three job types:
  * embedding jobs (`add_embedding_job` / `get_embedding_job_status` /
  * `get_embedding_jobs` / `cancel_embedding_job` /
  * `resume_embedding_job`, lantern_extras/src/daemon.rs:121-399, jobs
  * table `_lantern_extras_internal.embedding_generation_jobs`),
  * completion jobs (`add_completion_job` with system_prompt + model,
  * daemon.rs:175-399 — same lifecycle, LLM completion instead of an
  * embedding), and index-autotune jobs
  * (lantern_cli/src/daemon/autotune_jobs.rs — a grid run that builds
  * the winning index).
  *
  * Spark shape: the registry is a parquet-backed table of job rows; the
  * daemon loop is [[runPending]], which executes each enabled job as a
  * batch write ([[Embeddings.embedColumn]] / [[Embeddings.completeColumn]])
  * or an [[graft.ann.Autotune.runAndCreate]] grid. Incremental daemon
  * mode maps to [[Embeddings.streamEmbed]] / [[Embeddings.streamComplete]]
  * keyed off the same job row (autotune is batch-only, as in the
  * reference — its daemon listener picks jobs up and runs the grid to
  * completion).
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
      // registries written before the completion/autotune job types
      // lack the newer columns — fill defaults so an old registry
      // keeps reading (every pre-existing row IS an embedding job)
      var df = spark.read.parquet(registryPath)
      val defaults = Seq(
        "job_type" -> lit(JobType.Embedding),
        "system_prompt" -> lit(""), "params" -> lit(""))
      defaults.foreach { case (c, d) =>
        if (!df.columns.contains(c)) df = df.withColumn(c, d)
      }
      df.as[Job].collect().toSeq
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

  private def addJob(j: Long => Job): Long = synchronized {
    val jobs = readAll()
    val id = if (jobs.isEmpty) 1L else jobs.map(_.job_id).max + 1
    writeAll(jobs :+ j(id))
    id
  }

  def addEmbeddingJob(srcPath: String, textCol: String, outCol: String,
      dstPath: String, runtime: String, model: String): Long =
    addJob(id => Job(id, srcPath, textCol, outCol, dstPath, runtime,
      model, Status.Enabled, "", System.currentTimeMillis(),
      JobType.Embedding, "", ""))

  /** Completion job (reference `add_completion_job`,
    * lantern_extras/src/daemon.rs:175-233: src/dst column, an optional
    * system prompt, the model — same registry lifecycle as embedding
    * jobs). */
  def addCompletionJob(srcPath: String, promptCol: String, outCol: String,
      dstPath: String, runtime: String, model: String,
      systemPrompt: String = ""): Long =
    addJob(id => Job(id, srcPath, promptCol, outCol, dstPath, runtime,
      model, Status.Enabled, "", System.currentTimeMillis(),
      JobType.Completion, systemPrompt, ""))

  /** Index-autotune job (reference daemon autotune jobs,
    * lantern_cli/src/daemon/autotune_jobs.rs: table + column + metric +
    * target recall + k + sample size; `create_index` always on — the
    * job's purpose is the built index). `dstPath` receives the winning
    * index; the grid's throwaway variants go to `<dstPath>_work`.
    *
    * `sampleSize` caveat (the reference defaults to 10k and so does
    * this): grid recalls are measured on SAMPLE-sized indexes, and a
    * fixed ef's recall decays as the index grows — for the exported
    * artifact to carry a recall guarantee about the SERVED index, set
    * `sampleSize` to the serving corpus size (or a representative
    * shard of it), the way the contract's tuned index does. */
  def addAutotuneJob(srcPath: String, idCol: String, vecCol: String,
      dstPath: String, metric: String = "l2sq", k: Int = 10,
      targetRecall: Double = 0.99, sampleSize: Int = 10000): Long = {
    graft.ann.Metric.fromName(metric) // validate at enqueue, not at run
    addJob(id => Job(id, srcPath, vecCol, idCol, dstPath, "", "",
      Status.Enabled, "", System.currentTimeMillis(), JobType.Autotune,
      "", s"metric=$metric;k=$k;target_recall=$targetRecall;" +
        s"sample_size=$sampleSize"))
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
    * [[Embeddings.streamEmbed]] / [[Embeddings.streamComplete]]. The
    * default AvailableNow trigger drains the backlog and stops — the
    * daemon's catch-up sweep; the checkpoint pins batch ids so a
    * restart never re-embeds rows. Marks the job completed on a clean
    * drain, failed otherwise. Autotune jobs are batch-only (as in the
    * reference) — use [[runPending]]. */
  def runStreaming(jobId: Long, checkpoint: String,
      batchSize: Int = 64): Unit = {
    val job = readAll().find(_.job_id == jobId).getOrElse(
      throw new NoSuchElementException(s"no job $jobId"))
    require(job.status == Status.Enabled,
      s"job $jobId is ${job.status}, not ${Status.Enabled}")
    require(job.job_type != JobType.Autotune,
      s"job $jobId is an autotune job — batch-only, use runPending")
    try {
      val schema = spark.read.parquet(job.src_path).schema
      val q = job.job_type match {
        case JobType.Completion =>
          Embeddings.streamComplete(spark, job.src_path, job.dst_path,
            checkpoint, schema, job.text_col, job.out_col,
            Runtimes.forName(job.runtime), job.model, job.system_prompt)
        case JobType.Embedding =>
          Embeddings.streamEmbed(spark, job.src_path, job.dst_path,
            checkpoint, schema, job.text_col, job.out_col,
            Runtimes.forName(job.runtime), job.model, batchSize)
        case other =>
          throw new IllegalArgumentException(s"unknown job type '$other'")
      }
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
        runOne(job, batchSize)
        setStatus(job.job_id, Status.Completed)
      } catch {
        case e: Throwable =>
          setStatus(job.job_id, Status.Failed,
            Option(e.getMessage).getOrElse(e.getClass.getName))
      }
      job.job_id
    }
  }

  private def runOne(job: Job, batchSize: Int): Unit = job.job_type match {
    case JobType.Completion =>
      val src = spark.read.parquet(job.src_path)
      Embeddings.completeColumn(src, job.text_col, job.out_col,
          Runtimes.forName(job.runtime), job.model, job.system_prompt)
        .write.mode(SaveMode.Overwrite).parquet(job.dst_path)
    case JobType.Autotune =>
      val p = job.params.split(";").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val src = spark.read.parquet(job.src_path)
      // numShards = 4 matches the grid's own per-variant builds, so
      // the winning full build shares the grid geometry (shard count
      // changes graph composition; a mismatched final build would
      // weaken what the exported recalls say about it)
      val (report, manifest) = graft.ann.Autotune.runAndCreate(
        src, job.out_col, job.text_col, s"${job.dst_path}_work",
        job.dst_path,
        metric = graft.ann.Metric.fromName(p.getOrElse("metric", "l2sq")),
        k = p.getOrElse("k", "10").toInt,
        targetRecall = p.getOrElse("target_recall", "0.99").toDouble,
        sampleSize = p.getOrElse("sample_size", "10000").toInt,
        numShards = 4)
      if (manifest.isEmpty) throw new IllegalStateException(
        "no autotune variant met the recall target: " +
          report.results.map(r =>
            s"m=${r.variant.m}/efc=${r.variant.efConstruction}/" +
              s"ef=${r.variant.ef}→${r.recall}").mkString(", "))
    case JobType.Embedding =>
      val src = spark.read.parquet(job.src_path)
      Embeddings.embedColumn(src, job.text_col, job.out_col,
          Runtimes.forName(job.runtime), job.model, batchSize)
        .write.mode(SaveMode.Overwrite).parquet(job.dst_path)
    case other =>
      // a registry row from a newer version (or a corrupted one) must
      // fail loudly, not silently run as an embedding job and mark
      // itself Completed over the wrong output
      throw new IllegalArgumentException(s"unknown job type '$other'")
  }
}

object JobRegistry {
  /** One registry row. Columns are job-type-overloaded the way the
    * reference's jobs tables are: for completion jobs `text_col` is
    * the prompt column; for autotune jobs `text_col` is the VECTOR
    * column, `out_col` the id column, `dst_path` the index output,
    * and `params` the `k=v;`-encoded grid knobs. */
  case class Job(job_id: Long, src_path: String, text_col: String,
      out_col: String, dst_path: String, runtime: String, model: String,
      status: String, error: String, created_at: Long,
      job_type: String, system_prompt: String, params: String)

  object JobType {
    val Embedding = "embedding"
    val Completion = "completion"
    val Autotune = "autotune"
  }

  object Status {
    val Enabled = "enabled"
    val Completed = "completed"
    val Failed = "failed"
    val Canceled = "canceled"
  }
}
