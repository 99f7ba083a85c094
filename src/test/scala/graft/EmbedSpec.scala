package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.embed._

/** Embedding/LLM pipeline: mock determinism, batch executor, job
  * registry lifecycle, streaming incremental mode, wire formats. */
class EmbedSpec extends SparkSpec {

  import spark.implicits._

  test("mock embeddings are deterministic and 1/64-quantized") {
    val rt = Runtimes.mock(8)
    val a = rt.embedBatch("mock-embed", Seq("hello", "world"))
    val b = rt.embedBatch("mock-embed", Seq("hello", "world"))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    a.flatten.foreach { x =>
      assert(x >= -1.0f && x < 1.0f)
      assert((x * 64).toInt.toFloat == x * 64, s"$x is not a multiple of 1/64")
    }
  }

  test("embedColumn batches through mapPartitions and keeps all columns") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "t")
    val out = Embeddings.embedColumn(df, "t", "vec", Runtimes.mock(4),
      "mock-embed", batchSize = 2)
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(_.getSeq[Float](2).length == 4))
    // same text -> same vector regardless of batch boundaries
    val again = Embeddings.embedColumn(df, "t", "vec", Runtimes.mock(4),
      "mock-embed", batchSize = 1).orderBy("id").collect()
    assert(rows.map(_.getSeq[Float](2)).toSeq ==
      again.map(_.getSeq[Float](2)).toSeq)
  }

  test("completeColumn produces the deterministic mock completion") {
    val df = Seq((1L, "what is spark?")).toDF("id", "prompt")
    val out = Embeddings.completeColumn(df, "prompt", "answer",
      Runtimes.mock(), "mock-complete").collect()(0).getString(2)
    assert(out == "MOCK[mock-complete]: what is spark?")
  }

  test("job registry lifecycle: add -> run -> completed; failure recorded") {
    val work = Files.createTempDirectory("jobs").toString
    val srcPath = s"$work/src"
    Seq((1L, "one"), (2L, "two")).toDF("id", "t")
      .write.parquet(srcPath)
    val reg = new JobRegistry(spark, s"$work/registry")
    val ok = reg.addEmbeddingJob(srcPath, "t", "vec", s"$work/dst", "mock",
      "mock-embed")
    val bad = reg.addEmbeddingJob(srcPath, "t", "vec", s"$work/dst2", "ort",
      "BAAI/bge-small-en")
    assert(reg.getJobStatus(ok).contains(JobRegistry.Status.Enabled))
    val ran = reg.runPending()
    assert(ran.toSet == Set(ok, bad))
    assert(reg.getJobStatus(ok).contains(JobRegistry.Status.Completed))
    assert(reg.getJobStatus(bad).contains(JobRegistry.Status.Failed))
    assert(reg.getJobFailures(bad).exists(_.contains("onnxruntime")))
    assert(spark.read.parquet(s"$work/dst").count() == 2)
    // cancel / resume flips status
    reg.cancelJob(ok)
    assert(reg.getJobStatus(ok).contains(JobRegistry.Status.Canceled))
    reg.resumeJob(ok)
    assert(reg.getJobStatus(ok).contains(JobRegistry.Status.Enabled))
  }

  test("completion job type: batch run writes the completed column") {
    val work = Files.createTempDirectory("jobs_completion").toString
    Seq((1L, "what is spark?"), (2L, "what is scala?")).toDF("id", "prompt")
      .write.parquet(s"$work/src")
    val reg = new JobRegistry(spark, s"$work/registry")
    val id = reg.addCompletionJob(s"$work/src", "prompt", "answer",
      s"$work/dst", "mock", "mock-complete", systemPrompt = "Be brief.")
    // the job row carries its type + prompt through the registry
    val row = reg.getJobs.filter(col("job_id") === id).collect()(0)
    assert(row.getAs[String]("job_type") == JobRegistry.JobType.Completion)
    assert(row.getAs[String]("system_prompt") == "Be brief.")
    assert(reg.runPending() == Seq(id))
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Completed))
    val out = spark.read.parquet(s"$work/dst").orderBy("id").collect()
    assert(out.map(_.getAs[String]("answer")).toSeq == Seq(
      "MOCK[mock-complete]: what is spark?",
      "MOCK[mock-complete]: what is scala?"))
  }

  test("autotune job type: batch run builds the winning index + artifact") {
    val work = Files.createTempDirectory("jobs_autotune").toString
    spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select("vec_id", "embedding")
      .write.parquet(s"$work/src")
    val reg = new JobRegistry(spark, s"$work/registry")
    val id = reg.addAutotuneJob(s"$work/src", "vec_id", "embedding",
      s"$work/index", metric = "l2sq", k = 5, targetRecall = 0.6,
      sampleSize = 100)
    // autotune jobs are batch-only, like the reference daemon's
    intercept[IllegalArgumentException] {
      reg.runStreaming(id, s"$work/ckpt")
    }
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Enabled))
    reg.runPending()
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Completed),
      reg.getJobFailures(id).toString)
    val man = graft.ann.AnnIndex.readManifest(s"$work/index")
    assert(man.count == spark.read.parquet(s"$work/src").count())
    // the measured grid is exported for recall-target ef derivation
    assert(graft.ann.Autotune.efForTarget(spark, s"$work/index", 0.6).nonEmpty)
    // a bad metric fails at enqueue, not at run
    intercept[IllegalArgumentException] {
      reg.addAutotuneJob(s"$work/src", "vec_id", "embedding",
        s"$work/index2", metric = "nope")
    }
  }

  test("an unknown job type fails the job instead of running as an embed") {
    val work = Files.createTempDirectory("jobs_unknown").toString
    Seq((1L, "one")).toDF("id", "t").write.parquet(s"$work/src")
    // a registry row from a "newer version" with a job type this
    // version does not know
    Seq((1L, s"$work/src", "t", "vec", s"$work/dst", "mock", "mock-embed",
        JobRegistry.Status.Enabled, "", 0L, "mystery", "", ""))
      .toDF("job_id", "src_path", "text_col", "out_col", "dst_path",
        "runtime", "model", "status", "error", "created_at",
        "job_type", "system_prompt", "params")
      .repartition(1).write.parquet(s"$work/registry")
    val reg = new JobRegistry(spark, s"$work/registry")
    reg.runPending()
    assert(reg.getJobStatus(1L).contains(JobRegistry.Status.Failed))
    assert(reg.getJobFailures(1L).exists(_.contains("unknown job type")))
    // and nothing was written to the destination
    assert(!new java.io.File(s"$work/dst").exists())
  }

  test("pre-job-type registries read back as embedding jobs") {
    val work = Files.createTempDirectory("jobs_compat").toString
    Seq((1L, "one")).toDF("id", "t").write.parquet(s"$work/src")
    // write a registry in the old 10-column schema directly
    Seq((1L, s"$work/src", "t", "vec", s"$work/dst", "mock", "mock-embed",
        JobRegistry.Status.Enabled, "", 0L))
      .toDF("job_id", "src_path", "text_col", "out_col", "dst_path",
        "runtime", "model", "status", "error", "created_at")
      .repartition(1).write.parquet(s"$work/registry")
    val reg = new JobRegistry(spark, s"$work/registry")
    val row = reg.getJobs.collect()(0)
    assert(row.getAs[String]("job_type") == JobRegistry.JobType.Embedding)
    assert(reg.runPending() == Seq(1L))
    assert(reg.getJobStatus(1L).contains(JobRegistry.Status.Completed))
    assert(spark.read.parquet(s"$work/dst").count() == 1)
  }

  test("streamComplete drains a completion backlog through a checkpoint") {
    val work = Files.createTempDirectory("stream_complete").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "prompt")
      .write.parquet(s"$work/src")
    val schema = spark.read.parquet(s"$work/src").schema
    Embeddings.streamComplete(spark, s"$work/src", s"$work/dst",
        s"$work/ckpt", schema, "prompt", "answer", Runtimes.mock(),
        "mock-complete")
      .awaitTermination()
    val out = spark.read.parquet(s"$work/dst").orderBy("id").collect()
    assert(out.map(_.getAs[String]("answer")).toSeq == Seq(
      "MOCK[mock-complete]: alpha", "MOCK[mock-complete]: beta"))
  }

  test("registry survives a writer crash in every rename window") {
    val work = Files.createTempDirectory("jobs_crash").toString
    val path = s"$work/registry"
    val reg = new JobRegistry(spark, path)
    val id = reg.addEmbeddingJob(s"$work/src", "t", "vec", s"$work/dst",
      "mock", "mock-embed")
    // crash window A: new state fully written to .tmp but never
    // committed — the live registry must be untouched and the debris
    // must not leak into reads
    val fs = new java.io.File(path)
    val tmpDir = new java.io.File(path + ".tmp")
    org.apache.commons.io.FileUtils.copyDirectory(fs, tmpDir)
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Enabled))
    // crash window B: previous state renamed aside, replacement never
    // landed — a reader must restore the aside copy (last committed
    // state) instead of seeing an empty registry
    val asideDir = new java.io.File(path + ".old")
    assert(fs.renameTo(asideDir))
    assert(!fs.exists())
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Enabled),
      "aside-state recovery failed: the registry vanished")
    assert(fs.exists() && !asideDir.exists())
    // and the next update commits cleanly over the recovered state
    reg.cancelJob(id)
    assert(reg.getJobStatus(id).contains(JobRegistry.Status.Canceled))
    assert(!tmpDir.exists() || tmpDir.listFiles() != null) // tmp is transient
  }

  test("streamEmbed processes a backfill then new rows incrementally") {
    val work = Files.createTempDirectory("stream").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    Seq((1L, "first"), (2L, "second")).toDF("id", "t")
      .write.parquet(s"$work/src")
    def runOnce(): Unit = {
      val q = Embeddings.streamEmbed(spark, s"$work/src", s"$work/dst",
        s"$work/ckpt", schema, "t", "vec", Runtimes.mock(4), "mock-embed")
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(s"$work/dst").count() == 2)
    // append new rows; only they are processed on the next run
    Seq((3L, "third")).toDF("id", "t")
      .write.mode("append").parquet(s"$work/src")
    runOnce()
    val out = spark.read.parquet(s"$work/dst")
    assert(out.count() == 3)
    assert(out.filter(col("vec").isNotNull).count() == 3)
  }

  test("openai/cohere wire request bodies are well-formed") {
    val oa = new OpenAiRuntime(apiToken = "k", dimensions = 3)
    assert(oa.embedRequestBody("text-embedding-3-small", Seq("a \"b\"")) ==
      """{"model":"text-embedding-3-small","input":["a \"b\""],"dimensions":3}""")
    assert(oa.completionRequestBody("gpt-4o", "sys", "hi") ==
      """{"model":"gpt-4o","messages":[{"role":"system","content":"sys"},{"role":"user","content":"hi"}]}""")
    val co = new CohereRuntime(apiToken = "k")
    assert(co.embedRequestBody("embed-english-v3.0", Seq("x")) ==
      """{"model":"embed-english-v3.0","texts":["x"],"input_type":"search_document"}""")
  }

  test("openai deployment detection and auth headers match the reference") {
    import OpenAiRuntime.Deployment
    val azureUrl = "https://myres.openai.azure.com/openai/deployments/" +
      "my-deploy/embeddings?api-version=2023-05-15"

    // OpenAI API: Bearer api_token, /embeddings appended
    val oa = new OpenAiRuntime(apiToken = "sk-1")
    assert(oa.deployment == Deployment.OpenAi)
    assert(oa.authHeader == ("Authorization", "Bearer sk-1"))
    assert(oa.embedUrl == "https://api.openai.com/v1/embeddings")

    // custom OpenAI-compatible endpoint: same auth, own base
    val custom = new OpenAiRuntime("https://llm.example.com/v1", apiToken = "t")
    assert(custom.deployment == Deployment.Custom)
    assert(custom.authHeader == ("Authorization", "Bearer t"))
    assert(custom.embedUrl == "https://llm.example.com/v1/embeddings")

    // Azure + API key: `api-key` header (reference openai_runtime.rs:233),
    // deployment URL used as-is (it already pins the embeddings path)
    val azKey = new OpenAiRuntime(azureUrl, apiToken = "azkey")
    assert(azKey.deployment == Deployment.Azure)
    assert(azKey.authHeader == ("api-key", "azkey"))
    assert(azKey.embedUrl == azureUrl)

    // Azure + Entra token: Bearer (reference openai_runtime.rs:236-238);
    // an api_token, when both are given, wins like the reference's
    // `if let Some(key)` order
    val azEntra = new OpenAiRuntime(azureUrl, azureEntraToken = "ent")
    assert(azEntra.authHeader == ("Authorization", "Bearer ent"))
    val azBoth = new OpenAiRuntime(azureUrl, apiToken = "k",
      azureEntraToken = "ent")
    assert(azBoth.authHeader == ("api-key", "k"))

    // missing credentials fail with the reference's requirements
    val azNone = intercept[IllegalArgumentException] {
      new OpenAiRuntime(azureUrl).authHeader
    }
    assert(azNone.getMessage.contains("azure_entra_token"))
    intercept[IllegalArgumentException] { new OpenAiRuntime().authHeader }

    // a near-miss URL (wrong api-version) is NOT an Azure deployment —
    // the reference regex pins the exact version string
    val nearMiss = new OpenAiRuntime("https://myres.openai.azure.com/openai/" +
      "deployments/my-deploy/embeddings?api-version=2024-01-01", apiToken = "k")
    assert(nearMiss.deployment == Deployment.Custom)
  }

  test("wire response parsing handles both array shapes and escapes") {
    // OpenAI shape: one "embedding" array per data object
    val openai = """{"data":[{"embedding":[0.1,0.2]},{"embedding":[0.3,0.4]}]}"""
    val a = Json.extractFloatArrays(openai, "embedding")
    assert(a.map(_.toSeq) == Seq(Seq(0.1f, 0.2f), Seq(0.3f, 0.4f)))
    // Cohere shape: nested "embeddings":[[..],[..]]
    val cohere = """{"embeddings":[[1.0,2.0,3.0],[4.0,5.0,6.0]],"meta":{}}"""
    val b = Json.extractFloatArrays(cohere, "embeddings")
    assert(b.map(_.toSeq) == Seq(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)))
    // escape handling: literal backslash-n must survive unescaping
    val s = Json.extractString("""{"content":"C:\\new\nline \"q\""}""", "content")
    assert(s.contains("C:\\new\nline \"q\""))
  }

  test("runtime/model registry matches the reference surface") {
    assert(Runtimes.availableRuntimes == Seq("mock", "openai", "cohere", "ort"))
    assert(Runtimes.availableModels("ort").size == 13)
    intercept[IllegalArgumentException](Runtimes.forName("nope"))
  }

  test("ort activation: probe false -> instructions; probe true -> delegated inference") {
    // this build has no onnxruntime: the real probe must say so, and
    // embedBatch must fail with the activation instructions
    assert(!OrtRuntime.onnxPresent)
    val inactive = intercept[UnsupportedOperationException] {
      new OrtRuntime().embedBatch("BAAI/bge-small-en", Seq("x"))
    }
    assert(inactive.getMessage.contains("graft.ort.impl"))

    // probe forced true + an impl named by the system property: the
    // SAME embedBatch delegates — activation is configuration, not a
    // code change
    val prev = System.getProperty("graft.ort.impl")
    try {
      System.setProperty("graft.ort.impl",
        "graft.FakeOrtInference")
      val active = new OrtRuntime(probe = () => true)
      val out = active.embedBatch("BAAI/bge-small-en", Seq("a", "bb"))
      assert(out.map(_.toSeq) == Seq(Seq(1f, 1f), Seq(2f, 2f)))
    } finally {
      if (prev == null) System.clearProperty("graft.ort.impl")
      else System.setProperty("graft.ort.impl", prev)
    }

    // probe true but no impl named: the error says exactly what to set
    // (save/restore again — an externally set property must survive
    // the suite)
    val prev2 = System.getProperty("graft.ort.impl")
    try {
      System.clearProperty("graft.ort.impl")
      val noImpl = intercept[IllegalArgumentException] {
        new OrtRuntime(probe = () => true).embedBatch("m", Seq("x"))
      }
      assert(noImpl.getMessage.contains("graft.ort.impl"))
    } finally {
      if (prev2 != null) System.setProperty("graft.ort.impl", prev2)
    }
  }

  test("measureSpeed reports positive throughput") {
    val v = Embeddings.measureSpeed(Runtimes.mock(8), "mock-embed",
      (1 to 100).map(i => s"text $i"))
    assert(v > 0)
  }
}

/** Test double for the ort activation path: length-coded vectors. */
class FakeOrtInference extends graft.embed.OrtInference {
  override def embed(model: String, texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => Array.fill(2)(t.length.toFloat))
}
