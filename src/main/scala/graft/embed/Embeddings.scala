package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Batch and streaming embedding/completion pipelines (reference: CLI
  * `create-embeddings`, lantern_cli/src/embeddings/mod.rs:616-750 —
  * producer reads batches, worker embeds, exporter writes back; and the
  * daemon's incremental LISTEN/NOTIFY mode,
  * daemon/embedding_jobs.rs:1147-1260).
  *
  * Spark shape: the producer/worker/exporter pipeline IS
  * `mapPartitions(batched embed) + write` — partitions stream through
  * executors, each runtime call sees `batchSize` texts, and no shuffle
  * happens at any scale. The daemon's incremental mode is Structured
  * Streaming over the source with the same transform.
  */
object Embeddings {

  /** Add an embedding column by batched runtime calls. */
  def embedColumn(df: DataFrame, textCol: String, outCol: String,
      runtime: EmbeddingRuntime, model: String,
      batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = runtime.embedBatch(model,
          batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(vecs).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Add a completion column (reference `llm_completion`,
    * embeddings.rs:129-152). */
  def completeColumn(df: DataFrame, promptCol: String, outCol: String,
      runtime: EmbeddingRuntime, model: String,
      systemPrompt: String = ""): DataFrame = {
    val schema = df.schema.add(outCol, StringType, nullable = true)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = runtime.complete(model, systemPrompt,
          Option(r.getString(idx)).getOrElse(""))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }

  /** Incremental embedding of newly arriving rows: Structured Streaming
    * over a file source with the same batched transform;
    * Trigger.AvailableNow = backfill then stop (the daemon's catch-up
    * scan), a continuous trigger = the LISTEN/NOTIFY mode. */
  def streamEmbed(spark: SparkSession, srcPath: String, dstPath: String,
      checkpointPath: String, schema: StructType, textCol: String,
      outCol: String, runtime: EmbeddingRuntime, model: String,
      batchSize: Int = 64): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val withVec = embedColumn(src, textCol, outCol, runtime, model, batchSize)
    withVec.writeStream
      .format("parquet")
      .option("path", dstPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Incremental completion of newly arriving rows — the streaming
    * sibling of [[streamEmbed]] for completion-type daemon jobs
    * (reference add_completion_job, lantern_extras/src/daemon.rs:175-233):
    * same file source / checkpoint / AvailableNow discipline, with
    * [[completeColumn]] as the transform. */
  def streamComplete(spark: SparkSession, srcPath: String, dstPath: String,
      checkpointPath: String, schema: StructType, promptCol: String,
      outCol: String, runtime: EmbeddingRuntime, model: String,
      systemPrompt: String = ""): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val withOut = completeColumn(src, promptCol, outCol, runtime, model,
      systemPrompt)
    withOut.writeStream
      .format("parquet")
      .option("path", dstPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Throughput measurement (reference MeasureModelSpeed,
    * lantern_cli embeddings/measure_speed.rs): embeddings per second
    * over the given texts. */
  def measureSpeed(runtime: EmbeddingRuntime, model: String,
      texts: Seq[String], batchSize: Int = 64): Double = {
    val t0 = System.nanoTime()
    texts.grouped(batchSize).foreach(b => runtime.embedBatch(model, b))
    val secs = (System.nanoTime() - t0) / 1e9
    if (secs == 0) Double.PositiveInfinity else texts.length / secs
  }
}
