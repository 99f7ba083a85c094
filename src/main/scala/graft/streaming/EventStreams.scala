package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming operators over the events stream (the engine's
  * streaming surface: watermarked windowed aggregation and custom
  * keyed state — the Spark-native expression of the reference daemon's
  * incremental processing model, daemon/embedding_jobs.rs:1147-1260,
  * generalized to analytics).
  *
  * Batch/stream parity: [[windowedCounts]] produces the same logical
  * plan shape for a batch DataFrame and a streaming one — callers run
  * identical code in backfill and incremental modes.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Works on batch or
    * streaming inputs; on streams the watermark bounds state. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Gap-based sessionization through Spark's native `session_window`:
    * per-user sessions close after `gap` of inactivity; each session
    * reports its span and aggregates. Works on batch or streaming
    * inputs — on streams the watermark bounds session state and
    * sessions emit once closed (append mode), the classic
    * sessionization deployment. Scale shape: one shuffle on
    * (user, merged-window), which IS the minimum for gap sessions;
    * nothing driver-side, nothing quadratic. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** Per-user running session state via mapGroupsWithState: event count
    * and cumulative value per user (custom keyed state — the
    * KeyValueGroupedDataset path). */
  case class UserState(events: Long, totalValue: Double)
  case class UserSummary(user_id: Long, n_events: Long, total_value: Double)

  def userSessions(spark: SparkSession, events: DataFrame): Dataset[UserSummary] = {
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserSummary](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserState]) =>
          val prior = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prior.events
          var tot = prior.totalValue
          rows.foreach { case (_, v) => n += 1; tot += v }
          state.update(UserState(n, tot))
          UserSummary(userId, n, tot)
      }
  }

  /** Dedup-at-the-door for an ingest stream: drop rows whose key
    * columns were already seen, with the dedup state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark` — a
    * duplicate arriving within the horizon is dropped; state for keys
    * older than the watermark is evicted, so the operator runs forever
    * on unbounded input). Batch inputs dedup globally through the same
    * call, preserving the backfill/incremental parity convention. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Run [[dedupStream]] over a parquet directory into an append-mode
    * in-memory sink, Trigger.AvailableNow. */
  def streamDedupToMemory(spark: SparkSession, srcPath: String,
      schema: StructType, keyCols: Seq[String],
      sinkName: String): StreamingQuery =
    dedupStream(spark.readStream.schema(schema).parquet(srcPath), keyCols)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run the windowed aggregation as a stream over a parquet directory
    * into a named in-memory sink (complete mode), Trigger.AvailableNow. */
  def streamWindowedToMemory(spark: SparkSession, srcPath: String,
      schema: StructType, sinkName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcPath)
    windowedCounts(src).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming sessionization to a memory sink: append mode (a session
    * emits once the watermark passes its end — the production
    * deployment shape), one file per micro-batch so the watermark
    * actually advances across a static corpus. Emitted sessions are
    * FINAL: any event that could still merge into a session lies
    * below the watermark that closed it, so every emitted row must
    * equal its batch counterpart exactly (StreamingSpec pins it). */
  def streamSessionsToMemory(spark: SparkSession, srcPath: String,
      schema: StructType, sinkName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcPath)
    sessionWindows(src).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
