package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming surface: stream/batch parity of the windowed
  * aggregation; mapGroupsWithState keyed state. */
class StreamingSpec extends SparkSpec {

  private lazy val events =
    Tables.load(spark, sf("sf0.001"), "events")

  test("streaming windowed counts equal the batch computation") {
    val work = Files.createTempDirectory("events").toString
    events.write.parquet(s"$work/src")
    val q = EventStreams.streamWindowedToMemory(spark, s"$work/src",
      events.schema, "win_sink")
    q.awaitTermination()
    val streamed = spark.table("win_sink")
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("tv"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val batch = EventStreams.windowedCounts(events)
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("tv"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming dedup drops within-watermark duplicates; parity with batch") {
    val work = Files.createTempDirectory("eventsdd").toString
    // duplicate the corpus: every (user_id, event_type, value) appears
    // at least twice across files (same micro-batch horizon)
    events.write.parquet(s"$work/src")
    events.write.mode("append").parquet(s"$work/src")
    val keys = Seq("user_id", "event_type", "value")
    val q = EventStreams.streamDedupToMemory(spark, s"$work/src",
      events.schema, keys, "dd_sink")
    q.awaitTermination()
    val streamed = spark.table("dd_sink")
    val batch = EventStreams.dedupStream(events, keys) // batch path
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.select(keys.map(col): _*).distinct().count()
      == streamed.count())
  }

  test("session windows: every closed streaming session equals its batch row") {
    val work = Files.createTempDirectory("eventssw").toString
    val Array(minTs, maxTs) = events
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = minTs + (maxTs - minTs) / 2
    // two files in time order -> two micro-batches, so the watermark
    // computed from batch 1 closes its sessions during batch 2
    events.filter(unix_micros(col("ts")) < mid)
      .coalesce(1).write.parquet(s"$work/src")
    events.filter(unix_micros(col("ts")) >= mid)
      .coalesce(1).write.mode("append").parquet(s"$work/src")
    val q = EventStreams.streamSessionsToMemory(spark, s"$work/src",
      events.schema, "sw_sink")
    q.awaitTermination()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"),
        round(col("total_value"), 6))
      .collect().map(_.toSeq).toSet
    val streamed = norm(spark.table("sw_sink"))
    val batch = norm(EventStreams.sessionWindows(events))
    assert(streamed.size > 10, s"watermark never closed sessions: ${streamed.size}")
    assert(streamed.subsetOf(batch),
      s"${(streamed -- batch).take(3)} emitted by the stream but absent in batch")
  }

  test("mapGroupsWithState user summaries match a batch groupBy") {
    val got = EventStreams.userSessions(spark, events)
      .collect().map(s => (s.user_id, s.n_events,
        BigDecimal(s.total_value).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1).toSeq
    val want = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }
}
