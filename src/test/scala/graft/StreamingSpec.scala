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
