package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Driver-contract queries over the events stream table: the batch side
  * of the streaming operators (stream/batch parity is asserted by
  * StreamingSpec; the oracle checks the batch plan). */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def eventsWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.windowedCounts(events(s, dir))
      .select(unix_timestamp(col("window_start")).as("window_start"),
        col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .orderBy(col("window_start").asc, col("event_type").asc)
      .limit(500)

  /** Per-user summaries through the typed keyed-state path
    * (mapGroupsWithState, batch execution). */
  private def userSessions(s: SparkSession, dir: String): DataFrame =
    EventStreams.userSessions(s, events(s, dir)).toDF()
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .orderBy(col("user_id").asc)
      .limit(500)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_window" -> ((s, d) => eventsWindow(s, d)),
    "q_user_sessions" -> ((s, d) => userSessions(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start ASC, event_type ASC LIMIT 500""".stripMargin,
    "q_user_sessions" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS total_value
        |FROM events GROUP BY user_id
        |ORDER BY user_id ASC LIMIT 500""".stripMargin,
  )
}
