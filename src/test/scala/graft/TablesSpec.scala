package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins both physical shapes [[Tables.loadEvents]] accepts: the driver
  * fixtures' TIMESTAMP(NANOS) (read as long via nanosAsLong, converted
  * with integer division) and Spark-written micros/NTZ parquet (passed
  * through untouched). The same instants must come back from both. */
class TablesSpec extends SparkSpec {

  test("loadEvents reads nanos-long and spark-native micros identically") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("tables").toString

    // three instants incl. one within 256ns of a microsecond boundary
    // (the regression the integer division guards against)
    val micros = Seq(1704067200000000L, 1706700000123456L, 1706741999999999L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 100L + i, "click", 1.5 + i, s"""{"k": $i}""")
    }

    // shape 1: ts as INT64 nanos, the fixtures' physical layout —
    // written here as a plain long column named ts
    rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/nanos.parquet")

    // shape 2: UTC-adjusted micros (a Spark job writing LTZ timestamps)
    rows.map { case (id, us, u, t, v, p) => (id, us, u, t, v, p) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/micros.parquet")

    // shape 3: naive micros / NTZ — the current driver fixtures and
    // SynthData corpora
    rows.map { case (id, us, u, t, v, p) => (id, us, u, t, v, p) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/ntz.parquet")

    val fromNanos = Tables.loadEvents(spark, s"$work/nanos.parquet")
    val fromMicros = Tables.loadEvents(spark, s"$work/micros.parquet")
    val fromNtz = Tables.loadEvents(spark, s"$work/ntz.parquet")

    // every shape normalizes to TimestampType — streaming watermarks
    // reject NTZ event time, so the loader must never leak it
    for (df <- Seq(fromNanos, fromMicros, fromNtz))
      assert(df.schema("ts").dataType.isInstanceOf[TimestampType],
        s"expected TimestampType, got ${df.schema("ts").dataType}")

    // identical instants row-for-row across all three shapes
    def instants(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(instants(fromNanos) == instants(fromMicros))
    assert(instants(fromNanos) == instants(fromNtz))
    assert(instants(fromNanos).map(_._2) == micros)
  }
}
