package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated parquet tables (TESTDATA.md) from a
  * scale-factor directory. At cluster scale these would be object-store
  * paths; the API only needs a directory prefix. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$sfDir/events.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The driver's events table stores TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects; read nanos as long and convert to a
    * microsecond timestamp via integer division (a double division
    * would lose precision at 1.7e18 ns). Tables written by Spark itself
    * (e.g. the sf1 scale corpus from [[graft.tools.SynthData]]) carry a
    * regular micros timestamp already — pass those through untouched,
    * so the loader accepts both physical shapes. */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div`, not `/`: Divide casts bigint to double, and epoch-ns
        // (~1.7e18) exceeds double's 2^53 integer range - rows within
        // ulp (256ns) of a microsecond boundary would round wrong
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Register all tables as temp views for spark.sql use. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
