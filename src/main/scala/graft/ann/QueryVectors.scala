package graft.ann

import org.apache.spark.sql.{Column, SparkSession}

/** Extract a literal query vector from a Column (the shape `vecLit`
  * produces) for index probes that need the driver-side value. The
  * column is evaluated through a one-row local query so unresolved
  * function trees (array(...)) work too. */
object QueryVectors {
  def fromColumn(spark: SparkSession, c: Column): Array[Float] = {
    val rows = spark.range(1).select(c.cast("array<float>").as("q")).collect()
    rows(0).getSeq[Float](0).toArray
  }
}
