package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers/writers for the SIFT-style `.fvecs` / `.ivecs` / `.bvecs`
  * vector file formats (reference `parse_fvecs` / `parse_ivecs` /
  * `parse_bvecs`, lantern_extras/src/dotvecs.rs:32-138): each record is
  * a little-endian u32 dimension followed by `dim` elements (f32 / i32 /
  * u8 respectively).
  *
  * All records in a file share one dimension, so the record length is
  * fixed and the read distributes via `binaryRecords` — every executor
  * decodes its own byte ranges; only the 4-byte header read touches the
  * driver. Row ids are the record's position in the file (the label the
  * SIFT ground-truth files key on).
  */
object Dotvecs {

  /** Dimension from the first 4 bytes (LE u32). */
  def readDim(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val b = new Array[Byte](4)
      in.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  private def records(spark: SparkSession, path: String, elemSize: Int)
      : (Int, org.apache.spark.rdd.RDD[(Array[Byte], Long)]) = {
    val dim = readDim(spark, path)
    require(dim > 0 && dim <= 100000, s"implausible dimension $dim in $path")
    val recLen = 4 + elemSize * dim
    (dim, spark.sparkContext.binaryRecords(path, recLen).zipWithIndex())
  }

  private def checkDim(buf: ByteBuffer, dim: Int, row: Long): Unit = {
    val d = buf.getInt
    if (d != dim)
      throw new IllegalArgumentException(
        s"record $row has dimension $d, expected $dim (corrupt file?)")
  }

  /** `.fvecs` (f32 elements) -> (row_id bigint, vector array<float>). */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (dim, recs) = records(spark, path, 4)
    recs.map { case (bytes, row) =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      checkDim(buf, dim, row)
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = buf.getFloat; i += 1 }
      (row, v.toSeq)
    }.toDF("row_id", "vector")
  }

  /** `.ivecs` (i32 elements; SIFT ground-truth ids). */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (dim, recs) = records(spark, path, 4)
    recs.map { case (bytes, row) =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      checkDim(buf, dim, row)
      val v = new Array[Int](dim)
      var i = 0
      while (i < dim) { v(i) = buf.getInt; i += 1 }
      (row, v.toSeq)
    }.toDF("row_id", "vector")
  }

  /** `.bvecs` (u8 elements, widened to int). */
  def readBvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (dim, recs) = records(spark, path, 1)
    recs.map { case (bytes, row) =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      checkDim(buf, dim, row)
      val v = new Array[Int](dim)
      var i = 0
      while (i < dim) { v(i) = buf.get() & 0xff; i += 1 }
      (row, v.toSeq)
    }.toDF("row_id", "vector")
  }

  /** Write float vectors as `.fvecs` in the iterator's order
    * (driver-side ingest/test utility; the scale path is parquet). */
  def writeFvecs(spark: SparkSession, path: String,
      vectors: Iterator[Array[Float]]): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = new DataOutputStream(new BufferedOutputStream(fs.create(p, true)))
    var n = 0L
    try {
      vectors.foreach { v =>
        val buf = ByteBuffer.allocate(4 + 4 * v.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(buf.putFloat)
        out.write(buf.array())
        n += 1
      }
    } finally out.close()
    n
  }
}
