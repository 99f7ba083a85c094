package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * At 100 TB the dedup/retrieval family joins the same keyed frames
  * over and over (shingles x shingles, signatures x candidate pairs,
  * postings x queries). Hash-bucketing those tables ON THE JOIN KEY
  * pays the shuffle once at write time: every later equi-join on the
  * bucket column matches partitioning on both sides, so Spark plans a
  * SortMergeJoin with NO Exchange — the single biggest repeated-cost
  * elimination available to a pipeline that re-joins its corpus daily.
  * (Reference analog: Postgres physically co-locates via index/heap
  * access paths; Spark's equivalent primitive is the bucketed table.)
  *
  * Buckets must agree on (column, count) across the tables being
  * joined — pick the count from target bucket SIZE (rows / buckets x
  * row width ~ 100-500 MB per bucket at scale), not from cluster
  * width. `sortCols` additionally sorts within each bucket file so the
  * merge join needs no per-task sort on that key.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed table
    * in `database`.`table`. The database anchors the storage location,
    * so callers control where bucket files land. The location only
    * takes effect when this call CREATES the database — SQL's
    * IF NOT EXISTS ignores it for an existing one, so a second call
    * with a different location lands under the first (asserted below
    * rather than silently accepted). */
  def writeBucketed(df: DataFrame, database: String, table: String,
      bucketCol: String, buckets: Int, sortCols: Seq[String] = Nil,
      location: Option[String] = None): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    // single-quote SQL string literal: escape embedded quotes
    val loc = location.map(l => s" LOCATION '${l.replace("'", "''")}'")
      .getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`$loc")
    // verify AFTER the create, unconditionally: a pre-create existence
    // check races a concurrent creator (both see absent, one CREATE
    // IF NOT EXISTS becomes a no-op and its location is silently
    // ignored) — the catalog's post-create location is the truth
    location.foreach { l =>
      val conf = spark.sessionState.newHadoopConf()
      def qualified(p: String) = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).makeQualified(hp)
      }
      val actual = qualified(spark.sessionState.catalog
        .getDatabaseMetadata(database).locationUri.toString)
      require(actual == qualified(l),
        s"database $database is anchored at $actual, not $l")
    }
    val w0 = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
            else w0
    w.saveAsTable(s"`$database`.`$table`")
  }

  /** The bucketed table as a DataFrame (scans carry the bucket spec,
    * so joins/aggregations on the bucket column skip their Exchange). */
  def readBucketed(spark: SparkSession, database: String,
      table: String): DataFrame =
    spark.table(s"`$database`.`$table`")
}
