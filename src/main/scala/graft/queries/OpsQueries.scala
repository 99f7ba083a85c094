package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract queries for the ops utilities (profiling etc.). */
object OpsQueries {

  /** One-pass profile of the lineitem fact table (ints, strings, and a
    * timestamp — profiled as epoch micros; doubles excluded from the
    * CONTRACT columns because engines format them differently when
    * stringified). Exact distinct is the contract semantics; the
    * 100 TB default is approx_count_distinct (see Profile scaladoc). */
  private def profileLineitem(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.profile(
        Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "l_shipdate"))
      .orderBy(col("col_name").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> ((s, d) => profileLineitem(s, d)),
  )

  private def profCol(c: String, expr: String): String =
    s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN $expr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $expr) AS BIGINT) AS n_distinct,
       |  CAST(min($expr) AS VARCHAR) AS min_s,
       |  CAST(max($expr) AS VARCHAR) AS max_s
       |FROM lineitem""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_profile" ->
      (Seq(
        profCol("l_orderkey", "l_orderkey"),
        profCol("l_partkey", "l_partkey"),
        profCol("l_suppkey", "l_suppkey"),
        profCol("l_linenumber", "l_linenumber"),
        profCol("l_returnflag", "l_returnflag"),
        profCol("l_linestatus", "l_linestatus"),
        profCol("l_shipdate", "epoch_us(l_shipdate)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name ASC")),
  )
}
