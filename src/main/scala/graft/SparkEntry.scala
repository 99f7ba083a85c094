package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{l2sq_dist, cos_dist, hamming_dist, vecLit, intVecLit}
import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented has an entry in
  * [[queries]]; those with an exact SQL-expressible oracle also appear in
  * [[oracleSql]] (DuckDB dialect, same parquet tables). Query vectors use
  * values that are exact multiples of 1/16 so float->double widening is
  * bit-exact across engines; float-valued outputs are rounded to 6 places
  * to absorb last-ulp summation differences.
  */
object SparkEntry {

  /** Deterministic 64-dim query vector; exact in float and double. */
  private[graft] val qVec: Seq[Float] =
    Seq.tabulate(64)(i => ((i * 37) % 19 - 9) / 16.0f)

  /** Same vector as a DuckDB double-array literal. */
  private[graft] val qVecSql: String =
    qVec.map(f => "%.4f".format(f)).mkString("[", ", ", "]::DOUBLE[]")

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnL2Sq(spark, "/root/testdata/sf0.001")

  // ---- §2.1/§2.2: distance functions + exact KNN ----

  private def knnL2Sq(s: SparkSession, dir: String): DataFrame =
    Knn.knn(emb(s, dir), col("embedding"), vecLit(qVec), 10,
        Knn.L2Sq, Some(col("vec_id")))
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))

  private def knnCos(s: SparkSession, dir: String): DataFrame =
    Knn.knn(emb(s, dir), col("embedding"), vecLit(qVec), 10,
        Knn.Cos, Some(col("vec_id")))
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))

  /** Sign-bit int vector for hamming: 1 where component >= 0. */
  private val signBitsSpark =
    transform(col("embedding"), x => when(x >= 0, 1).otherwise(0))
  private val qBits: Seq[Int] = qVec.map(f => if (f >= 0) 1 else 0)

  private def knnHamming(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("bits", signBitsSpark)
      .withColumn("dist", hamming_dist(col("bits"), intVecLit(qBits)))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("dist"))

  private def knnFiltered(s: SparkSession, dir: String): DataFrame =
    Knn.knn(emb(s, dir).filter(col("label") === 1), col("embedding"),
        vecLit(qVec), 10, Knn.L2Sq, Some(col("vec_id")))
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))

  // ---- §2.9: weighted multi-metric search ----

  private def weightedSearch(s: SparkSession, dir: String): DataFrame =
    Knn.weightedSearch(
        emb(s, dir),
        Seq(
          Knn.WeightedTerm(0.7, col("embedding"), vecLit(qVec), Knn.L2Sq),
          Knn.WeightedTerm(0.3, col("embedding"), vecLit(qVec), Knn.Cos)),
        10, maxDist = None, tieBreaker = Some(col("vec_id")))
      .select(col("vec_id"), round(col("joint_dist"), 6).as("joint_dist"))

  // ---- DuckDB oracle fragments ----

  private val l2sqSqlExpr =
    s"list_sum(list_transform(embedding, (x, i) -> (CAST(x AS DOUBLE) - qv[i]) * (CAST(x AS DOUBLE) - qv[i])))"
  private val cosSqlExpr =
    """(CASE WHEN list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
      |  THEN 1.0
      |  ELSE 1.0 - list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * qv[i]))
      |    / sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |           * list_sum(list_transform(qv, x -> x * x)))
      |END)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_l2sq" -> ((s, dir) => knnL2Sq(s, dir)),
    "q_knn_cos" -> ((s, dir) => knnCos(s, dir)),
    "q_knn_hamming" -> ((s, dir) => knnHamming(s, dir)),
    "q_knn_filtered" -> ((s, dir) => knnFiltered(s, dir)),
    "q_weighted_search" -> ((s, dir) => weightedSearch(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_knn_l2sq" ->
      s"""WITH q AS (SELECT $qVecSql AS qv)
         |SELECT vec_id, round($l2sqSqlExpr, 6) AS dist
         |FROM embeddings, q
         |ORDER BY $l2sqSqlExpr ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_knn_cos" ->
      s"""WITH q AS (SELECT $qVecSql AS qv)
         |SELECT vec_id, round($cosSqlExpr, 6) AS dist
         |FROM embeddings, q
         |ORDER BY $cosSqlExpr ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_knn_hamming" ->
      s"""WITH q AS (SELECT list_transform($qVecSql, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS qb)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(embedding, (x, i) ->
         |    bit_count(xor(CASE WHEN x >= 0 THEN 1 ELSE 0 END, qb[i])))) AS INT) AS dist
         |FROM embeddings, q
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_knn_filtered" ->
      s"""WITH q AS (SELECT $qVecSql AS qv)
         |SELECT vec_id, round($l2sqSqlExpr, 6) AS dist
         |FROM embeddings, q WHERE label = 1
         |ORDER BY $l2sqSqlExpr ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_weighted_search" ->
      s"""WITH q AS (SELECT $qVecSql AS qv)
         |SELECT vec_id, round(0.7 * $l2sqSqlExpr + 0.3 * $cosSqlExpr, 6) AS joint_dist
         |FROM embeddings, q
         |ORDER BY 0.7 * $l2sqSqlExpr + 0.3 * $cosSqlExpr ASC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
