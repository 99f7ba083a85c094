package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{hamming_dist, cos_dist, vecLit, intVecLit}
import graft.operators.Knn

/** Driver-contract queries for the distance/KNN operator family
  * (SURVEY.md sections 2.1, 2.2, 2.9) with DuckDB oracles. */
object VectorQueries {

  /** Deterministic 64-dim query vector; exact in float and double. */
  val qVec: Seq[Float] = Seq.tabulate(64)(i => ((i * 37) % 19 - 9) / 16.0f)

  /** Same vector as a DuckDB double-array literal. */
  val qVecSql: String =
    qVec.map(f => "%.4f".format(f)).mkString("[", ", ", "]::DOUBLE[]")

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  def knnL2Sq(s: SparkSession, dir: String): DataFrame =
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

  private def weightedSearch(s: SparkSession, dir: String): DataFrame =
    Knn.weightedSearch(
        emb(s, dir),
        Seq(
          Knn.WeightedTerm(0.7, col("embedding"), vecLit(qVec), Knn.L2Sq),
          Knn.WeightedTerm(0.3, col("embedding"), vecLit(qVec), Knn.Cos)),
        10, maxDist = None, tieBreaker = Some(col("vec_id")))
      .select(col("vec_id"), round(col("joint_dist"), 6).as("joint_dist"))

  /** Embedding near-duplicate pairs: closest 10 same-label pairs by
    * cosine distance (label = the blocking key; at scale the block is
    * an LSH/IVF bucket instead). */
  private def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val a = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("dist", round(cos_dist(col("emb_a"), col("emb_b")), 6))
      .orderBy(col("dist").asc, col("vec_a").asc, col("vec_b").asc)
      .limit(10)
      .select(col("vec_a"), col("vec_b"), col("dist"))
  }

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_l2sq" -> ((s, dir) => knnL2Sq(s, dir)),
    "q_knn_cos" -> ((s, dir) => knnCos(s, dir)),
    "q_knn_hamming" -> ((s, dir) => knnHamming(s, dir)),
    "q_knn_filtered" -> ((s, dir) => knnFiltered(s, dir)),
    "q_weighted_search" -> ((s, dir) => weightedSearch(s, dir)),
    "q_neardup_embedding" -> ((s, dir) => nearDupPairs(s, dir)),
  )

  val oracleSql: Map[String, String] = Map(
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
    "q_neardup_embedding" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(1.0 - list_sum(list_transform(a.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |           * list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS dist
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY dist ASC, vec_a ASC, vec_b ASC LIMIT 10""".stripMargin,
  )
}
