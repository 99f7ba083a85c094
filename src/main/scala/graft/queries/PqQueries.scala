package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{pq_quantize, pq_dequantize, pq_adc_dist, pack_bits, l2sq_dist, hamming_dist, vecLit}
import graft.pq.Codebook

/** Driver-contract queries for the quantization family (SURVEY.md
  * section 2.3) with DuckDB oracles.
  *
  * K-means codebook learning is not SQL-expressible, so the oracle
  * queries bind a FIXED grid codebook (components are multiples of 1/4:
  * exact in float and double, so nearest-centroid assignment agrees
  * across engines bit-for-bit). The k-means path is validated by
  * PqSpec's recall-drop budget instead (reference approach — "tests
  * compare recall, not codebooks", test/sql/hnsw_pq_index.sql:139). */
object PqQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Deterministic 8x4x8 grid codebook for dim-64 vectors. */
  val gridCodebook: Codebook = Codebook(
    Array.tabulate(8, 4, 8) { (s, c, t) =>
      (((c * 5 + t * 3 + s * 7) % 9) - 4) / 4.0f
    })

  private def quantize(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"),
        concat_ws(",",
          pq_quantize(col("embedding"), gridCodebook).cast("array<int>"))
          .as("codes"))
      .orderBy(col("vec_id").asc).limit(200)

  private def roundtrip(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"),
        round(l2sq_dist(col("embedding"),
          pq_dequantize(pq_quantize(col("embedding"), gridCodebook),
            gridCodebook)), 6).as("recon_err"))
      .orderBy(col("vec_id").asc).limit(200)

  private def adcTopK(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("adc",
        pq_adc_dist(pq_quantize(col("embedding"), gridCodebook),
          gridCodebook, VectorQueries.qVec))
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("adc"), 6).as("adc"))

  /** quantize_table end-to-end (reference lantern.sql:342-429: adds a
    * generated `<col>_pq` column): the table path must produce the same
    * codes as the scalar path, and drop_quantization must remove the
    * column again — both observable in one row shape. */
  private def quantizeTable(s: SparkSession, dir: String): DataFrame = {
    val quantized = graft.pq.Pq.quantizeTable(emb(s, dir), "embedding",
      gridCodebook)
    val dropped = graft.pq.Pq.dropQuantization(quantized, "embedding")
    quantized
      .select(col("vec_id"),
        concat_ws(",", col("embedding_pq").cast("array<int>")).as("codes"),
        lit(dropped.columns.contains("embedding_pq")).as("pq_after_drop"))
      .orderBy(col("vec_id").asc).limit(200)
  }

  /** b1 scalar quantization end-to-end: packed sign bits probed with
    * hamming_dist — numerically identical to the unpacked sign-bit
    * hamming, which is what the oracle computes. */
  private def hammingB1(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("dist",
        hamming_dist(pack_bits(col("embedding")),
          pack_bits(vecLit(VectorQueries.qVec))))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("dist"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_quantize" -> ((s, d) => quantize(s, d)),
    "q_pq_table" -> ((s, d) => quantizeTable(s, d)),
    "q_pq_roundtrip" -> ((s, d) => roundtrip(s, d)),
    "q_pq_adc" -> ((s, d) => adcTopK(s, d)),
    "q_knn_hamming_b1" -> ((s, d) => hammingB1(s, d)),
  )

  // ---- DuckDB oracle ----

  private def centSql(s: Int, c: Int): String =
    gridCodebook.centroids(s)(c)
      .map(f => "%.2f".format(f)).mkString("[", ", ", "]::DOUBLE[]")

  /** Per-subvector distance list [d(s,0)..d(s,3)] from the row vector. */
  private def dListSql(s: Int): String =
    (0 until 4).map { c =>
      s"list_sum(list_transform(range(1, 9), t -> " +
        s"(CAST(embedding[${s * 8} + t] AS DOUBLE) - (${centSql(s, c)})[t]) * " +
        s"(CAST(embedding[${s * 8} + t] AS DOUBLE) - (${centSql(s, c)})[t])))"
    }.mkString("[", ", ", "]")

  /** Per-subvector query-to-centroid distance list (all literals). */
  private def dqListSql(s: Int): String =
    (0 until 4).map { c =>
      s"list_sum(list_transform(range(1, 9), t -> " +
        s"((qv)[${s * 8} + t] - (${centSql(s, c)})[t]) * " +
        s"((qv)[${s * 8} + t] - (${centSql(s, c)})[t])))"
    }.mkString("[", ", ", "]")

  private val distsCte =
    "dists AS (SELECT vec_id, " +
      (0 until 8).map(s => s"${dListSql(s)} AS d$s").mkString(", ") +
      " FROM embeddings)"

  private val qvCte = s"q AS (SELECT ${VectorQueries.qVecSql} AS qv)"

  val oracleSql: Map[String, String] = Map(
    "q_pq_quantize" ->
      s"""WITH $distsCte
         |SELECT vec_id, array_to_string([${(0 until 8).map(s =>
              s"list_position(d$s, list_min(d$s)) - 1").mkString(", ")}], ',') AS codes
         |FROM dists ORDER BY vec_id ASC LIMIT 200""".stripMargin,
    "q_pq_table" ->
      s"""WITH $distsCte
         |SELECT vec_id, array_to_string([${(0 until 8).map(s =>
              s"list_position(d$s, list_min(d$s)) - 1").mkString(", ")}], ',') AS codes,
         |  FALSE AS pq_after_drop
         |FROM dists ORDER BY vec_id ASC LIMIT 200""".stripMargin,
    "q_pq_roundtrip" ->
      s"""WITH $distsCte
         |SELECT vec_id, round(${(0 until 8).map(s =>
              s"list_min(d$s)").mkString(" + ")}, 6) AS recon_err
         |FROM dists ORDER BY vec_id ASC LIMIT 200""".stripMargin,
    "q_pq_adc" ->
      s"""WITH $qvCte,
         |dd AS (SELECT vec_id, ${(0 until 8).map(s =>
              s"${dListSql(s)} AS d$s, ${dqListSql(s)} AS dq$s").mkString(", ")}
         |  FROM embeddings, q),
         |adcs AS (SELECT vec_id, ${(0 until 8).map(s =>
              s"dq$s[list_position(d$s, list_min(d$s))]").mkString(" + ")} AS adc
         |  FROM dd)
         |SELECT vec_id, round(adc, 6) AS adc FROM adcs
         |ORDER BY adc ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_knn_hamming_b1" ->
      s"""WITH q AS (SELECT list_transform(${VectorQueries.qVecSql},
         |    x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS qb)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(embedding, (x, i) ->
         |    bit_count(xor(CASE WHEN x >= 0 THEN 1 ELSE 0 END, qb[i])))) AS INT) AS dist
         |FROM embeddings, q
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
