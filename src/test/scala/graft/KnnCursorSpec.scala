package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn
import graft.functions.vecLit

/** Streaming KNN cursor: init_k first batch, doubling, 1000 cap
  * (reference scan.c:240-292). */
class KnnCursorSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
  private val q: Seq[Float] = Seq.tabulate(64)(i => ((i * 37) % 19 - 9) / 16.0f)

  test("cursor yields rows in distance order across batch boundaries") {
    val it = Knn.knnCursor(emb, col("embedding"), vecLit(q),
      Knn.L2Sq, Some(col("vec_id")), initK = 3)
    val first25 = it.take(25).map(_.getAs[Long]("vec_id")).toSeq
    val exact = Knn.knn(emb, col("embedding"), vecLit(q), 25,
      Knn.L2Sq, Some(col("vec_id")))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(first25 == exact)
  }

  test("cursor terminates when the corpus is exhausted") {
    val small = emb.limit(7)
    val it = Knn.knnCursor(small, col("embedding"), vecLit(q),
      Knn.L2Sq, Some(col("vec_id")), initK = 3)
    assert(it.size == 7)
  }

  test("cursor stops at the maxK cap") {
    val it = Knn.knnCursor(emb, col("embedding"), vecLit(q),
      Knn.L2Sq, Some(col("vec_id")), initK = 4, maxK = 8)
    assert(it.size == 8)
  }

  test("GraftConf exposes the reference defaults") {
    assert(GraftConf.initK(spark) == 10)
    assert(GraftConf.maxK(spark) == 1000)
    assert(GraftConf.annEf(spark) == 64)
    assert(GraftConf.bm25Params(spark) == graft.bm25.Bm25.Params(1.2, 0.75))
    spark.conf.set(GraftConf.Bm25K1, "2.0")
    assert(GraftConf.bm25Params(spark).k1 == 2.0)
    spark.conf.unset(GraftConf.Bm25K1)
  }
}
