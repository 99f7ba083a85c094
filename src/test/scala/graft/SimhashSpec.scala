package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The single-pass codegen simhash64 kernel must be bit-for-bit equal to
  * the 64-aggregate-pass SQL formulation it replaced (the form the
  * DuckDB oracle replays) — the round-6 CPU-shape fix must not move a
  * single signature bit. */
class SimhashSpec extends SparkSpec {

  test("codegen simhash64 == 64-pass SQL aggregate form on the real corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val sh = Dedup.shingled(docs, col("doc_id"), col("text")).persist()
    try {
      val kernel = Dedup.simhash64Of(sh)
      val sql = Dedup.simhash64OfSql(sh)
      val diff = kernel.as("k")
        .join(sql.as("s"), col("k.doc_id") === col("s.doc_id"))
        .filter(col("k.simhash") =!= col("s.simhash"))
        .count()
      assert(diff == 0L, s"$diff docs disagree between kernel and SQL form")
      assert(kernel.count() == sh.count())
    } finally sh.unpersist()
  }

  test("simhash64 edge shapes: empty array ties to all zeros; null is null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta")),
      (2L, Seq.empty[String])).toDF("doc_id", "sh")
    val out = Dedup.simhash64Of(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).length == 64 && out(1L).forall(c => c == '0' || c == '1'))
    // zero shingles -> every bit's vote total is 0 -> all '0' (ties lose)
    assert(out(2L) == "0" * 64)
    val withNull = df.select(col("doc_id"),
      when(col("doc_id") === 2L, lit(null)).otherwise(col("sh")).as("sh"))
    val n = Dedup.simhash64Of(withNull)
      .filter(col("doc_id") === 2L).collect()(0)
    assert(n.isNullAt(1))
  }

  test("simhash64 registers as a SQL function") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a b c', 'b c d')) AS s").collect()(0).getString(0)
    assert(r.length == 64)
  }
}
