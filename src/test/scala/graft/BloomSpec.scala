package graft

import org.apache.spark.sql.functions._
import graft.functions.{array_to_bloom, array_to_bloom_text, elem_in_bloom, elem_in_bloom_text}

/** Bloom filter semantics: no false negatives; false-positive rate near
  * the reference's fp=0.01 target (lantern_extras/src/bloom.rs:46-103). */
class BloomSpec extends SparkSpec {

  test("every inserted long tests true") {
    import spark.implicits._
    val df = Seq(Tuple1((1L to 200L).toSeq)).toDF("xs")
      .withColumn("bloom", array_to_bloom(col("xs")))
    val missing = df.select(
      size(filter(col("xs"), x => !elem_in_bloom(x, col("bloom")))).as("miss"))
      .collect()(0).getInt(0)
    assert(missing == 0)
  }

  test("every inserted string tests true") {
    import spark.implicits._
    val words = (1 to 100).map(i => s"word_$i")
    val df = Seq(Tuple1(words)).toDF("xs")
      .withColumn("bloom", array_to_bloom_text(col("xs")))
    val missing = df.select(
      size(filter(col("xs"), x => !elem_in_bloom_text(x, col("bloom")))).as("miss"))
      .collect()(0).getInt(0)
    assert(missing == 0)
  }

  test("false-positive rate is near the 0.01 target") {
    import spark.implicits._
    val df = Seq(Tuple1((0L until 1000L).toSeq)).toDF("xs")
      .withColumn("bloom", array_to_bloom(col("xs")))
      .cache()
    val probes = spark.range(10000, 30000).toDF("p")
    val fp = probes.crossJoin(df.select("bloom"))
      .select(elem_in_bloom(col("p"), col("bloom")).as("hit"))
      .filter(col("hit")).count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.03, s"false-positive rate $rate >= 0.03")
    assert(rate > 0.0005, s"suspiciously low fp rate $rate (bloom too large?)")
    df.unpersist()
  }

  test("probes are deterministic across calls") {
    import spark.implicits._
    val df = Seq(Tuple1((1L to 50L).toSeq)).toDF("xs")
      .withColumn("bloom", array_to_bloom(col("xs")))
    def run(): Seq[Boolean] =
      df.select((1000L to 1050L).map(i =>
        elem_in_bloom(lit(i), col("bloom")).as(s"p$i")): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Boolean])
    assert(run() == run())
  }
}
