package graft

import graft.tools.SynthData
import org.apache.spark.sql.functions._

/** The sf1+ corpus generator must be deterministic (pure hash of row id,
  * no RNG state), schema-exact vs the driver fixtures, and must inject
  * the duplicate/cluster signal the dedup and ANN contract queries
  * need. Small-n here; the full decade runs via `SynthData out=...`. */
class SynthDataSpec extends SparkSpec {

  test("generation is deterministic and partition-independent") {
    val a = SynthData.documents(spark, 400).collect().map(_.toSeq).toSeq
    val b = SynthData.documents(spark, 400).repartition(7)
      .collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.head.asInstanceOf[Long].toString) ==
      b.sortBy(_.head.asInstanceOf[Long].toString))
  }

  test("documents inject exact-duplicate groups and near-duplicate pairs") {
    import spark.implicits._
    val docs = SynthData.documents(spark, 5000).cache()
    // exact duplicates: distinct texts < docs
    val exactGroups = docs.groupBy("text").count().filter(col("count") > 1)
    assert(exactGroups.count() > 10, "expected exact-duplicate groups")
    // near duplicates: pairs at high but sub-1.0 word-level Jaccard
    val toks = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("w"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        (size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
          size(array_union(col("a.w"), col("b.w")))).as("j"))
    assert(pairs.filter(col("j") > 0.7 && col("j") < 1.0).count() > 5,
      "expected near-duplicate pairs in (0.7, 1.0)")
    // n_chars is the real text length
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    docs.unpersist()
  }

  test("embeddings are unit-norm with 10 balanced cluster labels") {
    import spark.implicits._
    val emb = SynthData.embeddings(spark, 1000).cache()
    val norms = emb.select(
      sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x)).as("n")).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4))
    val labels = emb.groupBy("label").count().as[(Int, Long)].collect().toMap
    assert(labels.keySet == (0 until 10).toSet)
    assert(labels.values.forall(c => c > 50 && c < 200))
    // clusters are real: same-label vectors sit closer than cross-label
    val sample = emb.limit(200).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).toArray))
    def d(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val (same, cross) = (for {
      (la, va) <- sample; (lb, vb) <- sample if !(va eq vb)
    } yield (la == lb, d(va, vb))).partition(_._1)
    assert(same.map(_._2).sum / same.length <
      cross.map(_._2).sum / cross.length * 0.8)
    emb.unpersist()
  }

  test("tables carry the fixtures' schemas") {
    def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(fields(SynthData.customer(spark, 10)) == Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"))
    assert(fields(SynthData.lineitem(spark, 10, 20, 5)) == Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"))
    assert(fields(SynthData.events(spark, 10, 5)) == Seq(
      "event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"))
    assert(fields(SynthData.documents(spark, 10)) == Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
    assert(fields(SynthData.embeddings(spark, 10)) == Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
  }
}
