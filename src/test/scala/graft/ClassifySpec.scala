package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Classify
import graft.ann.{AnnIndex, Metric}

/** k-NN weak labeling: vote determinism, exact path, exact == ANN at
  * exhaustive breadth. */
class ClassifySpec extends SparkSpec {

  import spark.implicits._

  test("vote picks the majority with the votes/best-rank/label tie chain") {
    // query 1: labels b,b,a,a,c — b and a tie on votes, b has the
    // nearer best neighbor; query 2: a clean majority
    val nb = Seq(
      (1L, 10L, 1.0, "b"), (1L, 11L, 2.0, "b"), (1L, 12L, 3.0, "a"),
      (1L, 13L, 4.0, "a"), (1L, 14L, 5.0, "c"),
      (2L, 10L, 1.0, "x"), (2L, 11L, 2.0, "x"), (2L, 12L, 3.0, "x"),
      (2L, 13L, 4.0, "y"), (2L, 14L, 5.0, "y")
    ).toDF("query_id", "id", "dist", "label")
    val out = Classify.vote(nb, 5).orderBy("query_id").collect()
    assert(out(0).getString(1) == "b" && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 0.4)
    assert(out(1).getString(1) == "x" && out(1).getLong(2) == 3L)
    assert(out(1).getDouble(3) == 0.6)
    // equal votes AND equal best rank cannot happen (ranks are
    // distinct); equal votes with a farther best loses even for a
    // lexicographically smaller label
    val tie = Seq(
      (3L, 1L, 1.0, "z"), (3L, 2L, 2.0, "a")
    ).toDF("query_id", "id", "dist", "label")
    assert(Classify.vote(tie, 2).collect()(0).getString(1) == "z")
  }

  test("vote only counts the k nearest even when the frame holds more") {
    val nb = Seq(
      (1L, 10L, 1.0, "a"), (1L, 11L, 2.0, "b"), (1L, 12L, 3.0, "b")
    ).toDF("query_id", "id", "dist", "label")
    // k=1: only the nearest (a) votes
    assert(Classify.vote(nb, 1).collect()(0).getString(1) == "a")
  }

  test("hard negatives: nearest different-label rows, exact by construction") {
    // anchor label a at origin; same-label rows nearer than the
    // different-label ones must NOT appear
    val anchors = Seq((1L, Seq(0.0f, 0.0f), "a")).toDF("id", "v", "lbl")
    val ref = Seq(
      (10L, Seq(0.1f, 0.0f), "a"), (11L, Seq(0.2f, 0.0f), "a"),
      (12L, Seq(1.0f, 0.0f), "b"), (13L, Seq(2.0f, 0.0f), "c"),
      (14L, Seq(3.0f, 0.0f), "b")
    ).toDF("id", "v", "lbl")
    val out = graft.operators.Classify.hardNegativesExact(
        anchors, col("id"), col("v"), col("lbl"),
        ref, col("id"), col("v"), col("lbl"), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(12L, 13L),
      "the two nearest DIFFERENT-label rows, same-label ones skipped")
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
  }

  test("classifyExact == classifyAnn at exhaustive ef over a real slice") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val ref = emb.filter(col("vec_id") >= 10)
    val exact = Classify.classifyExact(queries, col("vec_id"),
        col("embedding"), ref, col("vec_id"), col("embedding"),
        col("label"), k = 5)
      .orderBy("query_id").collect().map(_.toSeq).toSeq
    val dir = Files.createTempDirectory("classify_ann").toString
    AnnIndex.build(emb, "vec_id", "embedding", dir,
      AnnIndex.Params(Metric.L2Sq, numShards = 2))
    val n = AnnIndex.readManifest(dir).count.toInt
    val ann = Classify.classifyAnn(queries, col("vec_id"),
        col("embedding"), dir, ref, col("vec_id"), col("label"),
        k = 5, ef = n, overfetch = 10)
      .orderBy("query_id").collect().map(_.toSeq).toSeq
    assert(exact == ann,
      "index-backed classification must match the exact path at exhaustive ef")
    assert(exact.length == 10)
  }

  test("targetRecall derives the probe breadth; explicit ef stays the fallback") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val ref = emb.filter(col("vec_id") >= 10)
    val dir = Files.createTempDirectory("classify_target").toString
    AnnIndex.build(emb, "vec_id", "embedding", dir,
      AnnIndex.Params(Metric.L2Sq, numShards = 2))
    val man = AnnIndex.readManifest(dir)
    val n = man.count.toInt
    // fallback chain, unit level: no artifact -> explicit ef; then a
    // synthetic artifact whose only qualifying breadth is exhaustive
    import graft.ann.Autotune
    assert(Autotune.probeEf(spark, dir, 7, Some(0.9)) == 7,
      "no artifact -> the explicit ef stands")
    assert(Autotune.probeEf(spark, dir, 7, None) == 7)
    Seq((man.m, man.efConstruction, 16, 0.85, 1L, 1L),
      (man.m, man.efConstruction, n, 0.95, 1L, 1L))
      .toDF("m", "ef_construction", "ef", "recall", "build_ms", "search_ms")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/autotune_results")
    assert(Autotune.probeEf(spark, dir, 7, Some(0.9)) == n,
      "artifact-qualified target -> derived ef")
    assert(Autotune.probeEf(spark, dir, 7, Some(0.999)) == 7,
      "unattainable target -> the explicit ef stands")
    // end-to-end: the derived (exhaustive) breadth drives the search —
    // a tiny explicit ef=2 would NOT recover the exact top-5 alone
    val exact = Classify.classifyExact(queries, col("vec_id"),
        col("embedding"), ref, col("vec_id"), col("embedding"),
        col("label"), k = 5)
      .orderBy("query_id").collect().map(_.toSeq).toSeq
    val derived = Classify.classifyAnn(queries, col("vec_id"),
        col("embedding"), dir, ref, col("vec_id"), col("label"),
        k = 5, ef = 2, overfetch = 10, targetRecall = Some(0.9))
      .orderBy("query_id").collect().map(_.toSeq).toSeq
    assert(derived == exact,
      "recall-target serving must use the artifact-derived breadth")
    // end-to-end fallback: unattainable target + exhaustive explicit ef
    val fellBack = Classify.classifyAnn(queries, col("vec_id"),
        col("embedding"), dir, ref, col("vec_id"), col("label"),
        k = 5, ef = n, overfetch = 10, targetRecall = Some(0.999))
      .orderBy("query_id").collect().map(_.toSeq).toSeq
    assert(fellBack == exact)
  }
}
