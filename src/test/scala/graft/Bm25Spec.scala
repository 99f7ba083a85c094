package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.bm25.Bm25
import graft.text.UserStopwords

/** BM25 extensions: consolidation semantics, ad-hoc scoring, user
  * stopwords. */
class Bm25Spec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("term"), col("term_freq"),
        concat_ws(",", col("doc_ids")), concat_ws(",", col("fqs")),
        concat_ws(",", col("doc_lens")))
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("consolidate(union of halves) equals the full table; idempotent") {
    val full = Bm25.createBm25Table(docs, col("doc_id"), col("text"))
    val even = Bm25.createBm25Table(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"))
    val odd = Bm25.createBm25Table(docs.filter(col("doc_id") % 2 =!= 0),
      col("doc_id"), col("text"))
    val merged = Bm25.consolidateBm25Table(even.unionByName(odd))
    assert(canon(merged) == canon(full))
    assert(canon(Bm25.consolidateBm25Table(merged)) == canon(full))
  }

  test("bm25Score matches searchBm25's score for an existing document") {
    // score the text of one real doc ad-hoc; the same doc's score in the
    // ranked search over the corpus must match (same stats, same fq)
    val row = docs.orderBy(col("doc_id")).limit(1)
      .collect()(0)
    val (docId, text) = (row.getAs[Long]("doc_id"), row.getAs[String]("text"))
    val query = "spark join fast window"
    val adhoc = Bm25.bm25Score(docs, col("doc_id"), col("text"), text, query)
    val ranked = Bm25.searchBm25(docs, col("doc_id"), col("text"), query, 1000)
      .filter(col("doc_id") === docId).collect()
    if (ranked.nonEmpty) {
      assert(math.abs(adhoc - ranked(0).getAs[Double]("score")) < 1e-9)
    } else assert(adhoc == 0.0)
  }

  test("bm25Score is 0 for a document without query terms") {
    assert(Bm25.bm25Score(docs, col("doc_id"), col("text"),
      "nothing relevant here", "spark join") == 0.0)
  }

  test("popular-term approximation changes scores only above the threshold") {
    val tok = Bm25.tokenized(docs, col("doc_id"), col("text"))
    val post = Bm25.postingsOf(tok)
      .filter(col("term").isin("spark", "join"))
    val stats = Bm25.corpusStatsOf(tok)
    val exact = Bm25.scoreAndRank(post, stats, 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // threshold above every doc_freq -> identical to exact
    val same = Bm25.scoreAndRank(post, stats, 100000, approxThreshold = 1000000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(same == exact)
    // threshold 1 -> every posting scores with fq=1/len=avgdl, so scores
    // collapse to one value per term-membership class ({spark}, {join},
    // {both}) - at most 3 distinct scores across the whole corpus
    val approx = Bm25.scoreAndRank(post, stats, 100000, approxThreshold = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(approx.nonEmpty)
    assert(approx.map(x => BigDecimal(x._2).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)).distinct.length <= 3)
    assert(approx.map(_._1).toSet == exact.keySet) // same doc set, new scores
  }

  test("user stopwords replace the default list") {
    import spark.implicits._
    val df = Seq((1L, "the spark table joins data")).toDF("id", "t")
    val default = df.select(
      concat_ws(" ", graft.functions.text_to_stem_array(col("t"))))
      .collect()(0).getString(0)
    assert(default == "spark tabl join data") // 'the' dropped by default
    val custom = df.select(concat_ws(" ",
      graft.functions.text_to_stem_array_user(col("t"), Seq("spark"))))
      .collect()(0).getString(0)
    assert(custom == "the tabl join data") // only 'spark' dropped now
  }

  test("UserStopwords set/get round-trips through the session conf") {
    UserStopwords.set(spark, Seq("foo", "bar"))
    assert(UserStopwords.get(spark) == Seq("foo", "bar"))
    UserStopwords.clear(spark)
    assert(UserStopwords.get(spark) == graft.text.Stemmer.stopWords.toSeq.sorted)
  }
}
