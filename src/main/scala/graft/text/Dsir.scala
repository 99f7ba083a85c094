package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.tokenize

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169, the published data-selection method behind several
  * public pretraining mixes): pick raw-pool documents whose hashed
  * n-gram distribution looks like a trusted target corpus. Per
  * document the importance weight is `log p_target(d) / p_raw(d)`
  * under two bag-of-hashed-features models — a sum over the document's
  * features of per-bucket log-likelihood ratios — and selection takes
  * the top-weighted documents.
  *
  * Everything on the contract is engine-replayable:
  *  - features are unigrams + bigrams of the plain tokenizer, bucketed
  *    by the repo's md5-prefix hash idiom ([[QualityClassifier.bucketOf]]);
  *  - per-bucket log-ratios are QUANTIZED ONCE into fixed point
  *    (`floor(Scale * ln(ratio) + 0.5)`, the tfidf ln-then-round
  *    precedent: the ±1-ulp cross-engine `ln` skew is absorbed by the
  *    quantizer except on a measure-zero boundary, and the weight
  *    table is deterministic so a green verify at a scale stays green);
  *  - document scores are INTEGER sums of those fixed-point ratios —
  *    associative, exact at any parallelism (the
  *    [[QualityClassifier]] fixed-point discipline);
  *  - resampling is a deterministic rank (weight desc, md5 tiebreak) —
  *    the paper's Gumbel-noise tiebreak in replayable form (a salt
  *    change re-rolls the tiebreak, which is all the noise is for
  *    when selection is top-k).
  *
  * Scale shape (100 TB): training aggregates each slice to a ≤ `dim`
  * row bucket-count table (explode → ONE combiner groupBy on an int
  * key); the dense weight table (`dim` rows) BROADCASTS to scoring,
  * which is a narrow explode → broadcast join → per-doc combiner
  * groupBy of integer partials; selection is a TakeOrdered top-n
  * (per-partition heads + one merge), never a global sort. */
object Dsir {

  val DefaultDim = 4096
  val Scale = 1000000L

  /** Token bigrams as space-joined strings (the [[TextOps]] ngram
    * guard: a short doc yields none, not a descending sequence). */
  private def bigrams(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - lit(2)),
        i => array_join(slice(t, i + lit(1), lit(2)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Per-bucket hashed-feature counts of one corpus slice:
    * (bucket, cnt). Features = unigrams ++ bigrams. */
  def featureCounts(docs: DataFrame, textCol: Column,
      dim: Int = DefaultDim): DataFrame =
    docs
      // bind tokenize to a real column BEFORE the bigram lambda — the
      // lmCoverage no-CSE-across-lambda-scopes discipline
      .withColumn("__t", tokenize(textCol))
      .select(explode(concat(col("__t"), bigrams(col("__t")))).as("__f"))
      .select(QualityClassifier.bucketOf(col("__f"), dim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** DENSE fixed-point importance weight table over all `dim` buckets:
    * `lr_fp(b) = floor(Scale * ln(((t_b+1) * (R+dim)) /
    * ((r_b+1) * (T+dim))) + 0.5)` — the add-one-smoothed target/raw
    * likelihood ratio of bucket b, where T/R are the slices' total
    * feature counts. Dense means scoring needs no unseen-bucket
    * special case: a bucket observed in neither slice carries the
    * prior ratio `ln((R+dim)/(T+dim))`, exactly as the paper's
    * smoothed models assign it. Totals attach in-plan via 1-row
    * broadcast cross joins (no driver action). Products stay exact in
    * double to ~9e15 — beyond that the ratio is still well-conditioned
    * and the quantizer unaffected. */
  def importanceWeights(target: DataFrame, raw: DataFrame,
      targetText: Column, rawText: Column,
      dim: Int = DefaultDim): DataFrame = {
    val counts = featureCounts(target, targetText, dim)
      .withColumnRenamed("cnt", "t_cnt")
      .join(featureCounts(raw, rawText, dim)
        .withColumnRenamed("cnt", "r_cnt"), Seq("bucket"), "full")
      .na.fill(0L, Seq("t_cnt", "r_cnt"))
    weightsFromCounts(target.sparkSession, counts, dim)
  }

  /** One-pass trainer for the common case where target and raw are a
    * SPLIT of one corpus (curated sources vs the rest): a single
    * tokenize + explode + combiner groupBy with conditional sums (the
    * QualityClassifier trainCounts shape) replaces
    * [[importanceWeights]]' two slice passes — the corpus is read
    * once, which at 100 TB is the difference that matters. Same
    * weight table bit-for-bit (spec-pinned). */
  def importanceWeightsSplit(docs: DataFrame, textCol: Column,
      isTarget: Column, dim: Int = DefaultDim): DataFrame = {
    val counts = docs
      .withColumn("__t", tokenize(textCol))
      .select(isTarget.as("__tgt"),
        explode(concat(col("__t"), bigrams(col("__t")))).as("__f"))
      .select(col("__tgt"), QualityClassifier.bucketOf(col("__f"), dim)
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("t_cnt"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("r_cnt"))
    weightsFromCounts(docs.sparkSession, counts, dim)
  }

  /** Shared weight tail: densify sparse (bucket, t_cnt, r_cnt) over
    * all `dim` buckets and quantize the smoothed log-ratio. The
    * sparse count table is BOUNDED by the bucket domain (≤ dim rows),
    * so it is collected once — the codebook/centroid bounded-collect
    * discipline — and the corpus pipeline behind it runs exactly ONE
    * pass (totals and densification computed in-plan would each
    * re-derive the whole tokenize/explode chain: a lazy count frame
    * referenced twice is scanned twice). The dense table comes back
    * as a local relation, which also makes its broadcast to scoring
    * free of any recompute. */
  private def weightsFromCounts(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, dim: Int): DataFrame = {
    val rows = counts.select(col("bucket").cast("long"),
        col("t_cnt").cast("long"), col("r_cnt").cast("long"))
      .collect()
    val byBucket = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tTot = rows.map(_.getLong(1)).sum
    val rTot = rows.map(_.getLong(2)).sum
    // StrictMath.log == the reproducible fdlibm value on every JVM —
    // the quantizer boundary cannot move across driver JITs
    val dense = (0 until dim).map { b =>
      val (t, r) = byBucket.getOrElse(b.toLong, (0L, 0L))
      val ratio = ((t + 1).toDouble * (rTot + dim).toDouble) /
        ((r + 1).toDouble * (tTot + dim).toDouble)
      (b.toLong, math.floor(Scale.toDouble * StrictMath.log(ratio) + 0.5).toLong)
    }
    import spark.implicits._
    dense.toDF("bucket", "lr_fp")
  }

  /** Integer importance score per document: (doc_id, n_feats, w_fp)
    * with `w_fp = Σ lr_fp` over the doc's features (the fixed-point
    * log of the product of per-feature likelihood ratios). Documents
    * with no features score (0, 0). The dense weight table broadcasts,
    * so the join always hits. */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
      weights: DataFrame, dim: Int = DefaultDim): DataFrame = {
    val per = docs
      .withColumn("__t", tokenize(textCol))
      .select(idCol.as("doc_id"),
        explode(concat(col("__t"), bigrams(col("__t")))).as("__f"))
      .select(col("doc_id"),
        QualityClassifier.bucketOf(col("__f"), dim).as("bucket"))
      .join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_fp")).as("w_fp"))
    docs.select(idCol.as("doc_id")).distinct()
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats", "w_fp"))
  }

  /** Shuffle-free scorer: the dense weight table rides the plan as ONE
    * 4096-long array literal (32 KB) and the document score folds over
    * the feature array in-row — `(doc_id, n_feats, w_fp)` from a
    * NARROW per-row transform, no explode shuffle, no aggregation
    * state. Bit-identical to [[score]] (spec-pinned). Because it is
    * stateless it also runs unchanged on a STREAMING DataFrame — the
    * selection-at-ingest door of a pipeline ([[scoreStream]]).
    * Null text scores (0, 0) like an empty document. */
  def scoreInline(docs: DataFrame, idCol: Column, textCol: Column,
      weights: Array[Long], dim: Int = DefaultDim): DataFrame = {
    require(weights.length == dim,
      s"need a dense $dim-bucket weight array, got ${weights.length}")
    val w = lit(weights)
    docs
      .withColumn("__t", tokenize(coalesce(textCol, lit(""))))
      .withColumn("__f", concat(col("__t"), bigrams(col("__t"))))
      .select(idCol.as("doc_id"),
        size(col("__f")).cast("long").as("n_feats"),
        aggregate(col("__f"), lit(0L), (acc, f) =>
          acc + element_at(w,
            (QualityClassifier.bucketOf(f, dim) + 1).cast("int")))
          .as("w_fp"))
  }

  /** [[scoreInline]] in ATTACH form: adds the integer importance score
    * as `outCol` while keeping every existing column — the shape a
    * composition wants (score × per-source token-budget mixing needs
    * source and token columns alongside the score; `scoreInline`'s
    * select would drop them). Same narrow zero-exchange fold, same
    * bind-once discipline, bit-identical w_fp (spec-pinned). */
  def withScoreInline(docs: DataFrame, textCol: Column,
      weights: Array[Long], outCol: String = "w_fp",
      dim: Int = DefaultDim): DataFrame = {
    require(weights.length == dim,
      s"need a dense $dim-bucket weight array, got ${weights.length}")
    val w = lit(weights)
    docs
      .withColumn("__dsir_t", tokenize(coalesce(textCol, lit(""))))
      .withColumn("__dsir_f", concat(col("__dsir_t"), bigrams(col("__dsir_t"))))
      .withColumn(outCol,
        aggregate(col("__dsir_f"), lit(0L), (acc, f) =>
          acc + element_at(w,
            (QualityClassifier.bucketOf(f, dim) + 1).cast("int"))))
      .drop("__dsir_t", "__dsir_f")
  }

  /** The dense weight table as the bucket-ordered long array
    * [[scoreInline]] wants (weights frames are ≤ dim rows). */
  def weightsArray(weights: DataFrame, dim: Int = DefaultDim): Array[Long] = {
    val arr = new Array[Long](dim)
    weights.select(col("bucket").cast("long"), col("lr_fp").cast("long"))
      .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Selection-at-ingest: run [[scoreInline]] over a parquet ingest
    * stream into a parquet sink (AvailableNow — the same run-to-
    * completion discipline as the embed/completion streaming jobs;
    * under a continuous trigger the identical plan runs forever,
    * since the scorer carries no state and no watermark). */
  def scoreStream(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, schema: org.apache.spark.sql.types.StructType,
      idColName: String, textColName: String, weights: Array[Long],
      outPath: String, ckptPath: String): Unit = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val q = scoreInline(
        spark.readStream.schema(schema).parquet(srcPath),
        col(idColName), col(textColName), weights)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Deterministic top-n resample of a scored frame: rank by
    * (w_fp desc, md5(doc_id:salt) asc, doc_id asc). TakeOrdered —
    * per-partition top-n heads merged once, no global sort. */
  def resampleTopN(scored: DataFrame, n: Int,
      salt: String = "dsir"): DataFrame = {
    require(n > 0, "n must be positive")
    scored.orderBy(col("w_fp").desc,
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))
        .cast("binary")).asc,
      col("doc_id").asc)
      .limit(n)
  }

  /** The paper's actual sampling rule — Gumbel top-k: rank by
    * `w_fp/Scale / temperature + g` where `g = -ln(-ln(u))` and `u`
    * is a DETERMINISTIC uniform from the md5 of (doc_id:salt) (15 hex
    * chars → (0,1) at 2^-60 resolution, never exactly 0 or 1 after
    * the +0.5 offset). Taking the top-n under Gumbel-perturbed weights
    * IS sampling n items without replacement with probability
    * ∝ exp(w/temperature) (Gumbel-max trick) — but replayable: the
    * same (corpus, salt, temperature) always draws the same sample,
    * and a salt change is a fresh draw. temperature → 0 recovers
    * [[resampleTopN]]'s greedy selection.
    *
    * SPEC-verified, off the hash contract: the perturbed key is a
    * float sum of `ln` terms (the lmPerplexity discipline — a
    * cross-engine ln can differ in the last ulp, and here the key is
    * per-ROW, so quantization can't absorb it the way the per-bucket
    * weight table does). Same TakeOrdered shape as the greedy path. */
  def resampleGumbel(scored: DataFrame, n: Int, temperature: Double,
      salt: String = "dsir"): DataFrame = {
    require(n > 0, "n must be positive")
    require(temperature > 0, "temperature must be positive")
    // (h + 0.5) / 2^60 with h in [0, 2^60): u is strictly inside (0,1)
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":" + salt)).cast("binary")), 1, 15), 16, 10).cast("double")
      + 0.5) / math.pow(2.0, 60)
    val key = col("w_fp").cast("double") / (Scale.toDouble * temperature) -
      log(-log(u))
    scored.withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col("doc_id").asc)
      .limit(n)
  }
}
