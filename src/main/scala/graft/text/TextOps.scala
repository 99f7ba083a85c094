package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import graft.functions.tokenize

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, language ID, token counting, fingerprinting.
  * All are narrow (per-row) transforms — no shuffle, fully codegen'd,
  * so they stream through a 100 TB scan at I/O speed.
  */
object TextOps {

  /** English function-word list = the reference's 33 stopwords
    * (lantern_extras/src/stemmers.rs:99-103). */
  val enStop: Seq[String] = Stemmer.stopWords.toSeq.sorted

  /** Tiny function-word lists for the n-gram/stopword language-ID
    * heuristic. Deterministic and oracle-expressible. */
  val langStop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "des", "du"),
    "es" -> Seq("el", "la", "los", "las", "es", "no", "un", "una", "del", "por"))

  /** Priority order for argmax ties (deterministic). */
  val langPriority: Seq[String] = Seq("en", "de", "es", "fr")

  /** Per-document quality metrics:
    * n_chars, n_tokens, avg_token_len, stopword_ratio, distinct_ratio.
    * A cheap proxy for the heuristics training pipelines gate on. */
  def quality(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = col("__toks")
    docs
      .withColumn("__toks", tokenize(textCol))
      .select(
        idCol.as("doc_id"),
        length(textCol).as("n_chars"),
        size(t).as("n_tokens"),
        round(
          aggregate(transform(t, x => length(x)), lit(0),
            (acc, x) => acc + x).cast("double") /
            greatest(size(t), lit(1)).cast("double"), 6)
          .as("avg_token_len"),
        round(
          size(filter(t, x => x.isin(enStop: _*))).cast("double") /
            greatest(size(t), lit(1)).cast("double"), 6)
          .as("stopword_ratio"),
        round(
          size(array_distinct(t)).cast("double") /
            greatest(size(t), lit(1)).cast("double"), 6)
          .as("distinct_ratio"))
  }

  /** Stopword-overlap language ID: count hits per language list, take
    * the argmax with [[langPriority]] tie-order; no hits -> "und". */
  def langId(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = tokenize(textCol)
    val hits: Map[String, Column] = langStop.map { case (lang, words) =>
      lang -> size(filter(t, x => x.isin(words: _*)))
    }
    val best = langPriority.map(hits)
      .reduce((a, b) => greatest(a, b))
    val pred = langPriority.foldRight(lit("und")) { (lang, elseCol) =>
      when(hits(lang) === best && best > 0, lit(lang)).otherwise(elseCol)
    }
    // foldRight gives priority to the FIRST match in langPriority order:
    // en wins ties over de, etc.
    docs.select(idCol.as("doc_id"), pred.as("lang_pred"))
  }

  /** Content fingerprints: exact-hash + min-token-hash (a 1-permutation
    * MinHash, the cheap "rolling fingerprint" analog). */
  def fingerprint(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = tokenize(textCol)
    docs.select(
      idCol.as("doc_id"),
      md5(textCol.cast("binary")).as("content_hash"),
      array_min(transform(t, x => md5(x.cast("binary")))).as("min_token_hash"))
  }

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting algorithm): positional k-gram
    * hashes, one fingerprint per w-window = the window's MINIMUM hash
    * with the RIGHTMOST position on ties (robust winnowing),
    * consecutive duplicate picks collapsed. The published guarantee:
    * any shared token run of length ≥ w + k − 1 between two documents
    * shares at least one fingerprint — and unlike set-based MinHash
    * the fingerprints carry POSITIONS, so a match localizes to the
    * overlapping span (the plagiarism/partial-overlap use case the
    * Jaccard family cannot serve).
    *
    * Hashes are [[graft.dedup.Dedup.shingleBaseHash]] (28-bit md5
    * prefix), so fingerprint buckets feed the same pairs-from-buckets
    * candidate machinery as every other dedup key. A doc with fewer
    * than w grams (but ≥ 1) yields the single global pick; shorter
    * docs yield none.
    *
    * Scale shape: entirely narrow — per-row array transforms
    * (O(grams · w) work inside one projection), then one explode; no
    * shuffle until a caller buckets the fingerprints.
    *
    * Returns (doc_id, fp_pos — the gram's 0-based token position —
    * fp_hash). */
  def winnow(docs: DataFrame, idCol: Column, textCol: Column,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "need k > 0 and w > 0")
    import graft.dedup.Dedup.shingleBaseHash
    val t = tokenize(textCol)
    // positional gram hashes (NOT distinct — winnowing is positional)
    val hs = when(size(t) >= k,
      transform(sequence(lit(0), size(t) - lit(k)),
        i => shingleBaseHash(array_join(slice(t, i + lit(1), lit(k)), " "))))
      .otherwise(array().cast("array<long>"))
    // one pick per window: min hash, rightmost position on ties — the
    // inner aggregate scans the w-slice and keeps the LAST index
    // holding the min, so later (righter) ties overwrite
    def pick(h: Column, j: Column): Column = {
      val win = slice(h, j + lit(1), lit(w))
      val minv = array_min(win)
      val rel = aggregate(sequence(lit(1), size(win)), lit(0),
        (acc, idx) => when(element_at(win, idx) === minv, idx - 1)
          .otherwise(acc))
      struct((j + rel).cast("int").as("fp_pos"), minv.as("fp_hash"))
    }
    val h = col("__hs")
    val picks = transform(sequence(lit(0), size(h) - lit(w)),
      j => pick(h, j))
    val fps = when(size(h) >= w, array_distinct(picks))
      .otherwise(when(size(h) > 0, array(pick(h, lit(0)))) // global pick
        .otherwise(array().cast("array<struct<fp_pos:int,fp_hash:bigint>>")))
    docs.select(idCol.as("doc_id"), hs.as("__hs"))
      .select(col("doc_id"), explode(fps).as("__fp"))
      .select(col("doc_id"), col("__fp.fp_pos").as("fp_pos"),
        col("__fp.fp_hash").as("fp_hash"))
  }

  /** Token counts: whitespace tokens plus the REAL byte-BPE token
    * count under the default merge table ([[Bpe.default]]) — the
    * number a training pipeline budgets with. (Round 3 shipped a
    * `ceil(chars/4)` estimate here; the round-4 review named the real
    * tokenizer as the gap, closed by [[Bpe]].) */
  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(
      idCol.as("doc_id"),
      size(tokenize(textCol)).as("n_words"),
      size(split(textCol, "\\s+")).as("n_ws_tokens"),
      graft.functions.bpe_count(textCol).as("n_bpe"))

  /** Token n-grams of `t` as space-joined strings (empty array when the
    * doc is shorter than n). The guard matters: Spark's `sequence(0,
    * size - n)` with size < n would DESCEND (0, -1, ...) and emit
    * nonsense grams instead of none. */
  private def ngrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - lit(n)),
        i => array_join(slice(t, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination (the published-practice n-gram overlap
    * filter: GPT-2/GPT-3 appendix-C style 13-gram collision checks, as
    * also implemented by public pipeline tooling like Dolma and
    * carper/lm-eval decontamination): a training document is flagged
    * when any of its token 13-grams also occurs in the held-out
    * benchmark set.
    *
    * Scale shape: the benchmark side is DISTINCT-reduced and broadcast
    * — eval benchmarks are millions of n-grams at most, while `docs`
    * is the 100 TB side, which is only scanned (narrow gram expansion,
    * then a broadcast hash semi-join; no shuffle of the corpus). The
    * per-doc hit counts (matched grams only — a tiny frame) shuffle
    * once for the groupBy, then left-join back so clean docs keep
    * n_contaminated = 0.
    *
    * Returns (doc_id, n_contaminated, contaminated). */
  def ngramDecontaminate(docs: DataFrame, bench: DataFrame,
      idCol: Column, textCol: Column, n: Int = 13): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(idCol.as("doc_id"), tokenize(textCol).as("__t"))
        .select(col("doc_id"), explode(ngrams(col("__t"), n)).as("gram"))
    val benchGrams = grams(bench).select("gram").distinct()
    val hits = grams(docs)
      .join(broadcast(benchGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_contaminated"))
    docs.select(idCol.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Corpus-wide n-gram frequency table (the input statistic for
    * tokenizer/BPE training and the corpus-level repetition reports):
    * top-k token n-grams by occurrence count, ties broken by gram text
    * so the cut is deterministic. One shuffle with map-side partial
    * aggregation (explode -> groupBy count is Spark's classic
    * combiner-friendly shape); the top-k is a tiny sorted limit. */
  def corpusNgrams(docs: DataFrame, textCol: Column, n: Int,
      k: Int): DataFrame =
    docs
      .select(tokenize(textCol).as("__t"))
      .select(explode(ngrams(col("__t"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)

  /** Deterministic stratified sampling (the data-mixing step of a
    * training pipeline: per-source/per-language keep rates): a row is
    * kept iff md5(id:salt) mod 10000 < rate(stratum) * 10000. The
    * decision is a pure function of (id, salt, rates) — reruns,
    * engines, and cluster layouts all sample the identical set, which
    * is what makes mixture experiments reproducible. A narrow filter:
    * no shuffle, streams through a 100 TB scan. Strata absent from
    * `rates` are dropped (rate 0). */
  def sampleStratified(docs: DataFrame, idCol: Column, strataCol: Column,
      rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    // md5-prefix bucket: 15 hex chars fit a non-negative long exactly,
    // and both Spark (conv) and SQL engines (hex cast) can compute it
    val bucket = conv(
      substring(md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary")),
        1, 15), 16, 10).cast("long") % 10000
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(strataCol === s, lit(r)).otherwise(acc)
    }
    // unlisted/zero-rate strata would drop via rate 0 anyway, but the
    // explicit isin PUSHES to the scan (PushedFilters: In(stratum)) —
    // the mixEpochs lesson: sampling 4 of 20 languages then reads a
    // fifth of the corpus
    val keep = rates.collect { case (s, r) if r > 0 => s }.toSeq
    docs.filter(strataCol.isin(keep: _*))
      .filter(bucket < (rateCol * 10000).cast("long"))
  }

  /** Epoch-factor mixing — source-weighted data REPETITION (the
    * LLaMA/GPT-3-style mixture table: source k is seen f_k times per
    * training run; f_k > 1 repeats the source, f_k < 1 subsamples it).
    * Each document emits floor(f) full copies plus one more iff its
    * md5 bucket (the [[sampleStratified]] idiom — fractional parts in
    * exact multiples of 1/10000) falls under frac(f), so a source's
    * expected copy count per document is exactly f, the extra copies
    * are a pure function of (id, salt) — reruns, engines and cluster
    * layouts expand the identical multiset — and growing f only ever
    * ADDS copies. Sources absent from `epochs` drop (factor 0).
    *
    * Scale shape: one narrow scan — a CASE lookup of the handful of
    * factors, the md5 bucket, and an explode of a ≤ ceil(f)-element
    * sequence; no shuffle, no join, no window. Downstream packing /
    * shuffling sees `epoch` = 1..copies alongside the input columns
    * (so copy k of a document stays distinguishable for curriculum
    * ordering or per-epoch salting). */
  def mixEpochs(docs: DataFrame, idCol: Column, sourceCol: Column,
      epochs: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(epochs.values.forall(f => f >= 0), "epoch factors must be >= 0")
    // tolerance-validated: exact float arithmetic would falsely reject
    // on-grid factors like 1.1 ((1.1-1.0)*10000 = 1000.0000000000009);
    // thr below uses the same math.round this check guards
    require(epochs.values.forall { f =>
      val frac = (f - math.floor(f)) * 10000
      math.abs(frac - math.round(frac)) < 1e-6
    }, "fractional epoch parts must be exact multiples of 1/10000")
    val whole = epochs.foldLeft(lit(0L)) { case (acc, (s, f)) =>
      when(sourceCol === s, lit(math.floor(f).toLong)).otherwise(acc)
    }
    val thr = epochs.foldLeft(lit(0L)) { case (acc, (s, f)) =>
      when(sourceCol === s,
        lit(math.round((f - math.floor(f)) * 10000))).otherwise(acc)
    }
    val bucket = conv(
      substring(md5(concat(idCol.cast("string"), lit(":" + salt))
        .cast("binary")), 1, 15), 16, 10).cast("long") % 10000
    docs
      // unlisted (and factor-0) sources would drop via copies = 0
      // anyway, but the explicit isin PUSHES to the scan
      // (PushedFilters: In(source)) — listing 4 of 20 sources then
      // reads a fifth of the corpus; a factor-0.0 entry contributes
      // nothing, so it must not widen the scan either
      .filter(sourceCol.isin(
        epochs.collect { case (s, f) if f > 0 => s }.toSeq: _*))
      .withColumn("__copies", whole + when(bucket < thr, 1L).otherwise(0L))
      .filter(col("__copies") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Exact per-source budget mixing (the mixture-scheduling step: a
    * training run wants EXACTLY n_k documents from source k, not a
    * probabilistic ~rate fraction — [[sampleStratified]] is the rate
    * form, this is the count form): within each source, rows rank by
    * md5(id:salt) with the id as tiebreak, and the `budgets(source)`
    * lowest-ranked rows are kept. The ranking is a pure function of
    * (id, salt), so reruns, engines, and cluster layouts pick the
    * identical set, and growing a source's corpus only ever swaps
    * members in rank order — never reshuffles the kept set wholesale.
    *
    * Scale shape: a training mixture has a HANDFUL of sources, so a
    * rank window partitioned on the source alone would pour every row
    * of a source through one reducer's sort (~corpus/k rows on a
    * single task at any cluster size). Instead the rank is computed
    * in two bounded phases keyed by `block` = the first
    * `blockHexChars` hex chars of the md5 rank key — a PREFIX of the
    * sort key, so block order is consistent with rank order, and
    * uniformly distributed by construction (md5): (1) per-(source,
    * block) row totals roll into an exclusive running prefix over a
    * tiny #sources·16^blockHexChars-row frame (the same per-block
    * totals discipline as [[packSequences]]); (2) rows rank LOCALLY
    * within their (source, block) window — ~sourceRows/4096 per task
    * at the default — and add their block's prefix. Blocks whose
    * prefix already meets the budget are filtered BEFORE the rank
    * window, so only ~budget rows (plus one straddling block per
    * source) are ever sorted, regardless of corpus size. Sources
    * absent from `budgets` are dropped (budget 0).
    *
    * Returns the kept rows with their (source, rank). */
  /** The deterministic per-row rank key the budget mix sorts by — ONE
    * definition, shared with callers that pre-aggregate block counts
    * ([[mixToBudget]]'s `knownBlockCounts`) so the fold and the
    * in-plan key can never drift. */
  def mixRankKey(idCol: Column, salt: String): Column =
    md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))

  /** The block key (a PREFIX of [[mixRankKey]]) for the same callers. */
  def mixBlockCol(idCol: Column, salt: String, blockHexChars: Int = 3): Column =
    substring(mixRankKey(idCol, salt), 1, blockHexChars)

  def mixToBudget(docs: DataFrame, idCol: Column, sourceCol: Column,
      budgets: Map[String, Long], salt: String = "graft",
      blockHexChars: Int = 3,
      knownBlockCounts: Option[Seq[(String, String, Long)]] = None)
      : DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(blockHexChars >= 1 && blockHexChars <= 8,
      "blockHexChars must be in [1, 8]")
    import org.apache.spark.sql.expressions.Window
    val rankKey = mixRankKey(idCol, salt)
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, n)) =>
      when(sourceCol === s, lit(n)).otherwise(acc)
    }
    // unlisted/zero-budget sources would drop via budget 0 anyway, but
    // the explicit isin PUSHES to the scan (PushedFilters: In(source))
    // — without it their rows flow through the block aggregate and the
    // prefix join before dropping (the mixEpochs lesson)
    val keepSrcs = budgets.collect { case (s, n) if n > 0 => s }.toSeq
    val base = docs
      .filter(sourceCol.isin(keepSrcs: _*))
      .withColumn("__src", sourceCol)
      .withColumn("__budget", budgetCol)
      .withColumn("__rk", rankKey)
      .withColumn("__blk", substring(col("__rk"), 1, blockHexChars))
    // exclusive prefix over per-(source, block) totals: the one
    // per-source-partitioned window, on a frame of at most
    // #sources·16^blockHexChars rows — never corpus-sized. A caller
    // that already collected the per-(source, block) counts (e.g. a
    // quota derivation over the same frame — clusterBalance) hands
    // them in and the prefix becomes a driver-built local relation:
    // one pass over `docs` instead of two (§5 action-fold). The
    // driver arithmetic is the window's, exactly: long totals, blocks
    // in ascending string order (hex chars sort identically in
    // java.lang.String and UTF8String), exclusive running sum.
    val prefixes = knownBlockCounts match {
      case Some(counts) =>
        val rows = counts.groupBy(_._1).toSeq.flatMap { case (src, blks) =>
          var run = 0L
          blks.sortBy(_._2).map { case (_, blk, tot) =>
            val p = (src, blk, run); run += tot; p
          }
        }
        import docs.sparkSession.implicits._
        rows.toDF("__src", "__blk", "__prefix")
      case None =>
        val wPrefix = Window.partitionBy(col("__src")).orderBy(col("__blk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.groupBy(col("__src"), col("__blk"))
          .agg(count(lit(1)).as("__tot"))
          .withColumn("__prefix",
            coalesce(sum(col("__tot")).over(wPrefix), lit(0L)))
          .select(col("__src"), col("__blk"), col("__prefix"))
    }
    // local rank within (source, block): block is a prefix of the md5
    // sort key, so prefix + local rank IS the global per-source rank
    val wLocal = Window.partitionBy(col("__src"), col("__blk"))
      .orderBy(col("__rk").asc, idCol.asc)
    base
      .join(broadcast(prefixes), Seq("__src", "__blk"))
      .filter(col("__prefix") < col("__budget"))
      .withColumn("__lrank", row_number().over(wLocal))
      .withColumn("mix_rank", col("__prefix") + col("__lrank").cast("long"))
      .filter(col("mix_rank") <= col("__budget"))
      .drop("__src", "__blk", "__rk", "__budget", "__prefix", "__lrank")
  }

  /** Temperature-scaled source quotas — the mT5/XLM-R alpha-sampling
    * mixture rule (Xue et al. 2021 §3.1; Conneau et al. 2020 §3.1):
    * source k with n_k documents gets a share ∝ n_k^alpha of the total
    * budget, flattening head sources and boosting tails (alpha = 1 is
    * proportional, alpha = 0 uniform; mT5 ships 0.3, XLM-R 0.7, and
    * 0.5 is this engine's contract value). Shares become integer
    * quotas summing to EXACTLY `total` by largest-remainder (Hamilton)
    * apportionment.
    *
    * Engine-replayable by construction: weights quantize to integers
    * FIRST — `wq_k = floor(alphaWeight(n_k) * 2^20 + 0.5)`, where the
    * power-of-two scaling is exact and alpha = 0.5 evaluates via
    * `sqrt` (correctly rounded per IEEE 754 in every engine) — so the
    * weight total, the base quotas `(total * wq_k) div W`, and the
    * remainder ranking `(total * wq_k) mod W` are ALL integer
    * arithmetic: no float sum whose order could differ across engines
    * or partitionings. Other alphas go through `pow` (last-ulp
    * caveat, the lmPerplexity discipline — keep them off hash
    * contracts). `total * wq_k` must stay under 2^63: wq_k ≈ 2^20 ·
    * n_k^alpha, so budgets into the billions are safe at any corpus.
    *
    * Driver-side on purpose: the counts aggregate to #sources rows (a
    * training mixture has a handful of sources — the bounded-collect
    * discipline), and the quotas feed [[mixToBudget]]'s budget map.
    * Returns (source, quota) sorted by source. */
  def temperatureQuotas(docs: DataFrame, sourceCol: Column, alpha: Double,
      total: Long): Seq[(String, Long)] = {
    require(alpha >= 0, "alpha must be non-negative")
    require(total >= 0, "total must be non-negative")
    // cast to string up front (int source ids work; a raw getString
    // on them would die with an opaque ClassCastException) and drop
    // null strata — mixToBudget's budget map cannot address them
    val counts = docs
      .select(sourceCol.cast("string").as("__src"))
      .filter(col("__src").isNotNull)
      .groupBy(col("__src"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    temperatureQuotasFromCounts(counts, alpha, total)
  }

  /** The pure apportionment arithmetic of [[temperatureQuotas]], for
    * callers that already hold the per-source counts (a fold over a
    * shared aggregate — [[graft.operators.Clustering.balanceWithCentroids]]
    * collects per-(cluster, block) counts ONCE and derives quotas and
    * the mix's block prefixes from the same rows). Integer arithmetic
    * identical to the frame path for any count order. */
  def temperatureQuotasFromCounts(counts0: Seq[(String, Long)],
      alpha: Double, total: Long): Seq[(String, Long)] = {
    require(alpha >= 0, "alpha must be non-negative")
    require(total >= 0, "total must be non-negative")
    val counts = counts0.sortBy(_._1)
    if (counts.isEmpty || total == 0)
      return counts.map { case (s, _) => (s, 0L) }
    val wq = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      (s, math.floor(w * 1048576.0 + 0.5).toLong)
    }
    val wTot = wq.map(_._2).sum
    require(wq.forall(p => p._2 <= Long.MaxValue / math.max(total, 1L)),
      "total * weight overflows — lower the budget or the corpus skew")
    val base = wq.map { case (s, w) => (s, total * w / wTot, total * w % wTot) }
    val leftover = total - base.map(_._2).sum
    val bump = base.sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (s, b, _) => (s, b + (if (bump(s)) 1L else 0L)) }
  }

  /** Temperature-based budget mixing end to end: derive
    * [[temperatureQuotas]] and keep each source's quota by
    * [[mixToBudget]]'s blocked deterministic rank. The alpha-sampling
    * step of a multilingual/multi-source pretraining mix as one call. */
  def mixByTemperature(docs: DataFrame, idCol: Column, sourceCol: Column,
      alpha: Double, total: Long, salt: String = "graft",
      blockHexChars: Int = 3): DataFrame = {
    // action fold (§5, the balanceWithCentroids discipline): ONE
    // collect of the per-(source, block) counts feeds both the quota
    // apportionment and the mix's block prefixes, so the call scans
    // `docs` twice (decide, then rank+keep) instead of three times.
    // Bounded by #sources·16^blockHexChars rows; the driver-side
    // arithmetic is the in-plan window's exactly (both code paths are
    // shared with the frame path via temperatureQuotasFromCounts /
    // knownBlockCounts).
    val blkCounts = docs
      .select(sourceCol.as("__src"),
        mixBlockCol(idCol, salt, blockHexChars).as("__blk"))
      .groupBy(col("__src"), col("__blk"))
      .agg(count(lit(1)).as("__tot"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val srcCounts = blkCounts.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
    mixToBudget(docs, idCol, sourceCol,
      temperatureQuotasFromCounts(srcCounts, alpha, total).toMap, salt,
      blockHexChars, knownBlockCounts = Some(blkCounts))
  }

  /** Token-budget mixing — [[mixToBudget]] generalized from document
    * counts to token (or any non-negative integer weight) budgets: a
    * training run wants n_k TOKENS from source k, the unit compute
    * actually bills in. Within each source, rows rank by the same
    * md5(id:salt) key; a row is kept iff the EXCLUSIVE cumulative
    * token count of the rows ranked before it is still below the
    * budget — so the straddling document is kept (the mix overshoots
    * by at most one document, never undershoots), and a source's
    * first document is always kept while its budget is positive.
    *
    * Scale shape: the same blocked two-phase rank as [[mixToBudget]]
    * — per-(source, block) token AND row totals roll into exclusive
    * running prefixes over the tiny #sources·16^blockHexChars frame;
    * blocks whose token prefix already meets the budget are filtered
    * BEFORE the rank window; surviving rows take a LOCAL rank and
    * exclusive token cumsum in one WindowExec (both windows share the
    * (source, block) partitioning) and add their block's prefixes.
    * Only ~budget-worth of rows is ever sorted, at any corpus size.
    *
    * `tokCol` must be non-negative and non-null — a null would
    * poison the running sums, so it fails loudly in-plan (beware
    * `size(tokenize(null))` = -1 under legacy sizeOfNull). Returns
    * kept rows plus (n_tokens, tok_prefix, mix_rank): tok_prefix =
    * tokens ranked strictly before the row (so `tok_prefix <
    * budget(source)` characterizes the kept set), mix_rank = the
    * per-source rank. */
  def mixToTokenBudget(docs: DataFrame, idCol: Column, sourceCol: Column,
      tokCol: Column, budgets: Map[String, Long], salt: String = "graft",
      blockHexChars: Int = 3): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(blockHexChars >= 1 && blockHexChars <= 8,
      "blockHexChars must be in [1, 8]")
    import org.apache.spark.sql.expressions.Window
    val rankKey = md5(concat(idCol.cast("string"), lit(":" + salt))
      .cast("binary"))
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, n)) =>
      when(sourceCol === s, lit(n)).otherwise(acc)
    }
    val guardedTok = when(tokCol.isNull || tokCol < 0,
      raise_error(concat(lit("mixToTokenBudget: null or negative token "
        + "count for id "), idCol.cast("string"))))
      .otherwise(tokCol.cast("long"))
    // scan-pushed source subset (the mixEpochs lesson; see mixToBudget)
    val keepSrcs = budgets.collect { case (s, n) if n > 0 => s }.toSeq
    val base = docs
      .filter(sourceCol.isin(keepSrcs: _*))
      .withColumn("__src", sourceCol)
      .withColumn("__budget", budgetCol)
      .withColumn("__rk", rankKey)
      .withColumn("__blk", substring(col("__rk"), 1, blockHexChars))
      .withColumn("__tok", guardedTok)
    val wPrefix = Window.partitionBy(col("__src")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy(col("__src"), col("__blk"))
      .agg(sum(col("__tok")).as("__ttot"), count(lit(1)).as("__ctot"))
      .withColumn("__tprefix",
        coalesce(sum(col("__ttot")).over(wPrefix), lit(0L)))
      .withColumn("__cprefix",
        coalesce(sum(col("__ctot")).over(wPrefix), lit(0L)))
      .select(col("__src"), col("__blk"), col("__tprefix"), col("__cprefix"))
    val wLocal = Window.partitionBy(col("__src"), col("__blk"))
      .orderBy(col("__rk").asc, idCol.asc)
    base
      .join(broadcast(prefixes), Seq("__src", "__blk"))
      .filter(col("__tprefix") < col("__budget"))
      .withColumn("__lrank", row_number().over(wLocal))
      .withColumn("__lcum", coalesce(sum(col("__tok"))
        .over(wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_tokens", col("__tok"))
      .withColumn("tok_prefix", col("__tprefix") + col("__lcum"))
      .withColumn("mix_rank", col("__cprefix") + col("__lrank").cast("long"))
      .filter(col("tok_prefix") < col("__budget"))
      .drop("__src", "__blk", "__rk", "__budget", "__tok", "__tprefix",
        "__cprefix", "__lrank", "__lcum")
  }

  /** Importance-ranked token-budget mixing — [[mixToTokenBudget]] with
    * the rank order (score desc, md5(id:salt) asc, id asc) instead of
    * the bare md5 shuffle: a selection pipeline keeps each source's
    * TOP-importance documents until the source's token budget is
    * exhausted (DSIR-score × token-budget composition — Xie et al.
    * 2023 selection inside a per-source compute bill). Same
    * kept-set characterization: a row is kept iff the exclusive token
    * total of rows ranked before it is below the budget, so the
    * straddling document is kept and overshoot is ≤ 1 document.
    *
    * Scale shape — the blocked two-phase rank generalized from md5
    * prefixes to SCORE blocks: the md5 block trick needs the block to
    * be a monotone function of the leading sort key, which is now the
    * score, so blocks come from per-source score thresholds
    * (approx-percentile boundaries, ONE bounded #sources×`nBlocks`-row
    * aggregate broadcast back); `__blk` = how many thresholds sit
    * strictly above the row's score — monotone non-increasing in the
    * score BY VALUE, so equal scores share a block and block order is
    * rank order. Correctness does NOT depend on where the thresholds
    * land (any monotone blocking yields identical output — prefix +
    * local rank IS the global rank); balance does, which is what the
    * percentile boundaries buy. Blocks whose exclusive token prefix
    * already meets the budget are pruned BEFORE the rank window; both
    * local windows share the (source, block) partitioning.
    *
    * The operator makes TWO passes over `docs` (thresholds, then the
    * selection) — pass a persisted/cached scored frame at corpus
    * scale, the pipeline shape that stores scores once and mixes many
    * ways. `scoreCol` must be integral and non-null (fail-loud
    * in-plan, the [[mixToTokenBudget]] token guard applied to both
    * inputs). Returns kept rows + (n_tokens, tok_prefix, mix_rank). */
  def mixToTokenBudgetByScore(docs: DataFrame, idCol: Column,
      sourceCol: Column, tokCol: Column, scoreCol: Column,
      budgets: Map[String, Long], salt: String = "graft",
      nBlocks: Int = 256): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(nBlocks >= 2 && nBlocks <= 65536, "nBlocks must be in [2, 65536]")
    import org.apache.spark.sql.expressions.Window
    val rankKey = md5(concat(idCol.cast("string"), lit(":" + salt))
      .cast("binary"))
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, n)) =>
      when(sourceCol === s, lit(n)).otherwise(acc)
    }
    val guardedTok = when(tokCol.isNull || tokCol < 0,
      raise_error(concat(lit("mixToTokenBudgetByScore: null or negative "
        + "token count for id "), idCol.cast("string"))))
      .otherwise(tokCol.cast("long"))
    val guardedScore = when(scoreCol.isNull,
      raise_error(concat(lit("mixToTokenBudgetByScore: null score for id "),
        idCol.cast("string"))))
      .otherwise(scoreCol.cast("long"))
    // sources with no budget never reach the threshold aggregate or
    // the windows (budget 0 drops everything downstream anyway); the
    // isin form PUSHES to a file scan when the input is one (a CASE-
    // derived `__budget > 0` cannot reach PushedFilters)
    val keepSrcs = budgets.collect { case (s, n) if n > 0 => s }.toSeq
    val base = docs
      .filter(sourceCol.isin(keepSrcs: _*))
      .withColumn("__src", sourceCol)
      .withColumn("__budget", budgetCol)
      .withColumn("__sc", guardedScore)
      .withColumn("__rk", rankKey)
      .withColumn("__tok", guardedTok)
    // per-source score block boundaries: one bounded aggregate
    // (#sources rows × nBlocks-1 thresholds), broadcast back. The
    // boundaries only BALANCE the blocks — output is exact wherever
    // they land — so approx percentiles are enough.
    val probs = array((1 until nBlocks)
      .map(i => lit(i.toDouble / nBlocks)): _*)
    val thresholds = base.groupBy(col("__src"))
      .agg(percentile_approx(col("__sc"), probs, lit(1000)).as("__thr"))
    val wPrefix = Window.partitionBy(col("__src")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLocal = Window.partitionBy(col("__src"), col("__blk"))
      .orderBy(col("__sc").desc, col("__rk").asc, idCol.asc)
    val blocked = base
      .join(broadcast(thresholds), Seq("__src"))
      // block = #thresholds strictly above the score: the TOP scores
      // land in block 0, equal scores share a block, and block order
      // is (score desc) order — the monotonicity the two-phase rank
      // requires
      .withColumn("__blk",
        size(filter(col("__thr"), t => t > col("__sc"))))
      .drop("__thr")
    val prefixes = blocked.groupBy(col("__src"), col("__blk"))
      .agg(sum(col("__tok")).as("__ttot"), count(lit(1)).as("__ctot"))
      .withColumn("__tprefix",
        coalesce(sum(col("__ttot")).over(wPrefix), lit(0L)))
      .withColumn("__cprefix",
        coalesce(sum(col("__ctot")).over(wPrefix), lit(0L)))
      .select(col("__src"), col("__blk"), col("__tprefix"), col("__cprefix"))
    blocked
      .join(broadcast(prefixes), Seq("__src", "__blk"))
      .filter(col("__tprefix") < col("__budget"))
      .withColumn("__lrank", row_number().over(wLocal))
      .withColumn("__lcum", coalesce(sum(col("__tok"))
        .over(wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_tokens", col("__tok"))
      .withColumn("tok_prefix", col("__tprefix") + col("__lcum"))
      .withColumn("mix_rank", col("__cprefix") + col("__lrank").cast("long"))
      .filter(col("tok_prefix") < col("__budget"))
      .drop("__src", "__blk", "__sc", "__rk", "__budget", "__tok",
        "__tprefix", "__cprefix", "__lrank", "__lcum")
  }

  /** Overlapping token-window document chunking — the fan-out step in
    * front of an embedding/RAG pipeline (documents are embedded as
    * fixed-size windows, not whole): tokens are cut into windows of
    * `size` tokens starting every `stride` tokens, so consecutive
    * chunks share `size - stride` tokens of context. A document with
    * n ≤ size tokens yields exactly one chunk; otherwise
    * ⌈(n − size) / stride⌉ + 1 chunks, the last one ending at the
    * document's final token (short by up to stride−1 only when the
    * text runs out).
    *
    * Scale shape: tokenize → sequence → explode is entirely narrow —
    * a per-row fan-out with no shuffle, streaming through a 100 TB
    * scan; output order inside a partition follows input order, so
    * downstream per-doc grouping is a cheap local sort.
    *
    * Returns (doc_id, chunk_id, n_tokens, chunk_text). */
  def chunkDocs(docs: DataFrame, idCol: Column, textCol: Column,
      size: Int = 64, stride: Int = 48): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val n = F.size(col("__t")).cast("long")
    val nChunks = when(n <= size, lit(1L))
      .otherwise(floor((n - size + stride - 1) / stride).cast("long") + 1)
    docs
      .select(idCol.as("doc_id"), tokenize(textCol).as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      // bind the slice once per output row (same evaluate-once concern
      // as Dedup.bindOnce — two inline slices would copy the sub-array
      // twice)
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__t"), (col("chunk_id") * stride + 1).cast("int"),
          lit(size)).as("__chunk"))
      .select(col("doc_id"), col("chunk_id"),
        F.size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Top-k TF-IDF keywords per document — the lightweight keyword /
    * topic-tag extraction step of a corpus pipeline (faceting, domain
    * labeling, weak supervision). IDF is the engine's BM25 idf
    * ([[graft.bm25.Bm25.idf]] — same smoothing, one formula across the
    * retrieval and tagging surfaces); score = tf · idf rounded to 6dp
    * BEFORE ranking so the rank order is reproducible across engines
    * (ln is not correctly-rounded; the rounding absorbs last-ulp
    * library differences). Ties break on the term.
    *
    * Scale shape: tf is one combiner-friendly groupBy on (doc, term);
    * document frequency reuses that frame with a groupBy on term; the
    * idf join dispatch is ADAPTIVE (the
    * [[graft.operators.Percentiles]] discipline): a one-row HLL
    * distinct-term probe over the tokenize lineage — one
    * map-side-combined pass, no exact distinct — BROADCASTS dfreq
    * while the vocabulary fits
    * `graft.tfidf.maxBroadcastTerms` (default 1M; the term key is
    * skewed by construction — a shuffled join pours ~nDocs "the" rows
    * through one reducer, so the broadcast removes the hot-term
    * hazard outright, not just AQE-mitigates it), and falls back to
    * the shuffled join under AQE skew splitting on a raw web corpus
    * whose typo/URL/number vocabulary outgrows the broadcast (prune
    * low-df terms first to shrink it back by orders of magnitude).
    * Catalyst sizeInBytes is NOT consulted: Generate and Aggregate
    * pass child sizes through in the non-CBO visitor, so the
    * dfreq frame's estimate bounds nothing in either direction —
    * only an exact rowCount (CBO) skips the probe. Pass
    * `broadcastDfreq = Some(b)` to pin the arm probe-free. The
    * top-k rank windows on doc_id. `docCount < 0` counts the corpus
    * (metadata-only on a file scan) — pass the known count to skip
    * it.
    *
    * `knownTerms`: the caller's distinct-term count for the corpus,
    * when it maintains one (the [[graft.operators.Percentiles]]
    * `knownRows` discipline, extended to this dispatch's sibling
    * probe): a standing BM25 postings table IS a vocabulary count —
    * one row per term (reference: lantern_extras/src/bm25_api.sql:
    * 33-45 materializes exactly that table), and its row count is a
    * metadata read where the probe is a full re-tokenize of the
    * corpus lineage. A non-negative `knownTerms` routes probe-free at
    * BOTH extremes: `<= maxBroadcastTerms` broadcasts, above it
    * shuffles. Exact counts get no HLL headroom deflation — only the
    * ~5%-rsd probe estimate is compared against a 10%-deflated cap,
    * because the probe's error in the optimistic direction would buy
    * an oversized broadcast (the dangerous arm) where an
    * overestimate merely lands on the always-safe shuffled join.
    *
    * Determinism note: the 6dp pre-round absorbs last-ulp ln()
    * differences except when the true score sits within ~1 ulp of a
    * 0.5e-6 rounding boundary — the guarantee is probabilistic (and
    * has held bit-exact across JVM/DuckDB at every tested sf), not
    * absolute; a harness wanting an absolute guarantee should compare
    * (score, term) with a tolerance.
    *
    * Returns (doc_id, rank, term, score). */
  def tfidfKeywords(docs: DataFrame, idCol: Column, textCol: Column,
      k: Int = 3, docCount: Long = -1L,
      broadcastDfreq: Option[Boolean] = None,
      knownTerms: Long = -1L): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = docs
      .select(idCol.as("doc_id"), explode(tokenize(textCol)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency re-aggregates the tf frame — THROUGH a no-op
    // tf >= 1 predicate (count(1) of a group is always >= 1). The
    // filter is load-bearing for plan REUSE, not semantics: without a
    // reference to the count, ColumnPruning drops tf's aggregate from
    // this branch and collapses it to distinct(doc, term) — a
    // canonically DIFFERENT exchange subtree, so ReuseExchange misses
    // and the corpus is tokenized twice per query (measured: the two
    // Generate+partial-aggregate passes were the row's dominant cost).
    // Referencing tf keeps both branches' inner exchanges canonically
    // equal and the whole tokenize+partial-agg pipeline runs ONCE
    // (guide §2.1 exchange reuse).
    val dfreq = tf.filter(col("tf") >= 1)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val maxTerms =
      graft.GraftConf.tfidfMaxBroadcastTerms(docs.sparkSession)
    // resolve (docCount, arm) cheaply: a pinned arm costs no probe;
    // the adaptive probe is ONE map-side-combined HLL aggregate over
    // the exploded terms, ONE row collected (audited bounded
    // collect). The doc count stays a separate docs.count() —
    // metadata-only on a parquet scan, and MEASURED cheaper than
    // folding an exact count_distinct(id) into the probe (the
    // combined aggregate plans an Expand ×2 over the exploded frame
    // plus an id-keyed shuffle: +3.5 s at sf10 against a ~0 s
    // metadata count; the fold was the wrong economy).
    val n = if (docCount >= 0) docCount else docs.count()
    val useBroadcast: Boolean = broadcastDfreq match {
      case Some(b) => b
      case None if maxTerms <= 0 => false
      // caller-supplied vocabulary count: exact, so compared against
      // the full cap, and probe-free in BOTH directions
      case None if knownTerms >= 0 => knownTerms <= maxTerms
      case None if dfreq.queryExecution.optimizedPlan.stats.rowCount
          .exists(_ <= maxTerms) => true
      case None =>
        // HLL estimate (default ~5% rsd) vs a 10%-DEFLATED cap: an
        // optimistic estimate must not buy the oversized broadcast —
        // a vocabulary modestly above the cap lands on the shuffled
        // join, whose only cost is the AQE-mitigated skew, not memory
        docs.select(explode(tokenize(textCol)).as("term"))
          .agg(approx_count_distinct(col("term")).as("__v"))
          .collect()(0).getLong(0) <= maxTerms - maxTerms / 10
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(if (useBroadcast) broadcast(dfreq) else dfreq, "term")
      .withColumn("score",
        round(col("tf") * graft.bm25.Bm25.idf(lit(n.toDouble), col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** Per-source (domain) corpus report — the statistic behind domain
    * filtering and mixture weighting in public pipelines (C4's
    * blocklists, RefinedWeb/Dolma per-domain caps): for each source,
    * document count, average length, language spread, and the fraction
    * of its docs that share at least one [[graft.dedup.Dedup.lineDedup
    * line]] with another document (a domain whose content is mostly
    * cross-site boilerplate shows up as high dup_frac and gets
    * down-weighted).
    *
    * Scale shape: the line-duplication flags come from the lineDedup
    * shuffles (16-byte line-hash keys); the per-source rollup is one
    * combiner-friendly groupBy over few distinct sources.
    *
    * Returns (source, n_docs, avg_chars, n_langs, dup_frac). */
  def domainStats(docs: DataFrame, idCol: Column, sourceCol: Column,
      textCol: Column, langCol: Column, chunk: Int = 8): DataFrame = {
    val dup = graft.dedup.Dedup.lineDedup(docs, idCol, textCol, chunk)
      .select(col("doc_id"), (col("n_dup_lines") > 0).as("__has_dup"))
    docs.select(idCol.as("doc_id"), sourceCol.as("source"),
        langCol.as("lang"), length(textCol).as("__len"))
      .join(dup, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("__len")), 6).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"),
        round(avg(when(col("__has_dup"), 1.0).otherwise(0.0)), 6)
          .as("dup_frac"))
  }

  /** Email-address pattern shared by [[cleanText]] and its oracle; the
    * character classes are RE2-safe so DuckDB applies the identical
    * regex. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** URL pattern: scheme + non-space run. */
  val urlRe = "https?://[^ \\t\\n]+"

  /** PII patterns shared by [[redactPii]] and its oracle. All are in
    * the RE2 ∩ java.util.regex common subset (no lookaround, no
    * backreferences, ASCII `\b` / `\d` only), so DuckDB replays them
    * byte-identically. Heuristic by design — the goal is the redaction
    * PASS every public pipeline ships (Dolma, ROOTS), not a validator. */
  /** 16-digit card-shaped run in 4-digit groups (space/dash/none). */
  val ccRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"
  /** US SSN shape NNN-NN-NNNN. */
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  /** Dotted-quad IPv4 (no octet range check — redaction, not parsing). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Separator-delimited phone: optional +CC, (NNN) or NNN, NNN, NNNN.
    * No leading `\b` — it cannot sit between ' ' and '+' (both
    * non-word); the separator structure already anchors the left edge. */
  val phoneRe = "(\\+\\d{1,2} )?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Text cleaning / PII scrubbing (the normalize-and-redact pass every
    * public pipeline runs before dedup and filtering — C4 and Dolma
    * both ship exactly this shape): URLs and email addresses are
    * replaced with typed placeholder tokens, control characters
    * dropped, whitespace runs collapsed to single spaces, and the
    * result trimmed. Counts of each redaction come along so downstream
    * filters can gate on them (e.g. drop docs that were mostly URLs).
    *
    * URL redaction runs FIRST: an email-shaped substring inside a URL
    * (http://a@b.com/x) belongs to the URL. A narrow per-row transform
    * — no shuffle, streams through a 100 TB scan at I/O speed.
    *
    * Returns (doc_id, text_clean, n_urls, n_emails). */
  def cleanText(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val noCtl = regexp_replace(textCol, "[\\x00-\\x1F\\x7F]", " ")
    val noUrl = regexp_replace(noCtl, urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    val collapsed = trim(regexp_replace(noEmail, "[ \\t\\n]+", " "))
    docs.select(
      idCol.as("doc_id"),
      collapsed.as("text_clean"),
      regexp_count(noCtl, lit(urlRe)).as("n_urls"),
      regexp_count(noUrl, lit(emailRe)).as("n_emails"))
  }

  /** PII redaction (the identifier-scrubbing pass corpus pipelines run
    * alongside [[cleanText]] — Dolma and ROOTS both ship one): card
    * numbers, SSNs, IPv4 addresses, phone numbers and email addresses
    * are replaced with typed placeholder tokens, with per-category
    * counts for downstream gating (e.g. drop docs with > k identifiers
    * — documents dense in PII are usually scraped directories, not
    * prose). Most-specific patterns run first so a 16-digit card run is
    * never half-eaten as a phone number, and an address inside an
    * already-redacted span cannot double-count.
    *
    * A narrow per-row transform — no shuffle, streams through a 100 TB
    * scan at I/O speed, exactly like [[cleanText]].
    *
    * Returns (doc_id, text_redacted, n_cc, n_ssn, n_ip, n_phone,
    * n_email). */
  def redactPii(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val noCc = regexp_replace(textCol, ccRe, "<CC>")
    val noSsn = regexp_replace(noCc, ssnRe, "<SSN>")
    val noIp = regexp_replace(noSsn, ipv4Re, "<IP>")
    val noPhone = regexp_replace(noIp, phoneRe, "<PHONE>")
    val noEmail = regexp_replace(noPhone, emailRe, "<EMAIL>")
    docs.select(
      idCol.as("doc_id"),
      noEmail.as("text_redacted"),
      regexp_count(textCol, lit(ccRe)).as("n_cc"),
      regexp_count(noCc, lit(ssnRe)).as("n_ssn"),
      regexp_count(noSsn, lit(ipv4Re)).as("n_ip"),
      regexp_count(noIp, lit(phoneRe)).as("n_phone"),
      regexp_count(noPhone, lit(emailRe)).as("n_email"))
  }

  /** Sequence packing (the concat-and-chunk step that turns a tokenized
    * corpus into fixed-length training sequences): every document gets
    * its global token offset in doc-id order plus the range of
    * `seqLen`-token training sequences it lands in — documents straddle
    * sequence boundaries, exactly like LM pretraining's "concatenate
    * everything, split every seqLen tokens" packing.
    *
    * Scale shape: a global-order running sum over one window would move
    * the ENTIRE corpus to a single partition (Spark warns exactly
    * that). Instead the prefix sum is computed in two bounded phases
    * keyed by `block` = doc_id div `blockSize` (monotonic in doc_id, a
    * pure function — no sampling pass, no partition-id capture, fully
    * deterministic): (1) a running sum WITHIN each block (window
    * partitioned by block — partition-sized state), (2) an exclusive
    * prefix over the per-block totals, a #blocks-row frame (corpus
    * rows / blockSize — the one intentionally tiny global window),
    * broadcast-joined back. One shuffle for the block window, one
    * map-side-combined agg for the totals.
    *
    * Returns (doc_id, n_tokens, start_offset, first_seq, last_seq,
    * n_seqs). */
  def packSequences(docs: DataFrame, idCol: Column, textCol: Column,
      seqLen: Int, blockSize: Long = 1 << 20,
      tokenCount: Column => Column = c => size(tokenize(c)).cast("long"))
      : DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(idCol.as("doc_id"),
        tokenCount(textCol).cast("long").as("n_tokens"))
      .withColumn("__blk", expr(s"doc_id div ${blockSize}L"))
    val inBlock = Window.partitionBy(col("__blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockPrefix = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy(col("__blk"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__prefix",
        coalesce(sum(col("__tot")).over(blockPrefix), lit(0L)))
      .select(col("__blk"), col("__prefix"))
    base
      .withColumn("__cum", sum(col("n_tokens")).over(inBlock))
      .join(broadcast(prefixes), "__blk")
      .withColumn("start_offset",
        col("__prefix") + col("__cum") - col("n_tokens"))
      // an empty doc occupies no tokens; give it the one sequence its
      // offset points at so first/last stay well-defined
      .withColumn("first_seq", expr(s"start_offset div ${seqLen}L"))
      .withColumn("last_seq",
        expr(s"greatest(start_offset, start_offset + n_tokens - 1) div ${seqLen}L"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + 1L).as("n_seqs"))
  }

  /** Materialized packing: the actual `seqLen`-token training sequences
    * [[packSequences]] only addresses — every token gets its global
    * position, tokens group by `seq_id` = position div seqLen, and each
    * sequence's text is reassembled in position order (the final
    * sequence may be partial).
    *
    * Scale shape: this is the one step of the packing pipeline whose
    * cost is inherently O(corpus tokens) — a token-level explode and a
    * groupBy on seq_id (uniformly distributed by construction: every
    * sequence holds exactly seqLen tokens, so no reducer skew). The
    * offsets join is a broadcast-sized frame at 100 TB only if docs/
    * partition counts are bounded — it is doc-level (one row per doc),
    * so it shuffles as an ordinary hash join. Run it once as the final
    * materialization, not per-experiment; mixture experiments should
    * filter on [[packSequences]] offsets instead.
    *
    * Returns (seq_id, n_tokens, seq_text). */
  def packedTexts(docs: DataFrame, idCol: Column, textCol: Column,
      seqLen: Int, blockSize: Long = 1 << 20): DataFrame = {
    val offsets = packSequences(docs, idCol, textCol, seqLen, blockSize)
      .select(col("doc_id"), col("start_offset"))
    docs.select(idCol.as("doc_id"), tokenize(textCol).as("__t"))
      .join(offsets, "doc_id")
      .select(col("start_offset"), posexplode(col("__t")).as(Seq("__i", "__tok")))
      .withColumn("__pos", col("start_offset") + col("__i"))
      .withColumn("seq_id", expr(s"__pos div ${seqLen}L"))
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          s => s.getField("__tok")), " ").as("seq_text"))
  }

  /** Reference-corpus bigram coverage (the integer-exact core of the
    * CCNet-style LM quality gate): how many of a document's token
    * transitions are attested in a TRUSTED reference slice, and how
    * often. A low attested fraction marks disfluent/garbage text the
    * same way high LM perplexity does, with every output an exact
    * integer (plus one exact division) — so the oracle check is
    * float-order-proof where a log-prob sum would not be.
    *
    * Scale shape: the reference slice aggregates to a bigram count
    * table and BROADCASTS (a trusted reference is always tiny next to
    * the corpus); the corpus side is a narrow gram expansion feeding
    * the broadcast join, then ONE map-side-combined groupBy on doc_id
    * of integer partials. Returns (doc_id, n_transitions, n_attested,
    * attested_occurrences, attested_frac). */
  def lmCoverage(docs: DataFrame, idCol: Column, textCol: Column,
      ref: DataFrame, refTextCol: Column): DataFrame = {
    // bind tokenize to a real column BEFORE ngrams: referencing the
    // tokenize EXPRESSION inside ngrams' slice lambda would re-run the
    // tokenizer per gram (no CSE across lambda scopes — the repetition
    // operator's __t discipline)
    val refGrams = ref
      .withColumn("__t", tokenize(refTextCol))
      .select(explode(ngrams(col("__t"), 2)).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__c"))
    docs
      .withColumn("__t", tokenize(textCol))
      .select(idCol.as("doc_id"),
        explode_outer(ngrams(col("__t"), 2)).as("__g"))
      .join(broadcast(refGrams), Seq("__g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("__g")).as("n_transitions"),
        count(col("__c")).as("n_attested"),
        sum(coalesce(col("__c"), lit(0L))).as("attested_occurrences"),
        round(count(col("__c")).cast("double") /
          greatest(count(col("__g")), lit(1L)).cast("double"), 6)
          .as("attested_frac"))
  }

  /** Add-k smoothed bigram LM perplexity against a reference slice —
    * the full CCNet/Gopher-style fluency score ([[lmCoverage]] is its
    * oracle-exact integer core; this one's cross-partition log-prob
    * sum is float-order-sensitive, so it is spec-verified rather than
    * hash-compared). P(w2|w1) = (B(w1,w2) + k) / (C(w1) + k*V) where
    * C(w1) = sum over w2 of B(w1,w2) — the count of bigrams with left
    * context w1, derived FROM the bigram table so the unsmoothed
    * conditional sums to exactly 1 per context (a raw unigram
    * occurrence count would overcount: the last token of every
    * reference doc occurs without a following transition). V = the
    * reference unigram vocabulary (the smoothing support).
    * ppl = 2^(mean -log2 P) over the doc's transitions (null for docs
    * with none). Same broadcast-model shape as [[lmCoverage]]. */
  def lmPerplexity(docs: DataFrame, idCol: Column, textCol: Column,
      ref: DataFrame, refTextCol: Column, addK: Double = 1.0): DataFrame = {
    val refToks = ref.select(explode(tokenize(refTextCol)).as("__w"))
    val vocab = refToks.distinct().count().toDouble
    val bi = ref
      .withColumn("__t", tokenize(refTextCol)) // bindOnce: see lmCoverage
      .select(explode(ngrams(col("__t"), 2)).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__b"))
    // context totals from the bigram table itself: C(w1) = sum B(w1,*)
    val ctx = bi
      .withColumn("__w1", split(col("__g"), " ").getItem(0))
      .groupBy(col("__w1")).agg(sum(col("__b")).as("__u"))
    docs
      .withColumn("__t", tokenize(textCol))
      .select(idCol.as("doc_id"),
        explode_outer(ngrams(col("__t"), 2)).as("__g"))
      .withColumn("__w1", split(col("__g"), " ").getItem(0))
      .join(broadcast(bi), Seq("__g"), "left")
      .join(broadcast(ctx), Seq("__w1"), "left")
      .withColumn("__neglog2",
        -log2((coalesce(col("__b"), lit(0L)).cast("double") + lit(addK)) /
          (coalesce(col("__u"), lit(0L)).cast("double") + lit(addK * vocab))))
      .groupBy(col("doc_id"))
      .agg(
        count(col("__g")).as("n_transitions"),
        when(count(col("__g")) > 0, pow(lit(2.0), avg(col("__neglog2"))))
          .as("ppl"))
  }

  /** Repetition metrics (the Gopher repetition-filter family, token-
    * occurrence-weighted): `top_2gram_frac` = occurrences of the most
    * frequent 2-gram over all 2-gram occurrences, `dup_3gram_frac` =
    * fraction of 3-gram occurrences whose gram appears more than once.
    * Narrow per-row transforms — no shuffle; O(grams x distinct) per
    * doc, fine for document-sized inputs. Grams are bound to real
    * columns first (__g2/__g3): referencing the gram EXPRESSION inside
    * the count lambdas would re-evaluate it per distinct element (no
    * CSE across lambda scopes). */
  def repetition(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    def frac(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0)), 6)
    val g2 = col("__g2")
    val g3 = col("__g3")
    val counts3 = transform(array_distinct(g3), d => size(filter(g3, _ === d)))
    docs
      .withColumn("__t", tokenize(textCol))
      .withColumn("__g2", ngrams(col("__t"), 2))
      .withColumn("__g3", ngrams(col("__t"), 3))
      .select(
        idCol.as("doc_id"),
        frac(array_max(concat(
            transform(array_distinct(g2), d => size(filter(g2, _ === d))),
            array(lit(0)))), size(g2)).as("top_2gram_frac"),
        frac(aggregate(counts3, lit(0),
          (acc, c) => acc + when(c > 1, c).otherwise(lit(0))), size(g3))
          .as("dup_3gram_frac"))
  }

  /** HTML patterns shared by [[extractHtml]] and its oracle. All in the
    * RE2 ∩ java.util.regex common subset ((?is) inline flags, lazy
    * quantifiers — both engines support them; no lookaround). */
  /** Comment block, dot-matches-newline. */
  val htmlCommentRe = "(?s)<!--.*?-->"
  /** Script/style element including its body (non-content). */
  val htmlNonContentRe = "(?is)<(script|style)[^>]*>.*?</(script|style)>"
  /** Block-level tags that imply a break between words. */
  val htmlBlockTagRe = "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote)[^>]*>"
  /** Any remaining tag. */
  val htmlTagRe = "<[^>]*>"
  /** Title element body (first match wins). */
  val htmlTitleRe = "(?is)<title[^>]*>(.*?)</title>"
  /** Anchor open tag (link counting). */
  val htmlAnchorRe = "(?i)<a[ \\t][^>]*>"

  /** HTML → text extraction (the WARC/WET step every web-scale corpus
    * pipeline starts with — C4, CCNet, Dolma, RefinedWeb all consume
    * markup-stripped text): comments and script/style bodies dropped,
    * block-level tags become word breaks, remaining tags stripped, the
    * five standard entities decoded (&amp; LAST so `&amp;lt;` decodes
    * exactly once), whitespace collapsed. The title and the anchor
    * count ride along for downstream gating (boilerplate pages are
    * link-dense and text-sparse).
    *
    * Entity decoding is a fixed literal table, not a parser — the goal
    * is the published pipelines' extraction pass, not an HTML5 DOM.
    * A narrow per-row transform: no shuffle, streams through a 100 TB
    * scan at I/O speed.
    *
    * Returns (doc_id, title, text_extracted, n_tags, n_links). */
  def extractHtml(docs: DataFrame, idCol: Column, htmlCol: Column): DataFrame = {
    val noComment = regexp_replace(htmlCol, htmlCommentRe, " ")
    val noScript = regexp_replace(noComment, htmlNonContentRe, " ")
    val broken = regexp_replace(noScript, htmlBlockTagRe, " ")
    val noTags = regexp_replace(broken, htmlTagRe, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    docs.select(
      idCol.as("doc_id"),
      trim(regexp_extract(noComment, htmlTitleRe, 1)).as("title"),
      trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " ")).as("text_extracted"),
      regexp_count(noScript, lit(htmlTagRe)).as("n_tags"),
      regexp_count(noScript, lit(htmlAnchorRe)).as("n_links"))
  }

  /** Tracking query parameters dropped by [[normalizeUrls]] (the
    * CCNet/C4-style URL canonicalization list). */
  val trackingParamRe = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref|ref_src)="

  /** URL normalization + registered-domain extraction + blocklist flag
    * (the URL-level dedup-and-filter key every web pipeline computes —
    * CCNet dedups by normalized URL, C4/RefinedWeb gate on domain
    * blocklists). Canonical form: scheme and host lowercased, one
    * leading `www.` stripped, default ports dropped (`:80` on http,
    * `:443` on https), empty path → `/` with a trailing slash trimmed
    * off non-root paths, tracking parameters removed and the surviving
    * query sorted for order independence, fragment dropped.
    *
    * Pure regex/array canonicalization — RE2-safe, oracle-replayable,
    * and a narrow per-row transform. The blocklist arrives as a literal
    * set matched against BOTH the full host and the registered domain
    * (`cdn.example.com` blocks one host; `spam.net` blocks every
    * subdomain) — at 100 TB the flag is an `isin` against a few
    * thousand domains, never a shuffle.
    *
    * Returns (doc_id, url_norm, domain, blocked). */
  def normalizeUrls(docs: DataFrame, idCol: Column, urlCol: Column,
      blocklist: Seq[String]): DataFrame = {
    val scheme = lower(regexp_extract(urlCol, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rawPath = regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/"))
      .when(rawPath =!= "/", regexp_replace(rawPath, "/$", ""))
      .otherwise(rawPath)
    val rawQuery = regexp_extract(urlCol, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParamRe)))
    val query = array_join(kept, "&")
    val norm = concat(scheme, lit("://"), host, path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
    val bareHost = regexp_replace(host, ":[0-9]+$", "")
    val domain = when(bareHost.rlike("[^.]+\\.[^.]+$"),
        regexp_extract(bareHost, "([^.]+\\.[^.]+)$", 1))
      .otherwise(bareHost)
    docs.select(
      idCol.as("doc_id"),
      norm.as("url_norm"),
      domain.as("domain"),
      (bareHost.isin(blocklist: _*) || domain.isin(blocklist: _*))
        .cast("int").as("blocked"))
  }

  /** Line-qualifying regex for [[c4Clean]]: trimmed line ends in a
    * terminal punctuation mark (optionally quoted). Shared with the
    * oracle; RE2 ∩ java.util.regex safe. */
  val c4TerminalRe = "[.!?][\"']?$"

  /** C4-style line-and-document cleaning (Raffel et al. 2020 §2.2 —
    * the rule suite the C4 corpus ships and later pipelines reuse):
    *
    *   line kept     iff it ends in terminal punctuation ([[c4TerminalRe]]
    *                 on the trimmed line), has ≥ 3 words, and does not
    *                 mention "javascript" (case-insensitive)
    *   doc kept      iff the raw text has no "{" (code page), no
    *                 "lorem ipsum" (boilerplate), and the kept lines
    *                 carry ≥ 5 terminal punctuation marks (the
    *                 ≥-5-sentences page gate)
    *
    * Complements [[gopherGate]] (token-statistics rules) with C4's
    * line-shape rules; like it, every intermediate is emitted so a
    * pipeline can audit WHY a page fell. Narrow per-row transform —
    * no shuffle, streams through a 100 TB scan at I/O speed.
    *
    * Returns (doc_id, n_lines, n_kept, n_sentences, has_brace,
    * has_lorem, kept, text_c4). */
  def c4Clean(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val lines = col("__lines")
    val keptLines = col("__kept")
    val joined = col("__joined")
    val nSent = col("__nsent")
    val hasBrace = col("__brace")
    val hasLorem = col("__lorem")
    val lineOk = (l: Column) =>
      trim(l).rlike(c4TerminalRe) &&
        size(filter(split(trim(l), "[ \\t]+"), w => w =!= "")) >= 3 &&
        !contains(lower(l), lit("javascript"))
    docs
      .withColumn("__lines", filter(split(textCol, "\n"), l => l =!= ""))
      .withColumn("__kept", filter(lines, lineOk))
      .withColumn("__joined", array_join(keptLines, "\n"))
      .withColumn("__nsent", regexp_count(joined, lit("[.!?]")))
      .withColumn("__brace", contains(textCol, lit("{")))
      .withColumn("__lorem", contains(lower(textCol), lit("lorem ipsum")))
      .select(
        idCol.as("doc_id"),
        size(lines).as("n_lines"),
        size(keptLines).as("n_kept"),
        nSent.as("n_sentences"),
        hasBrace.cast("int").as("has_brace"),
        hasLorem.cast("int").as("has_lorem"),
        (!hasBrace && !hasLorem && nSent >= 5).cast("int").as("kept"),
        joined.as("text_c4"))
  }

  /** Stopword list for the Gopher "has common English words" rule
    * (Rae et al. 2021, appendix A1.1: ≥ 2 distinct hits required). */
  val gopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rules document gate (Rae et al. 2021, appendix A1.1 — the
    * heuristic filter suite MassiveText introduced and Dolma/RefinedWeb
    * reuse), over [[graft.functions.tokenize]] tokens and raw lines:
    *
    *   r_words        50 ≤ word count ≤ 100 000
    *   r_mean_len     3 ≤ mean word length ≤ 10
    *   r_symbols      (# + "...") per word ≤ 0.1
    *   r_alpha        ≥ 80% of words contain an alphabetic character
    *   r_stop         ≥ 2 distinct hits from [[gopherStop]]
    *   r_bullets      ≤ 90% of lines start with a bullet (- or *)
    *   r_ellipsis     ≤ 30% of lines end with "..." or "…"
    *
    * `kept` = all seven. Emitted per-rule so a pipeline can audit WHY a
    * document fell (the published practice: Dolma ships per-rule
    * attributes, not just the gate). Tokens are [[tokenize]]'d (lower
    * alnum), so the symbol counts run on the RAW text. Narrow per-row
    * transform — no shuffle, I/O-bound at 100 TB.
    *
    * Returns (doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * n_stop_hits, bullet_frac, ellipsis_frac, r_* bits, kept). */
  def gopherGate(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = col("__t")
    val lines = col("__lines")
    val nWords = size(t).cast("long")
    val den = greatest(size(t), lit(1)).cast("double")
    val lineDen = greatest(size(lines), lit(1)).cast("double")
    val meanLen = aggregate(transform(t, x => length(x)), lit(0),
      (acc, x) => acc + x).cast("double") / den
    val symbolRatio = (regexp_count(textCol, lit("#")) +
      regexp_count(textCol, lit("\\.\\.\\.")) +
      regexp_count(textCol, lit("…"))).cast("double") / den
    val alphaFrac = size(filter(t, x => x.rlike("[a-z]"))).cast("double") / den
    val stopHits = size(array_intersect(array_distinct(t),
      array(gopherStop.map(lit): _*)))
    val bulletFrac = size(filter(lines,
      l => l.rlike("^[ \\t]*[-*] "))).cast("double") / lineDen
    val ellipsisFrac = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)[ \\t]*$"))).cast("double") / lineDen
    def bit(c: Column): Column = c.cast("int")
    docs
      .withColumn("__t", tokenize(textCol))
      .withColumn("__lines", filter(split(textCol, "\n"), l => l =!= ""))
      .withColumn("__mean_len", meanLen)
      .withColumn("__sym", symbolRatio)
      .withColumn("__alpha", alphaFrac)
      .withColumn("__stop", stopHits)
      .withColumn("__bullet", bulletFrac)
      .withColumn("__ellipsis", ellipsisFrac)
      .select(
        idCol.as("doc_id"),
        nWords.as("n_words"),
        round(col("__mean_len"), 6).as("mean_word_len"),
        round(col("__sym"), 6).as("symbol_ratio"),
        round(col("__alpha"), 6).as("alpha_frac"),
        col("__stop").as("n_stop_hits"),
        round(col("__bullet"), 6).as("bullet_frac"),
        round(col("__ellipsis"), 6).as("ellipsis_frac"),
        bit(nWords >= 50 && nWords <= 100000L).as("r_words"),
        bit(col("__mean_len") >= 3.0 && col("__mean_len") <= 10.0).as("r_mean_len"),
        bit(col("__sym") <= 0.1).as("r_symbols"),
        bit(col("__alpha") >= 0.8).as("r_alpha"),
        bit(col("__stop") >= 2).as("r_stop"),
        bit(col("__bullet") <= 0.9).as("r_bullets"),
        bit(col("__ellipsis") <= 0.3).as("r_ellipsis"),
        bit(nWords >= 50 && nWords <= 100000L &&
          col("__mean_len") >= 3.0 && col("__mean_len") <= 10.0 &&
          col("__sym") <= 0.1 && col("__alpha") >= 0.8 &&
          col("__stop") >= 2 && col("__bullet") <= 0.9 &&
          col("__ellipsis") <= 0.3).as("kept"))
  }
}
