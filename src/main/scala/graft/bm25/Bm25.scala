package graft.bm25

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{text_to_stem_array, tokenize}

/** BM25 full-text ranking (reference: lantern_extras/src/bm25_agg.rs and
  * bm25_api.sql).
  *
  * Spark-first design: instead of the reference's per-term posting-array
  * table probed by a custom aggregate, the index is a flat postings
  * DataFrame `(term, doc_id, fq, doc_len)` — the shape Spark shuffles and
  * prunes best. Search is: filter postings to the query terms (predicate
  * pushdown on `term` when the postings table is persisted partitioned/
  * sorted by term), join document frequencies (broadcast — one row per
  * query term), score each posting, partial-aggregate per doc (map-side
  * combine), global top-k (TakeOrderedAndProject). No full shuffle of the
  * corpus ever happens at search time; the only shuffle is on doc_id for
  * the hit set. At 100 TB the postings table is bucketed by term.
  *
  * The reference's bloom-filter approximation for popular terms
  * (bm25_agg.rs:162-188) exists to bound a single Postgres backend's
  * memory; Spark's distributed aggregate replaces it, so scoring here is
  * exact (the reference's exact path). The reference also never
  * implemented the aggregate's parallel `combine` (bm25_agg.rs:297-310);
  * Spark's sum-merge IS that combine.
  */
object Bm25 {

  /** Reference GUC defaults: lantern_extras/src/lib.rs:44-46. */
  case class Params(k1: Double = 1.2, b: Double = 0.75)

  private def toksCol(textCol: Column, stemmed: Boolean): Column =
    if (stemmed) text_to_stem_array(textCol) else tokenize(textCol)

  /** Tokenized docs with length: (doc_id, toks, doc_len). */
  def tokenized(docs: DataFrame, idCol: Column, textCol: Column,
      stemmed: Boolean = false): DataFrame =
    docs.select(idCol.as("doc_id"), toksCol(textCol, stemmed).as("toks"))
      .withColumn("doc_len", size(col("toks")))

  /** Flat postings from a (possibly persisted) [[tokenized]] frame.
    * Tokenizing once and deriving postings + stats from the same cached
    * frame avoids re-running the stemmer over the corpus per subtree. */
  def postingsOf(tok: DataFrame): DataFrame =
    tok
      .select(col("doc_id"), col("doc_len"),
        explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("doc_len"))
      .agg(count(lit(1)).as("fq"))

  /** Flat postings index: (term, doc_id, fq, doc_len). */
  def postings(docs: DataFrame, idCol: Column, textCol: Column,
      stemmed: Boolean = false): DataFrame =
    postingsOf(tokenized(docs, idCol, textCol, stemmed))

  /** One-row corpus stats from a [[tokenized]] frame. */
  def corpusStatsOf(tok: DataFrame): DataFrame =
    tok.agg(count(lit(1)).cast("double").as("n_docs"),
      // exact long sum / count, not avg(): double-accumulation order
      // would make the result nondeterministic in the last ulp
      (sum(col("doc_len")).cast("double") /
        count(lit(1)).cast("double")).as("avg_doc_len"))

  /** One-row corpus stats (n_docs, avg_doc_len), for broadcast. */
  def corpusStats(docs: DataFrame, idCol: Column, textCol: Column,
      stemmed: Boolean = false): DataFrame =
    corpusStatsOf(tokenized(docs, idCol, textCol, stemmed))

  /** Reference GUC `bm25_default_approximation_threshhold` default
    * (lantern_extras/src/lib.rs): posting lists longer than this get a
    * doc-id bloom in the side table. */
  val DefaultBloomThreshold = 8000

  /** Reference-shaped inverted-index table
    * (term, term_freq, doc_ids_len, doc_ids_bloom, doc_ids, fqs,
    * doc_lens) plus the `term IS NULL` corpus-stats row, mirroring
    * lantern_extras/src/bm25_api.sql:33-56 — provided for API parity and
    * for consumers that want posting arrays; the flat [[postings]] shape
    * is preferred at scale. */
  def createBm25Table(docs: DataFrame, idCol: Column, textCol: Column,
      stemmed: Boolean = false,
      bloomThreshold: Int = DefaultBloomThreshold): DataFrame =
    createBm25TableOf(tokenized(docs, idCol, textCol, stemmed),
      bloomThreshold)

  /** Reference-shaped table from a [[tokenized]] frame. Pass a
    * (persisted) [[postingsOf]] frame via `postings` when several
    * consumers share one corpus, to skip the explode+groupBy re-run. */
  def createBm25TableOf(tok: DataFrame,
      bloomThreshold: Int = DefaultBloomThreshold,
      postings: Option[DataFrame] = None): DataFrame = {
    val p = postings.getOrElse(postingsOf(tok))
      .withColumn("srt", struct(col("doc_id"), col("fq"), col("doc_len")))
    val terms = termRows(p, bloomThreshold)
    // the reference repurposes (term_freq, doc_ids_len) of one NULL-term
    // row as corpus stats: doc count and avg doc length x100 (fixed
    // point; integer division keeps it engine-deterministic)
    val stats = tok
      .agg(count(lit(1)).as("n"), sum(col("doc_len")).as("s"))
      .select(nullStatsCols(terms, col("n"),
        expr("CAST((s * 100) div n AS INT)")): _*)
    terms.unionByName(stats)
  }

  /** Grouped posting rows -> one reference-shaped row per term. Input
    * needs (term, srt=struct(doc_id, fq, doc_len)). */
  private def termRows(p: DataFrame, bloomThreshold: Int): DataFrame = {
    // Deliberately a SORT-based streaming group (repartition on term ->
    // in-partition sort -> consecutive-group assembly), NOT
    // sort_array(collect_list(...)): the hash aggregate holds every
    // in-flight term's growing posting buffer simultaneously per task,
    // and at the sf10 century the hot terms' ~8 MB buffers x 32
    // concurrent tasks were an allocation cliff that capped century
    // benches at 24 threads (VERDICT r13). Here a task's peak is ONE
    // term's postings plus the emitted row — bounded by the largest
    // posting list, not by the task's whole key range — and the
    // Tungsten external sort below it spills gracefully. Same single
    // shuffle (the partial collect_list never reduced data map-side
    // anyway); identical output: the (term, srt) sort IS sort_array's
    // struct order. mapPartitions is justified as the one shape
    // Catalyst lacks — streaming one-group-at-a-time array assembly
    // with bounded memory.
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    val in = p.select(col("term"), col("srt"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("srt"))
    val outSchema = StructType(Seq(
      // propagate the input's term nullability: tokenized terms are
      // non-nullable (ArrayType(..., containsNull=false)), and declaring
      // that here lets Catalyst FOLD `term IS NULL` / `IS NOT NULL`
      // filters over the term rows — consolidateBm25Table's stats branch
      // then prunes the whole duplicated posting assembly instead of
      // computing it and discarding every row
      StructField("term", in.schema("term").dataType,
        nullable = in.schema("term").nullable),
      StructField("term_freq", LongType, nullable = false),
      StructField("post",
        ArrayType(in.schema("srt").dataType, containsNull = false))))
    val grouped = in.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = it.hasNext
        def next(): org.apache.spark.sql.Row = {
          val term = it.head.get(0)
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.spark.sql.Row]
          while (it.hasNext &&
              java.util.Objects.equals(it.head.get(0), term)) {
            buf += it.head.getStruct(1)
            it.next()
          }
          org.apache.spark.sql.Row(term, buf.length.toLong, buf.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    grouped
      .select(col("term"), col("term_freq"),
        size(col("post")).as("doc_ids_len"),
        when(col("term_freq") > bloomThreshold,
          graft.functions.array_to_bloom(col("post.doc_id")))
          .otherwise(lit(null)).as("doc_ids_bloom"),
        col("post.doc_id").as("doc_ids"),
        col("post.fq").as("fqs"),
        col("post.doc_len").as("doc_lens"))
  }

  /** The NULL-term stats row projection, typed off the term rows'
    * schema so unionByName lines up. */
  private def nullStatsCols(like: DataFrame, termFreq: Column,
      docIdsLen: Column): Seq[Column] = {
    val sch = like.schema
    Seq(
      lit(null).cast(sch("term").dataType).as("term"),
      termFreq.cast(sch("term_freq").dataType).as("term_freq"),
      docIdsLen.cast(sch("doc_ids_len").dataType).as("doc_ids_len"),
      lit(null).cast(sch("doc_ids_bloom").dataType).as("doc_ids_bloom"),
      lit(null).cast(sch("doc_ids").dataType).as("doc_ids"),
      lit(null).cast(sch("fqs").dataType).as("fqs"),
      lit(null).cast(sch("doc_lens").dataType).as("doc_lens"))
  }

  /** BM25 IDF: ln((N - df + 0.5)/(df + 0.5) + 1)
    * (lantern_extras/src/bm25_agg.rs:124-159). */
  def idf(nDocs: Column, docFreq: Column): Column =
    log((nDocs - docFreq + 0.5) / (docFreq + 0.5) + 1.0)

  /** Per-posting score term (same reference lines). */
  def postingScore(fq: Column, docLen: Column, nDocs: Column,
      docFreq: Column, avgDocLen: Column, p: Params): Column =
    idf(nDocs, docFreq) * (fq * lit(p.k1 + 1.0)) /
      (fq + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * docLen / avgDocLen))

  /** End-to-end search (reference `search_bm25`, bm25_api.sql:61-104):
    * top-k docs by BM25 for a query string. `precomputed` lets callers
    * pass a persisted postings table + stats. */
  def searchBm25(docs: DataFrame, idCol: Column, textCol: Column,
      query: String, k: Int, params: Params = Params(),
      stemmed: Boolean = false): DataFrame =
    searchBm25Of(tokenized(docs, idCol, textCol, stemmed), query, k,
      params, stemmed)

  /** Search against a (persisted) [[tokenized]] frame — the shape to use
    * when many queries hit one corpus. `postings` short-circuits the
    * explode+groupBy when a persisted [[postingsOf]] frame exists. */
  def searchBm25Of(tok: DataFrame, query: String, k: Int,
      params: Params = Params(), stemmed: Boolean = false,
      postings: Option[DataFrame] = None): DataFrame = {
    val terms: Seq[String] =
      (if (stemmed) graft.text.Stemmer.stemTokens(query)
       else graft.text.Stemmer.tokens(query)).toSeq.distinct
    val post = postings.getOrElse(postingsOf(tok))
      .filter(col("term").isin(terms: _*))
    scoreAndRank(post, corpusStatsOf(tok), k, params)
  }

  /** Ad-hoc BM25 score of ONE document against the corpus statistics
    * (reference `bm25_score(table, document, query)`,
    * lantern_extras/src/bm25_agg.rs:61-122): the document's term
    * frequencies come from the given text, document frequencies and
    * corpus stats from the table. */
  def bm25Score(docs: DataFrame, idCol: Column, textCol: Column,
      document: String, query: String, params: Params = Params(),
      stemmed: Boolean = false): Double =
    bm25ScoreOf(tokenized(docs, idCol, textCol, stemmed), document, query,
      params, stemmed)

  /** Ad-hoc score against a (persisted) [[tokenized]] frame. */
  def bm25ScoreOf(tok: DataFrame, document: String, query: String,
      params: Params = Params(), stemmed: Boolean = false,
      postings: Option[DataFrame] = None): Double = {
    def toks(s: String): Array[String] =
      if (stemmed) graft.text.Stemmer.stemTokens(s)
      else graft.text.Stemmer.tokens(s)
    val qTerms: Seq[String] = toks(query).toSeq.distinct
    val dToks = toks(document)
    val dLen = dToks.length.toDouble
    val fq: Map[String, Int] =
      dToks.groupBy(identity).view.mapValues(_.length).toMap
    val statsRow = corpusStatsOf(tok).collect()(0)
    val (n, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val dfs: Map[String, Double] =
      postings.getOrElse(postingsOf(tok))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qTerms.iterator
      .filter(fq.contains)
      .map { t =>
        val df = dfs.getOrElse(t, 0.0)
        val f = fq(t).toDouble
        math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
          (f * (params.k1 + 1.0)) /
          (f + params.k1 * (1.0 - params.b + params.b * dLen / avgdl))
      }
      .sum
  }

  /** The reference's popular-term APPROXIMATE scoring over a
    * reference-shaped [[createBm25Table]] table — the opt-in fidelity
    * mode for score parity with reference deployments running the
    * approximation (bm25_agg.rs:162-188 state_base, 311-401 finalize;
    * exact scoring stays this library's default — Spark's distributed
    * aggregate removes the single-backend memory bound the
    * approximation exists for). Mechanisms, all four of the
    * reference's:
    *
    *  1. ACCUMULATED-DOCS THRESHOLD: terms process in the aggregate's
    *     declared order — `ORDER BY doc_ids_len ASC` per the
    *     reference's search_bm25 (bm25_api.sql:84-99), term ascending
    *     as the tiebreak the reference leaves to the executor — and a
    *     term may defer only once more than `accDocsThreshold`
    *     DISTINCT doc ids have been accumulated from earlier terms
    *     (`self.data.len() > 100`, bm25_agg.rs:207): the baseline
    *     candidates must come from somewhere before popular terms
    *     stop contributing postings.
    *  2. SUBSTITUTION: a deferred term scores as a per-term CONSTANT
    *     with fq=1 and doc_len=avg_doc_len (maybe_use_bloom_filter,
    *     bm25_agg.rs:164-188) — its posting arrays are NEVER read,
    *     which is the approximation's entire scale win.
    *  3. BLOOM-MEMBERSHIP DEFERRAL: only terms whose table row
    *     carries a posting bloom (built when df > the build
    *     threshold) may defer; at finalize each candidate doc gains
    *     the constants of the deferred terms whose bloom CONTAINS its
    *     id. `exactMembership = true` resolves membership from the
    *     stored doc_ids instead (no false positives; blooms have no
    *     false negatives, so the two differ only by the fp-rate noise
    *     the approximation accepts) — the deterministic contract/
    *     oracle mode, since a DuckDB oracle cannot replay splitmix64
    *     bloom bits.
    *  4. 10x-LIMIT TOP-K HEAP: candidate docs are the top
    *     `10 * k` by accumulated EXACT score (finalize_base's
    *     bloom_limit heap, bm25_agg.rs:313-336) — a doc appearing
    *     ONLY in deferred terms is never a candidate, faithfully to
    *     the reference (it never enters `self.data`); deferred
    *     constants then re-rank within the candidates. Ties break by
    *     doc_id ascending (the reference's unstable heap/sort leaves
    *     ties unspecified; a deterministic engine must pick).
    *
    * Deferral decisions are driver-computed from per-term METADATA
    * only (term_freq, doc_ids_len, bloom presence) plus the doc_ids
    * of terms shorter than `accDocsThreshold` (bounded:
    * ≤ threshold x #query-terms ids): the first crossing point is
    * reached either by one term longer than the threshold (its own
    * distinct count crosses alone) or by the union of short ones.
    * Popular-term arrays are read only if the term lands BEFORE the
    * crossing in rare-first order — the same read the reference's
    * aggregate pays while collecting its baseline.
    *
    * Scale shape: deferred posting arrays never explode; the exact
    * part shuffles once on doc_id; the heap is a bounded
    * TakeOrderedAndProject; membership tests run on ≤ 10k candidate
    * rows x #deferred terms via a broadcast. Returns (doc_id, score)
    * top-k by (score desc, doc_id asc). */
  def searchBm25Approx(tbl: DataFrame, query: String, k: Int,
      params: Params = Params(), stemmed: Boolean = false,
      accDocsThreshold: Int = 100,
      exactMembership: Boolean = false): DataFrame = {
    val p = approxParts(tbl, query, k, params, stemmed, accDocsThreshold)
    val scored = p.defRows match {
      case None => p.cands.select(col("doc_id"),
        col("exact_score").as("score"))
      case Some(defRows) =>
        val member =
          if (exactMembership) array_contains(col("__ids"), col("doc_id"))
          else graft.functions.elem_in_bloom(col("doc_id"), col("__bloom"))
        // project ONLY what the chosen membership needs before the
        // broadcast: production (bloom) mode must never ship a popular
        // term's posting array to every task — that array never being
        // read is the approximation's entire point
        val defSel =
          if (exactMembership) defRows.select(col("const"), col("__ids"))
          else defRows.select(col("const"), col("__bloom"))
        p.cands.crossJoin(broadcast(defSel))
          .withColumn("add", when(member, col("const")).otherwise(lit(0.0)))
          .groupBy(col("doc_id"), col("exact_score"))
          .agg(sum(col("add")).as("__adds"))
          .select(col("doc_id"),
            (col("exact_score") + col("__adds")).as("score"))
    }
    scored.orderBy(round(col("score"), 6).desc, col("doc_id").asc).limit(k)
  }

  /** The approximate search's shared internals: the 10×k candidate
    * heap over the exact part, plus (when the crossing fired) the
    * deferred-term rows carrying the substituted constant, the
    * posting bloom, AND the true posting ids — so the exact and bloom
    * membership modes, and [[bloomModeCheck]]'s side-by-side replay,
    * all read one candidate pipeline that cannot drift. */
  private case class ApproxParts(cands: DataFrame, defRows: Option[DataFrame])

  private def approxParts(tbl: DataFrame, query: String, k: Int,
      params: Params, stemmed: Boolean,
      accDocsThreshold: Int): ApproxParts = {
    require(k > 0, "k must be positive")
    val spark = tbl.sparkSession
    import spark.implicits._
    val qTerms: Seq[String] =
      (if (stemmed) graft.text.Stemmer.stemTokens(query)
       else graft.text.Stemmer.tokens(query)).toSeq.distinct
    val rows = tbl.filter(col("term").isin(qTerms: _*))
    // per-term metadata only — posting arrays stay distributed
    case class TermMeta(term: String, df: Long, len: Int, hasBloom: Boolean)
    val meta = rows
      .select(col("term"), col("term_freq"), col("doc_ids_len"),
        col("doc_ids_bloom").isNotNull)
      .collect()
      .map(r => TermMeta(r.getString(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3)))
      .sortBy(t => (t.len, t.term)) // the reference's doc_ids_len ASC
    // short-term doc ids (each array <= accDocsThreshold entries)
    val shortTerms = meta.filter(_.len <= accDocsThreshold).map(_.term)
    val shortDocs: Map[String, Array[Long]] =
      if (shortTerms.isEmpty) Map.empty
      else rows.filter(col("term").isin(shortTerms.toSeq: _*))
        .select(col("term"), col("doc_ids"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    // sequential deferral decisions (reference state_base order)
    var crossed = false
    val accSet = scala.collection.mutable.HashSet[Long]()
    val deferred = scala.collection.mutable.ArrayBuffer[String]()
    val accumulated = scala.collection.mutable.ArrayBuffer[String]()
    meta.foreach { t =>
      if (t.hasBloom && crossed) deferred += t.term
      else {
        accumulated += t.term
        if (t.len > accDocsThreshold) crossed = true
        else if (!crossed) {
          shortDocs.get(t.term).foreach(ids => accSet ++= ids)
          if (accSet.size > accDocsThreshold) crossed = true
        }
      }
    }
    // corpus stats from the NULL row: n exact, avgdl at the table's
    // stored fixed-point precision (doc_ids_len = avgdl x100,
    // bm25_api.sql corpus_stats: doc_ids_len / 100.0)
    val stats = tbl.filter(col("term").isNull)
      .select(col("term_freq").cast("double").as("n_docs"),
        (col("doc_ids_len").cast("double") / 100.0).as("avg_doc_len"))
    // exact part: accumulated terms' postings, one doc_id shuffle
    val exactPart = rows
      .filter(col("term").isin(accumulated.toSeq: _*))
      .select(col("term"), col("term_freq").cast("double").as("doc_freq"),
        explode(arrays_zip(col("doc_ids"), col("fqs"), col("doc_lens")))
          .as("p"))
      .select(col("term"), col("doc_freq"),
        col("p.doc_ids").as("doc_id"), col("p.fqs").as("fq"),
        col("p.doc_lens").as("doc_len"))
      .crossJoin(broadcast(stats))
      .withColumn("sc", postingScore(col("fq").cast("double"),
        col("doc_len").cast("double"), col("n_docs"), col("doc_freq"),
        col("avg_doc_len"), params))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("exact_score"))
    // the 10x-limit candidate heap (bounded TakeOrderedAndProject).
    // The cut orders on the ROUNDED exact score (ADVICE r12): sum()
    // accumulates in partition-dependent order, and a raw-double cut
    // could admit a different near-cutoff candidate set across
    // layouts — rounding to 6dp here mirrors the final-ordering
    // discipline and keeps the candidate set layout-independent.
    val cands = exactPart
      .orderBy(round(col("exact_score"), 6).desc, col("doc_id").asc)
      .limit(10 * k)
    val defRows =
      if (deferred.isEmpty) None
      else
        // deferred rows: constant = the substituted posting score
        // (fq=1, doc_len=avg_doc_len) in the SAME column-expression
        // shape the exact path uses, so an oracle replays it verbatim
        Some(rows.filter(col("term").isin(deferred.toSeq: _*))
          .select(col("term"), col("term_freq").cast("double").as("doc_freq"),
            col("doc_ids_bloom").as("__bloom"), col("doc_ids").as("__ids"))
          .crossJoin(broadcast(stats))
          .withColumn("const", postingScore(lit(1.0), col("avg_doc_len"),
            col("n_docs"), col("doc_freq"), col("avg_doc_len"), params)))
    ApproxParts(cands, defRows)
  }

  /** Self-checking PRODUCTION-mode (bloom membership) verdict for the
    * approximate search — the `q_classify_recall` discipline applied
    * to the BM25 bloom path, whose splitmix64 bits no external oracle
    * can replay: run the bloom membership the production path uses
    * side by side with the stored-posting truth over the SAME
    * candidate pipeline, and verify IN-QUERY the two invariants the
    * approximation's correctness rests on (bm25_agg.rs:311-401):
    *
    *  - `nfn_ok` — NO FALSE NEGATIVES: every (candidate, deferred
    *    term) membership the true posting list contains, the bloom
    *    contains too (a bloom can only over-admit), so a bloom-mode
    *    score can never drop a constant an exact replay would add;
    *  - `fp_rate_ok` — the bloom's over-admission on true NON-members
    *    is bounded: observed false-positive memberships ≤
    *    max(5% of non-member tests, 3) — 5× the build's 0.01 design
    *    rate plus an absolute floor for small non-member counts.
    *    Deterministic (seed-42 blooms over a fixed corpus), so a
    *    green verdict at a scale stays green.
    *
    * `deferral_active` pins that the check exercised the bloom path
    * at all (≥ 1 deferred term — true at every contract scale; a
    * corpus where the crossing never fires yields (false, true,
    * true) honestly). An EMPTY candidate set (deferral fired but the
    * query matched no stored postings) is vacuously true on both
    * invariants — the aggregates return null over zero rows, so the
    * verdicts coalesce to true rather than surfacing a null a caller's
    * getBoolean would throw on. One verdict row; the oracle pins
    * all-TRUE. */
  def bloomModeCheck(tbl: DataFrame, query: String, k: Int,
      params: Params = Params(), stemmed: Boolean = false,
      accDocsThreshold: Int = 100): DataFrame = {
    val spark = tbl.sparkSession
    import spark.implicits._
    val p = approxParts(tbl, query, k, params, stemmed, accDocsThreshold)
    p.defRows match {
      case None =>
        Seq((false, true, true))
          .toDF("deferral_active", "nfn_ok", "fp_rate_ok")
      case Some(defRows) =>
        p.cands
          .crossJoin(broadcast(defRows.select(col("__bloom"), col("__ids"))))
          .select(
            graft.functions.elem_in_bloom(col("doc_id"), col("__bloom"))
              .as("__bm"),
            array_contains(col("__ids"), col("doc_id")).as("__em"))
          .agg(
            coalesce(bool_and(col("__bm") || !col("__em")), lit(true))
              .as("nfn_ok"),
            coalesce(
              sum(when(col("__bm") && !col("__em"), 1L).otherwise(0L)) <=
                greatest(
                  sum(when(!col("__em"), 1L).otherwise(0L))
                    .cast("double") * 0.05,
                  lit(3.0)),
              lit(true)).as("fp_rate_ok"))
          .select(lit(true).as("deferral_active"), col("nfn_ok"),
            col("fp_rate_ok"))
    }
  }

  /** Compact a bm25 table containing duplicate term rows (after
    * incremental appends) back to one row per term — reference
    * `consolidate_bm25_table` (bm25_api.sql:108-159): posting arrays
    * concatenate, term_freq/doc_ids_len become the merged cardinality,
    * and the bloom is recomputed above the threshold. NULL-term stats
    * rows merge too (counts add; the fixed-point average merges by
    * count-weighted mean). Idempotent. */
  def consolidateBm25Table(tbl: DataFrame,
      bloomThreshold: Int = DefaultBloomThreshold): DataFrame = {
    val p = tbl.filter(col("term").isNotNull)
      .select(col("term"),
        explode(arrays_zip(col("doc_ids"), col("fqs"), col("doc_lens")))
          .as("p"))
      .select(col("term"), col("p.doc_ids").as("doc_id"),
        col("p.fqs").as("fq"), col("p.doc_lens").as("doc_len"))
      .withColumn("srt", struct(col("doc_id"), col("fq"), col("doc_len")))
    val terms = termRows(p, bloomThreshold)
    val stats = tbl.filter(col("term").isNull)
      .agg(sum(col("term_freq")).as("n"),
        sum(col("term_freq") * col("doc_ids_len")).as("w"))
      .select(nullStatsCols(terms, col("n"),
        expr("CAST(w div n AS INT)")): _*)
      .filter(col("term_freq").isNotNull) // no stats rows in the input
    terms.unionByName(stats)
  }

  /** Score pre-filtered postings and return top-k (doc_id, score).
    *
    * `approxThreshold` > 0 enables the reference's popular-term
    * approximation (bm25_agg.rs:162-188, GUC default 8000): terms with
    * more postings than the threshold score every posting with fq=1 and
    * doc_len=avg_doc_len. The reference needs it to bound one backend's
    * hashmap; Spark's distributed aggregate doesn't, so it is OFF by
    * default and exists for score-parity with approximated reference
    * deployments (it also lets Catalyst fold the popular-term score to
    * a constant per term). */
  def scoreAndRank(queryPostings: DataFrame, stats: DataFrame, k: Int,
      params: Params = Params(), approxThreshold: Int = 0): DataFrame = {
    val dfreq = queryPostings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("doc_freq"))
    val exactScore = postingScore(col("fq").cast("double"),
      col("doc_len").cast("double"), col("n_docs"), col("doc_freq"),
      col("avg_doc_len"), params)
    val score =
      if (approxThreshold <= 0) exactScore
      else when(col("doc_freq") > approxThreshold,
        postingScore(lit(1.0), col("avg_doc_len"), col("n_docs"),
          col("doc_freq"), col("avg_doc_len"), params))
        .otherwise(exactScore)
    queryPostings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("sc", score)
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("score"))
      .orderBy(round(col("score"), 6).desc, col("doc_id").asc)
      .limit(k)
  }
}
