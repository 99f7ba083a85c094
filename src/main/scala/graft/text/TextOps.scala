package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** Token counts: whitespace tokens plus a BPE-ish subword estimate
    * (splits on letter/digit boundaries and ~4-char chunks — a
    * deterministic stand-in for a real tokenizer's token count). */
  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(
      idCol.as("doc_id"),
      size(tokenize(textCol)).as("n_words"),
      size(split(textCol, "\\s+")).as("n_ws_tokens"),
      ceil(length(textCol).cast("double") / 4.0).cast("long").as("n_bpe_est"))
}
