package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.IngestPipeline.PreparedCorpus

/** The corpus REFRESH cycle — absorbing a curated ingest drop into
  * the corpus, closing the operational loop around the streaming
  * door: the door curates arrivals against a FROZEN corpus version
  * ([[graft.streaming.IngestPipeline]]); this operator merges a
  * drop's survivors into the kept set and extends the door's
  * prepared artifacts INCREMENTALLY — append-only, from the drop's
  * cleaned text alone — so the next corpus version never rescans the
  * existing corpus text.
  *
  * Reference context: this is the `consolidate_bm25_table` pattern
  * (lantern_extras/src/bm25_api.sql:108-159 — fold a delta's side
  * rows into the standing side table instead of rebuilding it)
  * applied to the curation pipeline's artifacts.
  *
  * Correct-by-construction parity (AbsorbSpec pins it at two scales):
  * because the door's survivors are, by the door's own checks,
  * exact-distinct and near-dup-distinct from the frozen corpus, the
  * extended artifacts EQUAL the artifacts rebuilt from scratch over
  * the merged kept set — each artifact is a per-row pure function of
  * the kept text, and the merged set is a disjoint union. The
  * refreshed selection is the same mix operator over the merged
  * scored rows, so absorb-then-mix == rebuild-then-mix row for row.
  *
  * Scale shape (100 TB): every extension is a UNION of the standing
  * artifact (a bare parquet/boundary leaf, never recomputed) with a
  * drop-sized delta — no corpus text is rescanned; the one standing
  * artifact that is re-read is the 16-byte hash COLUMN, to re-derive
  * the bloom (a sketch cannot be unioned across different expected
  * sizes; one narrow column scan is ~0.1 % of corpus bytes). The
  * refreshed mix runs over (doc_id, source, n_tokens, w_fp) rows —
  * the blocked two-phase rank, never the text. */
object CorpusRefresh {

  /** A refreshed corpus version: `kept` = the merged scored kept rows
    * (doc_id, source, n_tokens, w_fp) the mix selects over; `corpus` =
    * the extended door artifacts (hashes, bloom, signatures, hashed
    * shingles, the UNCHANGED frozen weights) ready to serve the next
    * ingest drop. */
  final case class Refreshed(kept: DataFrame, corpus: PreparedCorpus)

  /** The shared 60-bit hashed-shingle idiom (the century width
    * discipline — verify-join rows compare as longs, never as shingle
    * strings). */
  private[graft] def hashedShingleCol(sh: Column): Column =
    array_distinct(transform(sh,
      x => conv(substring(md5(x.cast("binary")), 1, 15), 16, 10)
        .cast("long")))

  /** Absorb one drop: `keptScored` = the frozen corpus' kept rows as
    * (doc_id, source, n_tokens, w_fp); `dropKept` = the door's
    * survivors WITH cleaned text
    * ([[graft.streaming.IngestPipeline.curateBatchKept]]'s shape:
    * doc_id, source, text_c4, n_tokens, w_fp). `bloomFpp` sizes the
    * re-derived bloom over the extended hash count. */
  def absorb(corpus: PreparedCorpus, keptScored: DataFrame,
      dropKept: DataFrame, bloomFpp: Double = 0.01): Refreshed = {
    require(bloomFpp > 0 && bloomFpp < 1, "bloomFpp must be in (0, 1)")
    val hashes = corpus.hashes.unionByName(
      dropKept.select(md5(col("text_c4").cast("binary"))
        .as("content_hash")))
    val shStr = Dedup.shingled(dropKept, col("doc_id"), col("text_c4"))
    val signatures = corpus.signatures.unionByName(
      Dedup.signatures(shStr, 8))
    val shingledHashed = corpus.shingledHashed.unionByName(
      shStr.select(col("doc_id"), hashedShingleCol(col("sh")).as("sh")))
    val bloom = hashes.stat.bloomFilter("content_hash",
      math.max(hashes.count(), 1L), bloomFpp)
    val kept = keptScored.unionByName(dropKept.select(col("doc_id"),
      col("source"), col("n_tokens"), col("w_fp")))
    Refreshed(kept, PreparedCorpus(hashes, bloom, shingledHashed,
      signatures, corpus.dsirWeights))
  }

  /** Re-run the per-source token-budget mix over a refreshed kept set
    * — the selection step of the new corpus version (same operator,
    * same importance ranking, as the batch pipeline's `selected`
    * boundary). */
  def refreshMix(refreshed: Refreshed,
      budgets: Map[String, Long]): DataFrame =
    graft.text.TextOps.mixToTokenBudgetByScore(refreshed.kept,
      col("doc_id"), col("source"), col("n_tokens"), col("w_fp"),
      budgets)
}
