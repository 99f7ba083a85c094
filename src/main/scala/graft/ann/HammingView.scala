package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sign-view encoding that makes bit-hamming distance indexable by the
  * float HNSW graph (reference opclass `dist_hamming_ops` makes
  * `ORDER BY v <+> q` indexable — lantern_hnsw/sql/lantern.sql:63-104,
  * bit view hnsw.c:308-319): each 32-bit word of an int vector expands
  * to 32 float components, +1 for a set bit, -1 for a clear bit.
  * [[Metric.Hamming]] counts sign disagreements, so a distance over the
  * expanded view equals `bitCount(xor)` over the original words — the
  * graph ranks EXACT hamming distances; the encoding loses nothing.
  *
  * Contract: a hamming index served to the transparent
  * [[graft.plans.AnnTopK]] rewrite must be built over
  * [[signView]](bitsCol); the rule expands the foldable query literal
  * with [[expand]] (same bit order) before probing. */
object HammingView {

  /** Build-time column encoder: Array[Int] -> Array[Float] of dim*32.
    * A static 32-branch expression per word — stays inside whole-stage
    * codegen during the index build scan. */
  def signView(bits: Column): Column =
    flatten(transform(bits, w =>
      array((0 until 32).map(j =>
        when(w.bitwiseAND(lit(1 << j)) =!= 0, lit(1.0f))
          .otherwise(lit(-1.0f))): _*)))

  /** Query-side expansion (the rewrite's probe vector): same bit order
    * as [[signView]] — component i*32+j carries bit j of word i. */
  def expand(words: Array[Int]): Array[Float] = {
    val out = new Array[Float](words.length * 32)
    var i = 0
    while (i < words.length) {
      var j = 0
      while (j < 32) {
        out(i * 32 + j) = if (((words(i) >> j) & 1) != 0) 1.0f else -1.0f
        j += 1
      }
      i += 1
    }
    out
  }
}
