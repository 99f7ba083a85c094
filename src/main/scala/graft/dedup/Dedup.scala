package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.tokenize

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale notes: exact dedup is one hash-shuffle on a 16-byte key.
  * MinHash/LSH is the standard shingle -> minhash -> band -> bucket-join
  * pipeline: candidate generation joins on band keys (tiny vs n^2);
  * only candidates get exact-Jaccard verification. All hash functions
  * are md5-derived — deterministic across engines and runs.
  */
object Dedup {

  /** Exact duplicate groups by content hash: (content_hash, dup_count,
    * keeper = min doc id). Rows with dup_count > 1 are duplicate sets. */
  def exactGroups(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"), md5(textCol.cast("binary")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col("doc_id")).as("keeper"))

  /** Keep one row per distinct content (the minimum id). */
  def dedupExact(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val keepers = exactGroups(docs, idCol, textCol)
      .select(col("keeper").as("__keep_id"))
    docs.join(keepers, idCol === col("__keep_id"), "left_semi")
  }

  /** Word w-shingles of the tokenized text (distinct). */
  def shingles(textCol: Column, w: Int = 3): Column = {
    val t = tokenize(textCol)
    array_distinct(
      filter(
        transform(t, (_, i) =>
          when(i <= size(t) - w,
            concat_ws(" ", (0 until w).map(j => element_at(t, i + j + 1)): _*))),
        x => x.isNotNull))
  }

  /** MinHash signature: for permutation i, min over shingles of
    * md5(i || '|' || shingle). Returned as `sig_0..sig_{n-1}` columns. */
  def minhashSignature(docs: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int = 8, shingleWidth: Int = 3): DataFrame = {
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("__sh"),
        x => md5(concat(lit(i.toString), lit("|"), x).cast("binary"))))
        .as(s"sig_$i")
    }
    docs
      .withColumn("__sh", shingles(textCol, shingleWidth))
      .filter(size(col("__sh")) > 0) // docs shorter than the shingle width
      .select((idCol.as("doc_id") +: sigCols): _*)
  }

  /** LSH candidate pairs: signatures banded `bands x rowsPerBand`;
    * docs sharing any band key become a candidate pair. Output:
    * (doc_a, doc_b, est_jaccard) where est_jaccard = fraction of
    * matching minhashes. */
  def lshCandidates(docs: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int = 8, bands: Int = 4, shingleWidth: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(docs, idCol, textCol, numHashes, shingleWidth)
      .withColumn("sig", array((0 until numHashes).map(i => col(s"sig_$i")): _*))
      .select(col("doc_id"), col("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        md5(concat_ws("|",
          (lit(b.toString) +:
            (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))): _*)
          .cast("binary"))
      }: _*)).as("band_key"))
    val a = banded.select(col("band_key"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_key"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), m => m)).cast("double") / numHashes.toDouble, 6))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (verification stage after LSH). `pairs` must have doc_a/doc_b. */
  def jaccardVerify(docs: DataFrame, idCol: Column, textCol: Column,
      pairs: DataFrame, shingleWidth: Int = 3): DataFrame = {
    val sh = docs.select(idCol.as("jid"), shingles(textCol, shingleWidth).as("sh"))
    pairs
      .join(sh.select(col("jid").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("jid").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 16-bit md5-derived SimHash, as a bit-string column. For each of the
    * 16 leading hex digits of each token's md5, vote +1 if the digit's
    * high bit (>= 8) is set else -1; the sign of each position's total
    * gives the bit. Hamming distance between bit-strings approximates
    * token-multiset similarity. (The md5 basis keeps it reproducible in
    * any engine; a 64-bit xxhash variant is a drop-in at scale.) */
  def simhash16(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = tokenize(textCol)
    val hashed = transform(t, x => md5(x.cast("binary")))
    val bitCols = (1 to 16).map { p =>
      val votes = aggregate(hashed, lit(0),
        (acc, h) => acc +
          when(conv(substring(h, p, 1), 16, 10).cast("int") >= 8, 1).otherwise(-1))
      when(votes > 0, lit("1")).otherwise(lit("0"))
    }
    docs.select(idCol.as("doc_id"), concat(bitCols: _*).as("simhash"))
  }
}
