package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

import graft.dedup.Dedup
import graft.text.{Dsir, TextOps}

/** The STREAMING composed curation pipeline — selection at the ingest
  * door, end to end: each arriving micro-batch flows through clean →
  * Gopher gate → intra-batch exact dedup → incremental exact dedup
  * against the corpus (bloom-routed, [[Dedup.incrementalDedupPrepared]])
  * → incremental near-dup against the corpus
  * ([[Dedup.incrementalNearDup]], the fully-prepared overload) →
  * inline DSIR importance scoring — the operational twin of
  * [[graft.operators.CurationPipeline]]: the batch pipeline curates
  * the corpus once and writes its artifacts; THIS operator is what
  * runs forever at the door, touching the corpus ONLY through those
  * prepared artifacts (hash table + bloom, signature table, hashed
  * shingle table, DSIR weight array — at cluster scale, parquet
  * tables an ingest job reads; per the reference's daemon model,
  * lantern_extras/src/daemon.rs:1147-1260, where a watched table's
  * new rows flow through the prepared job spec).
  *
  * Scale shape: every stage is the batch operator itself — narrow
  * clean/gate transforms; one batch-local hash shuffle for the
  * intra-batch keeper; the bloom probe rides the scan and only
  * bloom-positive candidates pay the anti-join; near-dup bands
  * equi-join new×prepared (the new side is an ingest batch, orders of
  * magnitude smaller) with the mega-bucket guard on the corpus side;
  * the DSIR fold is zero-exchange. Nothing in the batch path scans
  * the corpus text.
  *
  * Batch/stream parity: [[curateBatch]] is a pure batch→batch
  * function; the stream runs it per micro-batch via foreachBatch, so
  * running it directly on the same rows IS the backfill mode
  * (spec-pinned). Cross-corpus checks are stateless against the
  * prepared artifacts and batching-invariant; the INTRA-batch exact
  * keeper is per-micro-batch by design — an ingest drop is one batch
  * (AvailableNow over the drop directory), and cross-DROP dups are
  * the incremental check's job after the corpus refresh absorbs the
  * previous drop. */
object IngestPipeline {

  /** Prepared corpus-side artifacts (built once per corpus version —
    * see the batch pipeline's boundaries): `hashes` = (content_hash)
    * of the curated corpus text, `bloom` its sketch, `shingledHashed`
    * = (doc_id, sh: array<long>) 60-bit hashed shingles,
    * `signatures` = (doc_id, sig) MinHash signatures derived from the
    * STRING shingles (the shared 28-bit idiom), `dsirWeights` the
    * dense fixed-point weight array. */
  final case class PreparedCorpus(hashes: DataFrame, bloom: BloomFilter,
      shingledHashed: DataFrame, signatures: DataFrame,
      dsirWeights: Array[Long])

  /** One ingest batch through the full door, keeping the CLEANED
    * text: (doc_id, source, text_c4, n_tokens, w_fp). The text column
    * is what the corpus-refresh absorb step needs — a drop's
    * survivors extend the corpus' hash/signature/shingle artifacts
    * from their cleaned text ([[graft.operators.CorpusRefresh]]).
    * [[curateBatch]] is the narrow projection the sink writes. */
  def curateBatchKept(batch: DataFrame, idCol: Column, sourceCol: Column,
      textCol: Column, corpus: PreparedCorpus,
      jaccardThreshold: Double = 0.6): DataFrame = {
    require(jaccardThreshold >= 0 && jaccardThreshold <= 1,
      "jaccardThreshold must be in [0, 1]")
    // 1-2. clean + gate, exactly the batch pipeline's stage shapes
    val c4 = TextOps.c4Clean(batch, idCol, textCol)
      .filter(col("kept") === 1)
      .select(col("doc_id"), col("text_c4"))
      .join(batch.select(idCol.as("doc_id"), sourceCol.as("source")),
        "doc_id")
    val gok = c4.join(TextOps.gopherGate(c4, col("doc_id"), col("text_c4"))
      .filter(col("kept") === 1).select(col("doc_id")), "doc_id")
    // 3. intra-batch exact dedup (min-id keeper per md5 group)
    val exd = gok.join(
      gok.select(md5(col("text_c4").cast("binary")).as("__h"),
          col("doc_id"))
        .groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")),
      "doc_id")
    // 4. incremental exact vs the corpus: bloom-routed, exact
    val inc = exd.join(
      Dedup.incrementalDedupPrepared(exd, col("doc_id"), col("text_c4"),
        corpus.hashes, corpus.bloom).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    // 5. incremental near-dup vs the corpus' prepared tables: band
    //    keys from the batch's own STRING shingles, verify on 60-bit
    //    hashed shingles (the century width discipline)
    val shStr = Dedup.shingled(inc, col("doc_id"), col("text_c4"))
    val shHash = shStr.select(col("doc_id"),
      array_distinct(transform(col("sh"),
        x => conv(substring(md5(x.cast("binary")), 1, 15), 16, 10)
          .cast("long"))).as("sh"))
    val flagged = Dedup.incrementalNearDup(shHash,
        Dedup.signatures(shStr, 8), corpus.shingledHashed,
        corpus.signatures, 8, 4, jaccardThreshold, 10000, 16.0)
      .select(col("doc_id")).distinct()
    val surv = inc.join(flagged, Seq("doc_id"), "left_anti")
    // 6. inline DSIR importance over the cleaned survivors
    Dsir.withScoreInline(surv, col("text_c4"), corpus.dsirWeights)
      .select(col("doc_id"), col("source"), col("text_c4"),
        size(graft.functions.tokenize(col("text_c4"))).cast("long")
          .as("n_tokens"),
        col("w_fp"))
  }

  /** One ingest batch through the full door: the curated survivors as
    * (doc_id, source, n_tokens, w_fp) — n_tokens and the DSIR score
    * both over the CLEANED text, the representation the corpus
    * artifacts use. */
  def curateBatch(batch: DataFrame, idCol: Column, sourceCol: Column,
      textCol: Column, corpus: PreparedCorpus,
      jaccardThreshold: Double = 0.6): DataFrame =
    curateBatchKept(batch, idCol, sourceCol, textCol, corpus,
        jaccardThreshold)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("w_fp"))

  /** Run the door as a stream: parquet ingest directory →
    * [[curateBatchKept]] per micro-batch (foreachBatch — the stages
    * compose joins and aggregations no single streaming plan allows)
    * → parquet sink, Trigger.AvailableNow (one run per ingest drop,
    * the daemon job discipline shared with the embed/completion
    * streams). The sink keeps the CLEANED text: a drop's sink IS its
    * survivor set in the exact shape the corpus refresh absorbs
    * ([[graft.operators.CorpusRefresh.absorb]]'s `dropKept`), so the
    * refresh never re-runs the door over rows the stream already
    * curated; narrow consumers project (doc_id, source, n_tokens,
    * w_fp) off [[readSink]].
    *
    * Exactly-once sink: each micro-batch overwrites its own
    * batchId-scoped subdirectory (`batch-<id>/`), so a crash between
    * the append and the checkpoint commit — where a blind append
    * would duplicate the whole batch's survivors on replay — just
    * overwrites the same directory with the same deterministic rows.
    * Read the sink with [[readSink]]. */
  def run(spark: SparkSession, srcPath: String, schema: StructType,
      idColName: String, sourceColName: String, textColName: String,
      corpus: PreparedCorpus, outPath: String, ckptPath: String,
      jaccardThreshold: Double = 0.6): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.schema(schema).parquet(srcPath)
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        curateBatchKept(b, col(idColName), col(sourceColName),
          col(textColName), corpus, jaccardThreshold)
          .write.mode("overwrite").parquet(s"$outPath/batch-$batchId")
        ()
      }
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // defensive barrier: a caller's immediate sink read once raced the
    // final batch's directory visibility (observed rarely on local FS
    // under a loaded JVM). The checkpoint's commits log is the ground
    // truth for what completed — wait (bounded) until every committed
    // batch id has its sink directory before returning.
    val conf = spark.sessionState.newHadoopConf()
    val commits = new org.apache.hadoop.fs.Path(s"$ckptPath/commits")
    val fs = commits.getFileSystem(conf)
    if (fs.exists(commits)) {
      val ids = fs.listStatus(commits).map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit))
      val deadline = System.nanoTime() + 30L * 1000000000L
      for (id <- ids) {
        val d = new org.apache.hadoop.fs.Path(s"$outPath/batch-$id")
        while (!fs.exists(d) && System.nanoTime() < deadline)
          Thread.sleep(25)
        if (!fs.exists(d)) throw new java.io.IOException(
          s"IngestPipeline: committed batch $id has no sink directory $d")
      }
    }
  }

  /** Read everything [[run]]'s sink committed: the batchId-scoped
    * subdirectories, listed explicitly (no glob — and a brief bounded
    * retry, since a reader starting the moment a run returns should
    * see the sink, not a listing race). */
  def readSink(spark: SparkSession, outPath: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(conf)
    def batches(): Seq[String] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch-")).map(_.toString)
    var bs = batches()
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (bs.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50); bs = batches()
    }
    if (bs.isEmpty) throw new java.io.FileNotFoundException(
      s"IngestPipeline.readSink: no committed batch directories under $outPath")
    spark.read.parquet(bs: _*)
  }
}
