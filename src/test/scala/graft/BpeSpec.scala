package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, BpeTokenizer}

/** Byte-level BPE: training determinism, the pass-per-rank encoding
  * contract (== iterated string `replace`, what the DuckDB oracle
  * replays), and the partition invariant. */
class BpeSpec extends SparkSpec {

  test("training is deterministic and learns the expected first merge") {
    val a = Bpe.train("ababab cdcd ababab", 10)
    val b = Bpe.train("ababab cdcd ababab", 10)
    assert(a == b)
    // most frequent pair is (a, b) x6
    assert(a.head == Bpe.Merge('a'.toInt, 'b'.toInt))
  }

  test("default tokenizer trains a non-trivial table once") {
    val t = Bpe.default
    assert(t.merges.nonEmpty && t.merges.length <= Bpe.defaultBudget)
    // whole common corpus words should have become single tokens
    // ("the " with its trailing space — byte-level BPE merges across
    // the word boundary exactly like GPT-2's space-prefixed tokens)
    assert(t.vocabHex.contains("74686520")) // "the "
    // and the table must actually compress corpus-like text
    val s = "the fast table scan feeds a hash join"
    assert(t.count(s) < s.getBytes("UTF-8").length / 2)
  }

  test("encode matches a hand-replayed merge sequence") {
    // merges: (t,h) -> th, (th,e) -> the, (e,' ') -> 'e '
    val tok = new BpeTokenizer(IndexedSeq(
      Bpe.Merge('t'.toInt, 'h'.toInt),
      Bpe.Merge(256, 'e'.toInt),
      Bpe.Merge('e'.toInt, ' '.toInt)))
    // "the theme the" -> [the][ ][the][m][e ][the] (validated against
    // DuckDB's replace() replay of the same table)
    assert(tok.encodeHex("the theme the").toSeq ==
      Seq("746865", "20", "746865", "6d", "6520", "746865"))
    assert(tok.count("the theme the") == 6)
  }

  test("left-to-right non-overlapping pass semantics (replace parity)") {
    val tok = new BpeTokenizer(IndexedSeq(Bpe.Merge('a'.toInt, 'a'.toInt)))
    assert(tok.encodeHex("aaa").toSeq == Seq("6161", "61"))
    assert(tok.encodeHex("aaaa").toSeq == Seq("6161", "6161"))
  }

  test("tokens partition the byte sequence exactly (any input)") {
    val t = Bpe.default
    for (s <- Seq("", "x", "the fast table scan", "héllo wörld ✓",
        Bpe.trainingText.take(500))) {
      val hexCat = t.encodeHex(s).mkString
      val want = s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
      assert(hexCat == want, s"partition broken for '$s'")
    }
  }

  test("multibyte UTF-8 bytes are tokenized byte-level, not dropped") {
    val t = Bpe.default
    // é is two UTF-8 bytes (c3 a9); the ASCII training fixture never
    // learned that merge, so the count is EXACTLY 2 — a dropped-byte
    // bug would yield 0 or 1, a char-level tokenizer 1
    assert(t.count("é") == 2)
    assert(t.encodeHex("é").toSeq == Seq("c3", "a9"))
    assert(t.count("") == 0)
  }

  test("distributed training equals local training on a one-document corpus") {
    val s = spark
    import s.implicits._
    val text = Bpe.trainingText.take(400)
    val dist = Bpe.trainDistributed(
      Seq(text).toDF("text"), org.apache.spark.sql.functions.col("text"), 24)
    assert(dist == Bpe.train(text, 24))
  }

  test("distributed training: cross-doc counts, >= 2 threshold, early stop") {
    val s = spark
    import s.implicits._
    // (a,b) occurs once in each of two docs -> count 2 corpus-wide ->
    // merged; after the merge no pair reaches 2 ((c,d) occurs once),
    // so training stops well under budget
    val dist = Bpe.trainDistributed(
      Seq("ab", "ab", "cd").toDF("text"),
      org.apache.spark.sql.functions.col("text"), 5)
    assert(dist == IndexedSeq(Bpe.Merge('a'.toInt, 'b'.toInt)))
  }

  test("bpe_count / bpe_tokens expressions agree with the tokenizer") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "the fast table scan"), (1L, ""), (2L, "héllo"))
      .toDF("id", "text")
    val rows = df.select(col("id"),
        graft.functions.bpe_count(col("text")).as("n"),
        graft.functions.bpe_tokens(col("text")).as("toks"))
      .orderBy("id").collect()
    val t = Bpe.default
    assert(rows(0).getLong(1) == t.count("the fast table scan"))
    assert(rows(0).getSeq[String](2) == t.encodeHex("the fast table scan").toSeq)
    assert(rows(1).getLong(1) == 0L)
    assert(rows(2).getLong(1) == t.count("héllo"))
  }

  test("tokenCounts emits the real BPE basis") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, "the fast table scan")).toDF("doc_id", "text")
    val r = graft.text.TextOps.tokenCounts(df, col("doc_id"), col("text"))
      .collect().head
    assert(r.getAs[Long]("n_bpe") == Bpe.default.count("the fast table scan").toLong)
  }

  test("packSequences on the BPE basis reproduces the BPE prefix sum") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "the fast table"), (1L, "scan merge join"),
        (2L, "")).toDF("doc_id", "text")
    val out = graft.text.TextOps.packSequences(df, col("doc_id"),
        col("text"), seqLen = 4, blockSize = 2,
        tokenCount = c => graft.functions.bpe_count(c))
      .orderBy("doc_id").collect()
    val t = Bpe.default
    val n0 = t.count("the fast table").toLong
    val n1 = t.count("scan merge join").toLong
    assert(out(0).getAs[Long]("start_offset") == 0L)
    assert(out(1).getAs[Long]("start_offset") == n0)
    assert(out(2).getAs[Long]("start_offset") == n0 + n1)
    assert(out(2).getAs[Long]("n_tokens") == 0L)
  }

  test("merge table saves to parquet and loads to an identical tokenizer") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    val merges = Bpe.default.merges
    Bpe.save(spark, merges, s"$dir/merges")
    val loaded = Bpe.load(spark, s"$dir/merges")
    assert(loaded.merges == merges)
    // identical ENCODING, not just an equal table
    val probes = Seq("the fast table scan feeds the hash join",
      "zq vx qp wm", "", "naïve café — résumé", Bpe.trainingText.take(500))
    probes.foreach { p =>
      assert(loaded.encode(p).toSeq == Bpe.default.encode(p).toSeq,
        s"round-tripped tokenizer diverged on: $p")
    }
    // a corrupt artifact (rank hole) must be rejected, not shift ids
    import spark.implicits._
    merges.zipWithIndex.collect { case (m, i) if i != 1 => (i, m.left, m.right) }
      .toDF("rank", "left", "right")
      .write.mode("overwrite").parquet(s"$dir/holed")
    val e = intercept[IllegalArgumentException](Bpe.load(spark, s"$dir/holed"))
    assert(e.getMessage.contains("rank"))
  }
}
