package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Decontamination + repetition metrics (the training-pipeline text
  * gates beyond the reference's own surface). */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("ngramDecontaminate flags exactly the docs sharing an n-gram") {
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x a b c y"), // shares "a b c"
      (2L, "a b x c d"), // pairwise overlap but no shared 3-gram
      (3L, "q w e r"), // disjoint vocabulary
      (4L, "a b") // shorter than n: no grams at all
    ).toDF("doc_id", "text")
    val out = TextOps.ngramDecontaminate(train, bench,
        col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 0L, false), (3L, 0L, false), (4L, 0L, false)))
  }

  test("ngramDecontaminate counts distinct overlapping grams") {
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // "a b c" and "b c d" both shared; "a b c" appearing twice in the
    // training doc must count once (distinct grams, not occurrences)
    val train = Seq((1L, "a b c d a b c")).toDF("doc_id", "text")
    val row = TextOps.ngramDecontaminate(train, bench,
        col("doc_id"), col("text"), n = 3)
      .collect()(0)
    assert(row.getLong(1) == 2L && row.getBoolean(2))
  }

  test("corpusNgrams counts occurrences corpus-wide with stable ties") {
    val docs = Seq(
      (1L, "a b c"), // "a b", "b c"
      (2L, "a b d"), // "a b", "b d"
      (3L, "b c") // "b c"
    ).toDF("doc_id", "text")
    val out = TextOps.corpusNgrams(docs, col("text"), n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a b", 2L), ("b c", 2L), ("b d", 1L)))
  }

  test("sampleStratified is a pure function of (id, salt, rates)") {
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "zz")).toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5)
    val once = TextOps.sampleStratified(docs, col("doc_id"), col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = TextOps.sampleStratified(docs, col("doc_id"), col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again) // deterministic across runs
    assert(once.forall(_ % 2 == 0)) // unlisted stratum drops entirely
    // ~50% of the 200 en docs; md5 buckets are uniform enough that a
    // [60, 140] band would only fail on a broken hash or rate wiring
    assert(once.size > 60 && once.size < 140)
    // a different salt samples a different (still deterministic) set
    val salted = TextOps.sampleStratified(docs, col("doc_id"), col("lang"),
      rates, salt = "other").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted != once)
    // rate 1 keeps every row of the stratum, rate 0 none
    assert(TextOps.sampleStratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0)).count() == 200)
    assert(TextOps.sampleStratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.0)).count() == 0)
  }

  test("mixEpochs: floor copies always, the fractional extra by bucket") {
    val docs = (0L until 300L).map(i =>
      (i, s"s${i % 3}")).toDF("doc_id", "source")
    val factors = Map("s0" -> 2.5, "s1" -> 1.0) // s2 absent -> dropped
    val out = TextOps.mixEpochs(docs, col("doc_id"), col("source"), factors)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2)
    assert(!bySrc.contains("s2"), "unlisted source drops")
    // s1: exactly one copy per doc, epoch 1
    assert(bySrc("s1").length == 100 && bySrc("s1").forall(_._3 == 1L))
    // s0: every doc gets epochs 1 and 2; ~half get a third copy
    val s0Copies = bySrc("s0").groupBy(_._1).map { case (_, rs) =>
      rs.map(_._3).sorted.toSeq }
    assert(s0Copies.forall(e => e == Seq(1L, 2L) || e == Seq(1L, 2L, 3L)))
    val thirds = s0Copies.count(_.length == 3)
    assert(thirds > 30 && thirds < 70, s"~50% extras, got $thirds/100")
    // deterministic: the identical multiset on a different layout
    val again = TextOps.mixEpochs(docs.repartition(7), col("doc_id"),
        col("source"), factors)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // growing a factor only ever ADDS copies
    val grown = TextOps.mixEpochs(docs, col("doc_id"), col("source"),
        Map("s0" -> 3.0, "s1" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out.toSet.subsetOf(grown))
    // fractions must sit on the 1/10000 grid
    intercept[IllegalArgumentException] {
      TextOps.mixEpochs(docs, col("doc_id"), col("source"),
        Map("s0" -> 1.00001))
    }
    // ... but the check is TOLERANT of float representation: 1.1 and
    // 2.3 are on-grid even though (1.1-1.0)*10000 = 1000.0000000000009
    for (f <- Seq(1.1, 2.3)) {
      val n = TextOps.mixEpochs(docs, col("doc_id"), col("source"),
        Map("s0" -> f)).count()
      assert(n >= 100 * math.floor(f).toLong, s"on-grid factor $f rejected")
    }
    // the plan is a single narrow scan: no shuffle, no join, no window
    val plan = TextOps.mixEpochs(docs, col("doc_id"), col("source"), factors)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Window"), s"mixEpochs must stay narrow:\n$plan")
    // a factor-0.0 source contributes nothing, so it must not widen
    // the pushed scan subset either (same as an unlisted source)
    val zeroed = TextOps.mixEpochs(docs, col("doc_id"), col("source"),
      Map("s0" -> 2.5, "s1" -> 0.0))
    assert(zeroed.filter(col("source") === "s1").count() == 0)
    // the analyzed plan shows the isin list before ConvertToLocal
    // folds the tiny fixture away; at corpus scale this is the
    // In(source) subset that reaches the parquet scan
    val zPlan = zeroed.queryExecution.analyzed.toString
    val isin = "IN \\(([^)]*)\\)".r.findFirstMatchIn(zPlan).map(_.group(1))
    assert(isin.exists(l => l.contains("s0") && !l.contains("s1")),
      s"factor-0 source must be pruned from the isin subset:\n$zPlan")
  }

  test("repetition matches hand-computed gram fractions") {
    val docs = Seq(
      (1L, "a b a b a"), // 2-grams ab,ba,ab,ba -> top 2/4; 3-grams aba,bab,aba -> dup 2/3
      (2L, "u v w x"), // all grams unique -> top 1/3, dup 0
      (3L, "z"), // no grams at all -> both 0
      (4L, "") // no tokens -> both 0
    ).toDF("doc_id", "text")
    val out = TextOps.repetition(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out(0) == ((1L, 0.5, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(out(1) == ((2L, math.rint(1.0 / 3 * 1e6) / 1e6, 0.0)))
    assert(out(2) == ((3L, 0.0, 0.0)))
    assert(out(3) == ((4L, 0.0, 0.0)))
  }

  test("domainStats: dup_frac counts docs sharing a line across the corpus") {
    val docs = Seq(
      (1L, "sA", "en", "a b c d"), // "a b" shared with doc 2 -> dup
      (2L, "sA", "de", "a b x y"), // dup
      (3L, "sB", "en", "p q"),     // clean
      (4L, "sB", "en", "p r")      // clean (lines "p q" vs "p r" differ)
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextOps.domainStats(docs, col("doc_id"), col("source"),
        col("text"), col("lang"), chunk = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(out(0) == (("sA", 2L, 7.0, 2L, 1.0)))
    assert(out(1) == (("sB", 2L, 3.0, 1L, 0.0)))
  }

  test("cleanText redacts URLs before emails, collapses whitespace") {
    val docs = Seq(
      (1L, "mail me at bob.smith+x@corp-mail.co.uk  please"),
      (2L, "read http://u@ex.com/q\tand https://a.io/p?x=1 now"),
      (3L, "plain\u0001text\u001Fwith\u007Fcontrols"),
      (4L, "  nothing special  ")).toDF("doc_id", "text")
    val out = TextOps.cleanText(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out(0) == (("mail me at <EMAIL> please", 0, 1)))
    // the in-URL '@' is consumed by the URL pass, never counted as email
    assert(out(1) == (("read <URL> and <URL> now", 2, 0)))
    assert(out(2) == (("plain text with controls", 0, 0)))
    assert(out(3) == (("nothing special", 0, 0)))
  }

  test("redactPii: typed placeholders, per-category counts, specific-first order") {
    val docs = Seq(
      (1L, "call +1 (415) 555-0134 or 555.867.5309 today"),
      (2L, "server 10.0.0.1 and 192.168.100.254 are up"),
      (3L, "ssn 078-05-1120 leaked"),
      (4L, "card 4111 1111 1111 1111 or 4111-1111-1111-1111 paid"),
      (5L, "mail root@example.org now"),
      (6L, "v1.2.3 released; build 1234 of 2024 is fine")
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6)))
    assert(out(0) == (("call <PHONE> or <PHONE> today", 0, 0, 0, 2, 0)))
    assert(out(1) == (("server <IP> and <IP> are up", 0, 0, 2, 0, 0)))
    assert(out(2) == (("ssn <SSN> leaked", 0, 1, 0, 0, 0)))
    // the card pass runs FIRST: neither 16-digit run survives to be
    // half-eaten by the phone pattern
    assert(out(3) == (("card <CC> or <CC> paid", 2, 0, 0, 0, 0)))
    assert(out(4) == (("mail <EMAIL> now", 0, 0, 0, 0, 1)))
    // version strings, short digit runs and years stay untouched
    assert(out(5) == (("v1.2.3 released; build 1234 of 2024 is fine", 0, 0, 0, 0, 0)))
  }

  test("packSequences: blocked prefix sum equals the sequential spec") {
    // 40 docs with varying token counts and sparse, unsorted ids —
    // blockSize 8 forces several blocks, some empty
    val rng = new scala.util.Random(7)
    val rows = scala.util.Random.shuffle((0 until 40).toList).map { i =>
      val id = i.toLong * 3 + 1 // sparse ids
      (id, Seq.fill(1 + rng.nextInt(9))("w").mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, col("doc_id"), col("text"),
        seqLen = 10, blockSize = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // sequential single-threaded spec
    var off = 0L
    rows.sortBy(_._1).foreach { case (id, text) =>
      val n = text.split(" ").length.toLong
      val first = off / 10
      val last = math.max(off, off + n - 1) / 10
      assert(out(id) == ((n, off, first, last, last - first + 1)),
        s"doc $id")
      off += n
    }
  }

  test("packedTexts reassembles the exact token stream in doc-id order") {
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"), // straddles the seq 0/1 boundary at seqLen=5
      (3L, "h")).toDF("doc_id", "text")
    val out = TextOps.packedTexts(docs, col("doc_id"), col("text"),
        seqLen = 5, blockSize = 2)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, 5L, "a b c d e"),
      (1L, 3L, "f g h"))) // final partial sequence
  }

  test("packSequences boundary cases: exact fits and straddles") {
    val docs = Seq(
      (1L, Seq.fill(10)("a").mkString(" ")), // exactly one sequence [0,10)
      (2L, Seq.fill(5)("b").mkString(" ")),  // [10,15) -> seq 1
      (3L, Seq.fill(10)("c").mkString(" ")) // [15,25) -> straddles seqs 1-2
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, col("doc_id"), col("text"),
        seqLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out(0) == ((1L, 0L, 0L, 0L, 1L)))
    assert(out(1) == ((2L, 10L, 1L, 1L, 1L)))
    assert(out(2) == ((3L, 15L, 1L, 2L, 2L)))
  }

  test("lmCoverage: attested transitions counted exactly; empty docs kept at zero") {
    val ref = Seq((100L, "the fast table scan runs")).toDF("doc_id", "text")
    // ref bigrams: {the fast, fast table, table scan, scan runs} each x1
    val docs = Seq(
      (0L, "the fast table"),   // 2 transitions, both attested
      (1L, "zq zq table scan"), // 3 transitions, 1 attested
      (2L, "x"),                // no transitions
      (3L, "")                  // empty doc
    ).toDF("doc_id", "text")
    val out = TextOps.lmCoverage(docs, col("doc_id"), col("text"),
        ref, col("text"))
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2),
      out(i).getLong(3), out(i).getDouble(4))
    assert(row(0) == ((2L, 2L, 2L, 1.0)))
    assert(row(1) == ((3L, 1L, 1L, 0.333333)))
    assert(row(2) == ((0L, 0L, 0L, 0.0)))
    assert(row(3) == ((0L, 0L, 0L, 0.0)))
  }

  test("lmPerplexity ranks in-domain text below garbage") {
    val ref = Seq(
      (100L, "the fast table scan feeds the hash join"),
      (101L, "the hash join feeds the group agg")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "the fast table scan feeds the group agg"), // in-domain
      (1L, "zq vx qp wm kt lr ds bn")                  // garbage
    ).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(docs, col("doc_id"), col("text"),
        ref, col("text"))
      .orderBy("doc_id").collect()
    val fluent = out(0).getDouble(2)
    val garbage = out(1).getDouble(2)
    assert(fluent < garbage,
      s"in-domain ppl $fluent should be below garbage ppl $garbage")
    assert(fluent > 1.0) // smoothing keeps probabilities < 1
  }

  test("extractHtml strips markup, decodes entities once, counts tags/links") {
    val docs = Seq(
      (1L, "<html><head><title> My Page </title><style>b {x}</style>" +
        "<script>if (1 < 2) alert('hi');</script></head>" +
        "<body><p>Hello<br>world</p><!-- secret --><a href=\"http://x\">l</a>" +
        "<a  href=\"http://y\">m</a>&amp;lt; &lt;b&gt;</body></html>"),
      (2L, "no markup at all"),
      (3L, "<ul><li>one</li><li>two</li></ul>")
    ).toDF("doc_id", "html")
    val out = TextOps.extractHtml(docs, col("doc_id"), col("html"))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getString(1) == "My Page")
    // script body (incl. the raw '<') and comment are gone; title and
    // anchor text remain (they are content); entities decode exactly
    // once: &amp;lt; -> &lt; stays literal
    assert(r1.getString(2) == "My Page Hello world l m &lt; <b>")
    assert(r1.getInt(4) == 2, "two anchors")
    val r2 = out(1)
    assert(r2.getString(1) == "" && r2.getString(2) == "no markup at all"
      && r2.getInt(3) == 0 && r2.getInt(4) == 0)
    assert(out(2).getString(2) == "one two")
  }

  test("normalizeUrls canonicalizes and flags host- and domain-level blocks") {
    val docs = Seq(
      (1L, "HTTP://WWW.Ex.COM:80/a/b/?utm_source=z&b=2&a=1#f"),
      (2L, "https://sub.spam.net/x"),
      (3L, "https://cdn.ok.org"),
      (4L, "http://ok.org:8080/p/")
    ).toDF("doc_id", "url")
    val out = TextOps.normalizeUrls(docs, col("doc_id"), col("url"),
        Seq("spam.net", "cdn.ok.org"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(3)))
    assert(out(0) == (("http://ex.com/a/b?a=1&b=2", "ex.com", 0)))
    assert(out(1) == (("https://sub.spam.net/x", "spam.net", 1)),
      "domain-level block catches the subdomain")
    assert(out(2) == (("https://cdn.ok.org/", "ok.org", 1)),
      "host-level block catches the exact host; root path is /")
    assert(out(3) == (("http://ok.org:8080/p", "ok.org", 0)),
      "non-default port survives; trailing slash trimmed")
  }

  test("mixToBudget keeps exactly the budgeted count, rank-stable under growth") {
    val docs = (1L to 30L).map(i =>
      (i, if (i <= 20) "a" else "b")).toDF("doc_id", "source")
    val out = TextOps.mixToBudget(docs, col("doc_id"), col("source"),
        Map("a" -> 5L, "b" -> 100L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.count(_._2 == "a") == 5, "exactly the budget from source a")
    assert(out.count(_._2 == "b") == 10, "short source keeps everything")
    // growing source a only ADDS members in rank order: the kept set at
    // budget 5 is a subset of the kept set at budget 9
    val bigger = TextOps.mixToBudget(docs, col("doc_id"), col("source"),
        Map("a" -> 9L, "b" -> 100L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.subsetOf(bigger), "budget growth must be rank-monotone")
    // absent source drops
    val none = TextOps.mixToBudget(docs, col("doc_id"), col("source"),
      Map("a" -> 5L)).collect()
    assert(none.forall(_.getString(1) == "a"))
  }

  test("mixToBudget blocked rank == the naive window shape on random corpora") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val srcs = 1 + rnd.nextInt(4)
      val n = 50 + rnd.nextInt(200)
      val docs = (1 to n).map(i =>
          (rnd.nextInt(100000).toLong * 1000 + i, s"s${rnd.nextInt(srcs)}"))
        .toDF("doc_id", "source")
      val budgets = (0 until srcs).map(k => s"s$k" -> rnd.nextInt(40).toLong).toMap
      val salt = s"salt$round"
      val hexChars = 1 + rnd.nextInt(4)
      val blocked = TextOps.mixToBudget(docs, col("doc_id"), col("source"),
          budgets, salt, blockHexChars = hexChars)
        .select("doc_id", "source", "mix_rank")
        .collect().map(_.toSeq).toSet
      // the pre-rewrite reference shape, inline
      val rk = md5(concat(col("doc_id").cast("string"), lit(":" + salt))
        .cast("binary"))
      val bCol = budgets.foldLeft(lit(0L)) { case (a, (s2, b)) =>
        when(col("source") === s2, lit(b)).otherwise(a)
      }
      val w = Window.partitionBy(col("source")).orderBy(rk.asc, col("doc_id").asc)
      val naive = docs
        .withColumn("mix_rank", row_number().over(w).cast("long"))
        .filter(col("mix_rank") <= bCol)
        .select("doc_id", "source", "mix_rank")
        .collect().map(_.toSeq).toSet
      assert(blocked == naive,
        s"round $round (srcs=$srcs n=$n hex=$hexChars) diverged")
    }
  }

  test("winnow: shared >= w+k-1 token runs share a fingerprint; short-doc rules") {
    // k=5, w=4 -> the published guarantee kicks in at 8 shared tokens
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"red green blue $shared yellow purple"),
      (3L, "only four tokens here"),          // < k grams -> none
      (4L, "exactly five tokens right here"), // 1 gram -> single pick
      (5L, "totally unrelated content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val fp = TextOps.winnow(docs, col("doc_id"), col("text"), k = 5, w = 4)
    val byDoc = fp.collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "an 8-token shared run must share at least one fingerprint")
    assert((byDoc(1L) & byDoc(5L)).isEmpty,
      "unrelated docs share nothing")
    assert(!byDoc.contains(3L), "fewer than k tokens -> no grams, no picks")
    assert(byDoc(4L).size == 1, "one gram -> the single global pick")
    // positions point INTO the doc: every pos is a valid gram index
    val pos = fp.filter(col("doc_id") === 1).collect().map(_.getInt(1))
    assert(pos.forall(p => p >= 0 && p <= 10), s"bad positions: ${pos.toSeq}")
    // deterministic across runs
    val again = TextOps.winnow(docs, col("doc_id"), col("text"), k = 5, w = 4)
    assert(fp.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }

  test("winnowPairs counts distinct shared fingerprints per candidate pair") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, s"one two three $run"),
      (2L, s"red green blue $run yellow"),
      (3L, "nothing in common with anything else here at all today friend")
    ).toDF("doc_id", "text")
    val fp = TextOps.winnow(docs, col("doc_id"), col("text"), k = 5, w = 4)
    val pairs = graft.dedup.Dedup.winnowPairs(fp, minShared = 2).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    // the shared count is the intersection of the docs' DISTINCT
    // fingerprint sets — recompute it independently
    val sets = fp.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
    assert(pairs(0).getInt(2) == (sets(1L) & sets(2L)).size)
    assert(pairs(0).getInt(2) >= 2)
    // minShared above the overlap -> no pairs
    assert(graft.dedup.Dedup.winnowPairs(fp,
      minShared = (sets(1L) & sets(2L)).size + 1).count() == 0)
  }

  test("c4Clean: line rules and document gates") {
    val five = "Aa bb cc one. Bb cc dd two. Cc dd ee three. Dd ee ff four. Ee ff gg five."
      .replace(". ", ".\n")
    val docs = Seq(
      (1L, five),                                     // 5 good lines: kept
      (2L, s"$five\nno punctuation line here"),       // unpunctuated line dropped
      (3L, s"$five\nplease use javascript now."),     // js line dropped, doc kept
      (4L, s"$five\nvar x = {1};"),                   // brace: doc dropped
      (5L, s"$five\nlorem ipsum dolor sit."),         // lorem: doc dropped
      (6L, "Too. Few. Sentences here now.")           // < 5 sentences: dropped
    ).toDF("doc_id", "text")
    val out = TextOps.c4Clean(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(6)))
    assert(out(0) == ((5, 5, 5, 1)))
    assert(out(1) == ((6, 5, 5, 1)), "bad line dropped, doc survives")
    assert(out(2) == ((6, 5, 5, 1)), "javascript line dropped, doc survives")
    assert(out(3) == ((6, 5, 5, 0)), "brace kills the doc")
    assert(out(4) == ((6, 6, 6, 0)), "lorem kills the doc despite good lines")
    assert(out(5) == ((1, 1, 3, 0)), "one kept line, 3 sentences < 5")
  }

  test("gopherGate: each rule trips on its own signal") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val stops = "the be to of and that have with"
    val docs = Seq(
      (1L, s"$stops $fifty"),                      // passes everything
      (2L, "the be short"),                        // r_words fails (3 words)
      (3L, s"$stops $fifty ### ### ### ### ### ### ### ###"), // symbols
      (4L, s"$fifty alpha beta"),                  // no stopwords: r_stop fails
      (5L, s"$stops $fifty\n- a\n- b\n- c"),       // bullets but under 90%? 3/4 lines
      (6L, s"$stops $fifty\nmore...\ngone…")       // 2/3 ellipsis lines > 30%
    ).toDF("doc_id", "text")
    val out = TextOps.gopherGate(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    def bits(i: Int) = (8 to 14).map(out(i).getInt).mkString
    def kept(i: Int) = out(i).getInt(15)
    assert(bits(0) == "1111111" && kept(0) == 1)
    assert(out(1).getLong(1) == 3L && bits(1).startsWith("0") && kept(1) == 0)
    assert(bits(2)(2) == '0', "symbol rule fails")
    assert(bits(3)(4) == '0', "stopword rule fails")
    assert(bits(4)(5) == '1' && kept(4) == 1, "75% bullet lines still under 0.9")
    assert(bits(5)(6) == '0' && kept(5) == 0, "ellipsis rule fails")
  }

  test("chunkDocs: windows cover every token, overlap by size - stride") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, col("doc_id"), col("text"), size = 32, stride = 24)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 100 tokens, size 32, stride 24 -> ceil(68/24)+1 = 4 chunks
    assert(d1.length == 4)
    val chunks = d1.map(_.getString(3).split(" ").toSeq)
    // full coverage in order: chunk i starts at token i*24
    chunks.zipWithIndex.foreach { case (c, i) =>
      assert(c.head == s"t${i * 24 + 1}", s"chunk $i start")
    }
    assert(chunks.take(3).forall(_.length == 32))
    assert(chunks(3).length == 100 - 3 * 24, "last chunk ends at the final token")
    // consecutive overlap is exactly size - stride tokens
    chunks.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(8) == b.take(8))
    }
    // short and empty docs yield exactly one chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getLong(2) == 2L)
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getLong(2) == 0L && d3(0).getString(3) == "")
  }

  test("chunkDocs plan is narrow (no exchange)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.chunkDocs(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("unicode_normalize: NFC composes, idempotent, NFKC folds compat") {
    val rows = Seq(
      (1L, "cafe\u0301"),       // decomposed -> composed
      (2L, "caf\u00e9"),        // already NFC: unchanged
      (3L, "A\u030angstro\u0308m"), // ring + diaeresis compose
      (4L, "\ufb01ne")          // fi ligature: NFC keeps, NFKC folds
    ).toDF("id", "s")
    val out = rows.select(col("id"),
        graft.functions.unicode_normalize(col("s")).as("nfc"),
        graft.functions.unicode_normalize(col("s"), "NFKC").as("nfkc"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "caf\u00e9")
    assert(out(1).getString(1) == "caf\u00e9")
    assert(out(2).getString(1) == "\u00c5ngstr\u00f6m")
    assert(out(3).getString(1) == "\ufb01ne")
    assert(out(3).getString(2) == "fine", "NFKC folds the ligature")
    // null in, null out
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(graft.functions.unicode_normalize(col("s"))).collect()
    assert(n(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.functions.unicode_normalize(col("s"), "NFX")
    }
  }

  test("tfidfKeywords ranks rare terms above common ones, term tie-break") {
    val docs = Seq(
      (1L, "common zebra common common"),   // zebra unique -> top keyword
      (2L, "common yak common"),
      (3L, "common common apple banana")    // tie on tf*idf -> term order
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out(0) == ((1L, 1, "zebra")), s"got ${out.toSeq}")
    assert(out(2) == ((2L, 1, "yak")))
    // doc 3: apple and banana tie exactly; term breaks the tie
    assert(out(4) == ((3L, 1, "apple")) && out(5) == ((3L, 2, "banana")))
    // scores are deterministic: idf of a unique term > idf of 'common'
    val byDoc = TextOps.tfidfKeywords(docs, col("doc_id"), col("text"), k = 3)
      .collect().map(r => (r.getString(2), r.getDouble(3))).toMap
    assert(byDoc("zebra") > byDoc("common"))
  }

  test("tfidfKeywords adaptive idf-join dispatch: both arms are " +
      "row-identical; the probe routes by vocabulary; zero-token docs " +
      "still count toward n") {
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, s"shared words here w${i} w${i % 7} extra${i % 11}")
    }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getDouble(3))).toSeq
    val viaBroadcast = rows(TextOps.tfidfKeywords(docs, col("doc_id"),
      col("text"), k = 2, broadcastDfreq = Some(true)))
    val viaShuffle = rows(TextOps.tfidfKeywords(docs, col("doc_id"),
      col("text"), k = 2, broadcastDfreq = Some(false)))
    assert(viaBroadcast == viaShuffle, "arms must be row-identical")
    // arm pinning below: with auto-broadcast OFF, a BroadcastHashJoin
    // can only come from the operator's own hint — the observable that
    // separates the arms at unit scale (AQE would otherwise broadcast
    // the tiny dfreq regardless)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // adaptive default: small vocab routes to the broadcast arm
      val qa = TextOps.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
      assert(rows(qa) == viaBroadcast)
      assert(qa.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "a bounded vocabulary must take the broadcast arm")
      // conf <= 0 forces the shuffled join probe-free
      spark.conf.set(GraftConf.TfidfMaxBroadcastTerms, "0")
      try {
        val qs =
          TextOps.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
        val plan = qs.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"),
          s"forced-shuffle arm still broadcasts:\n$plan")
        assert(rows(qs) == viaBroadcast)
      } finally spark.conf.unset(GraftConf.TfidfMaxBroadcastTerms)
      // a vocabulary over the cap routes to the shuffled arm via probe
      spark.conf.set(GraftConf.TfidfMaxBroadcastTerms, "3")
      try {
        val q3 =
          TextOps.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
        assert(!q3.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "an over-cap vocabulary must not broadcast")
        assert(rows(q3) == viaBroadcast)
      } finally spark.conf.unset(GraftConf.TfidfMaxBroadcastTerms)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // zero-token docs count toward n: a doc whose text cleans to no
    // tokens must change idf exactly as an explicit docCount does
    val withEmpty = docs.unionByName(
      Seq((999L, "")).toDF("doc_id", "text"))
    val adaptive = rows(TextOps.tfidfKeywords(withEmpty, col("doc_id"),
      col("text"), k = 2))
    val pinnedN = rows(TextOps.tfidfKeywords(withEmpty, col("doc_id"),
      col("text"), k = 2, docCount = 41L, broadcastDfreq = Some(true)))
    assert(adaptive == pinnedN, "empty docs must stay in the doc count")
  }

  test("tfidfKeywords knownTerms replaces the probe at both extremes " +
      "(no execution at dispatch time; caller vocabulary counts are " +
      "authoritative)") {
    // a Range-backed frame (not a LocalRelation: ConvertToLocalRelation
    // would evaluate projections eagerly in the optimizer), with a text
    // expression that throws on ANY row evaluation: if the dispatch ran
    // its HLL probe — or an implicit docs.count() over the projection —
    // plan construction itself would raise
    val docs = spark.range(8).select(col("id").as("doc_id"),
      concat(lit("alpha beta w"), col("id").cast("string")).as("text"))
    val boom = concat(col("text"),
      expr("raise_error('probe must not run')"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // under the cap -> broadcast arm, probe-free
      val qb = TextOps.tfidfKeywords(docs, col("doc_id"), boom, k = 2,
        docCount = 8L, knownTerms = 10L)
      assert(qb.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "a caller-bounded vocabulary must take the broadcast arm probe-free")
      // over the cap -> shuffled arm, probe-free (exact counts get no
      // HLL headroom: knownTerms = cap itself still broadcasts)
      spark.conf.set(GraftConf.TfidfMaxBroadcastTerms, "10")
      try {
        val qEdge = TextOps.tfidfKeywords(docs, col("doc_id"), boom,
          k = 2, docCount = 8L, knownTerms = 10L)
        assert(qEdge.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "an exact count AT the cap must still broadcast (no deflation)")
        val qs = TextOps.tfidfKeywords(docs, col("doc_id"), boom, k = 2,
          docCount = 8L, knownTerms = 11L)
        assert(!qs.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "a caller-overflowing vocabulary must shuffle probe-free")
      } finally spark.conf.unset(GraftConf.TfidfMaxBroadcastTerms)
      // and the knownTerms routes are row-identical to the pinned arms
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("doc_id", "rank").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getDouble(3))).toSeq
      val pinned = rows(TextOps.tfidfKeywords(docs, col("doc_id"),
        col("text"), k = 2, broadcastDfreq = Some(true)))
      assert(rows(TextOps.tfidfKeywords(docs, col("doc_id"), col("text"),
        k = 2, knownTerms = 10L)) == pinned)
      assert(rows(TextOps.tfidfKeywords(docs, col("doc_id"), col("text"),
        k = 2, knownTerms = 2000000L)) == pinned)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("temperatureQuotas: largest-remainder apportionment, exact totals") {
    val docs = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "mid")) ++
      (101 to 105).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    // alpha = 1: proportional (80/20/5 of 105 is exact)
    val prop = TextOps.temperatureQuotas(docs, col("source"), 1.0, 105L).toMap
    assert(prop == Map("big" -> 80L, "mid" -> 20L, "small" -> 5L))
    // alpha = 0: uniform weights; 10 = 3+3+3 + one remainder bump.
    // all remainders tie -> the bump goes to the lexicographically
    // first source
    val unif = TextOps.temperatureQuotas(docs, col("source"), 0.0, 10L).toMap
    assert(unif.values.sum == 10L)
    assert(unif == Map("big" -> 4L, "mid" -> 3L, "small" -> 3L))
    // alpha = 0.5 flattens: small's share rises vs proportional,
    // big's falls; total always exact
    val sq = TextOps.temperatureQuotas(docs, col("source"), 0.5, 105L).toMap
    assert(sq.values.sum == 105L)
    assert(sq("big") < 80L && sq("small") > 5L)
    // closed-form check of the sqrt path: wq = floor(sqrt(n)*2^20+0.5),
    // base = total*wq div W, bumps by largest (rem, source asc)
    val wq = Map("big" -> 80L, "mid" -> 20L, "small" -> 5L).map {
      case (s2, n) => s2 -> math.floor(math.sqrt(n.toDouble) * 1048576.0 + 0.5).toLong
    }
    val wTot = wq.values.sum
    val base = wq.map { case (s2, w) => s2 -> (105L * w / wTot, 105L * w % wTot) }
    val leftover = (105L - base.values.map(_._1).sum).toInt
    val bump = base.toSeq.sortBy { case (s2, (_, r)) => (-r, s2) }
      .take(leftover).map(_._1).toSet
    val expect = base.map { case (s2, (b, _)) =>
      s2 -> (b + (if (bump(s2)) 1L else 0L)) }
    assert(sq == expect)
    // total 0 and empty corpus degenerate cleanly
    assert(TextOps.temperatureQuotas(docs, col("source"), 0.5, 0L)
      .forall(_._2 == 0L))
    // an integer source column works (cast up front, no opaque
    // ClassCastException); null strata are dropped
    val intSrc = Seq((1L, Some(1)), (2L, Some(1)), (3L, Some(2)),
      (4L, None)).toDF("doc_id", "src")
    val qi = TextOps.temperatureQuotas(intSrc, col("src"), 1.0, 3L).toMap
    assert(qi == Map("1" -> 2L, "2" -> 1L))
  }

  test("mixByTemperature composes quotas into the blocked mix rank") {
    val docs = ((1 to 40).map(i => (i.toLong, "x")) ++
      (41 to 50).map(i => (i.toLong, "y"))).toDF("doc_id", "source")
    val out = TextOps.mixByTemperature(docs, col("doc_id"), col("source"),
        alpha = 0.5, total = 20L)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val quotas = TextOps.temperatureQuotas(docs, col("source"), 0.5, 20L).toMap
    assert(out.count(_._1 == "x") == quotas("x").toInt)
    assert(out.count(_._1 == "y") == quotas("y").toInt)
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted == (1L to rs.size).toSeq }, "per-source ranks dense")
  }

  test("mixToTokenBudget: straddling doc kept, exclusive-prefix gate") {
    // single source, controlled token counts: ranks follow md5 order,
    // so derive the kept set from the naive exclusive cumsum
    val docs = (1L to 12L).map(i => (i, "a", s"tok " * i.toInt))
      .toDF("doc_id", "source", "text")
    val tok = size(graft.functions.tokenize(col("text")))
    val out = TextOps.mixToTokenBudget(docs, col("doc_id"), col("source"),
        tok, Map("a" -> 25L))
      .select("doc_id", "n_tokens", "tok_prefix", "mix_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    // every kept row starts strictly below the budget; the first
    // EXCLUDED rank is exactly where the prefix crosses
    assert(out.nonEmpty && out.forall(_._3 < 25L))
    assert(out.map(_._4).toSeq == (1L to out.size.toLong).toSeq,
      "dense ranks from 1")
    val lastPrefix = out.last._3 + out.last._2
    assert(lastPrefix >= 25L || out.size == 12,
      "either the budget was crossed by the straddler or all docs fit")
    // zero budget drops the source entirely
    assert(TextOps.mixToTokenBudget(docs, col("doc_id"), col("source"),
      tok, Map("a" -> 0L)).count() == 0L)
  }

  test("mixToTokenBudget blocked shape == the naive window on random corpora") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val srcs = 1 + rnd.nextInt(4)
      val n = 50 + rnd.nextInt(200)
      val rows = (1 to n).map(i =>
        (rnd.nextInt(100000).toLong * 1000 + i, s"s${rnd.nextInt(srcs)}",
          rnd.nextInt(30).toLong))
      val docs = rows.toDF("doc_id", "source", "tok")
      val budgets = (0 until srcs)
        .map(k => s"s$k" -> rnd.nextInt(400).toLong).toMap
      val salt = s"tsalt$round"
      val hexChars = 1 + rnd.nextInt(4)
      val blocked = TextOps.mixToTokenBudget(docs, col("doc_id"),
          col("source"), col("tok"), budgets, salt, blockHexChars = hexChars)
        .select("doc_id", "source", "n_tokens", "tok_prefix", "mix_rank")
        .collect().map(_.toSeq).toSet
      val rk = md5(concat(col("doc_id").cast("string"), lit(":" + salt))
        .cast("binary"))
      val bCol = budgets.foldLeft(lit(0L)) { case (a, (s2, b)) =>
        when(col("source") === s2, lit(b)).otherwise(a)
      }
      val w = Window.partitionBy(col("source")).orderBy(rk.asc, col("doc_id").asc)
      val naive = docs
        .withColumn("tok_prefix", coalesce(sum(col("tok"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("mix_rank", row_number().over(w).cast("long"))
        .filter(col("tok_prefix") < bCol)
        .select(col("doc_id"), col("source"), col("tok").as("n_tokens"),
          col("tok_prefix"), col("mix_rank"))
        .collect().map(_.toSeq).toSet
      assert(blocked == naive,
        s"round $round (srcs=$srcs n=$n hex=$hexChars) diverged")
    }
  }

  test("mixToTokenBudget is rank-monotone under budget growth") {
    // growing a token budget must only ADD documents in rank order —
    // the mixToBudget stability contract, in tokens
    val docs = (1L to 40L).map(i => (i, "a", (i % 7) + 1))
      .toDF("doc_id", "source", "tok")
    def kept(b: Long) = TextOps.mixToTokenBudget(docs, col("doc_id"),
        col("source"), col("tok"), Map("a" -> b))
      .collect().map(_.getLong(0)).toSet
    val small = kept(30L)
    val big = kept(90L)
    assert(small.nonEmpty && small.subsetOf(big),
      "token-budget growth must be rank-monotone")
    // and the kept token mass brackets the budget from below (exclusive
    // prefix < budget; overshoot bounded by one straddling doc)
    val toks = docs.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mass = small.toSeq.map(toks).sum
    assert(mass < 30L + 7L + 1L, s"overshoot bounded by one doc, got $mass")
  }

  test("mixToTokenBudget fails loudly on null or negative token counts") {
    val docs = Seq((1L, "a", 5L), (2L, "a", -1L)).toDF("doc_id", "source", "tok")
    val e = intercept[Exception] {
      TextOps.mixToTokenBudget(docs, col("doc_id"), col("source"),
        col("tok"), Map("a" -> 100L)).collect()
    }
    assert(e.getMessage.contains("mixToTokenBudget") ||
      e.getCause != null && e.getCause.getMessage.contains("mixToTokenBudget"))
  }

  test("mixToTokenBudgetByScore == the naive score-ranked window, ties included") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 3) {
      val srcs = 1 + rnd.nextInt(4)
      val n = 50 + rnd.nextInt(200)
      // scores from a SMALL domain so ties are common — equal scores
      // must share a block and resolve by the md5 tiebreak
      val rows = (1 to n).map(i =>
        (rnd.nextInt(100000).toLong * 1000 + i, s"s${rnd.nextInt(srcs)}",
          rnd.nextInt(30).toLong, (rnd.nextInt(9) - 4).toLong))
      val docs = rows.toDF("doc_id", "source", "tok", "sc")
      val budgets = (0 until srcs)
        .map(k => s"s$k" -> rnd.nextInt(400).toLong).toMap
      val salt = s"ssalt$round"
      val nBlocks = Seq(2, 16, 256)(rnd.nextInt(3))
      val blocked = TextOps.mixToTokenBudgetByScore(docs, col("doc_id"),
          col("source"), col("tok"), col("sc"), budgets, salt, nBlocks)
        .select("doc_id", "source", "n_tokens", "tok_prefix", "mix_rank")
        .collect().map(_.toSeq).toSet
      val rk = md5(concat(col("doc_id").cast("string"), lit(":" + salt))
        .cast("binary"))
      val bCol = budgets.foldLeft(lit(0L)) { case (a, (s2, b)) =>
        when(col("source") === s2, lit(b)).otherwise(a)
      }
      val w = Window.partitionBy(col("source"))
        .orderBy(col("sc").desc, rk.asc, col("doc_id").asc)
      val naive = docs
        .withColumn("tok_prefix", coalesce(sum(col("tok"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("mix_rank", row_number().over(w).cast("long"))
        .filter(col("tok_prefix") < bCol)
        .select(col("doc_id"), col("source"), col("tok").as("n_tokens"),
          col("tok_prefix"), col("mix_rank"))
        .collect().map(_.toSeq).toSet
      assert(blocked == naive,
        s"round $round (srcs=$srcs n=$n nBlocks=$nBlocks) diverged")
    }
  }

  test("mixToTokenBudgetByScore keeps top-importance docs; zero budget drops") {
    // one source, distinct scores, uniform token cost: the kept set is
    // exactly the top-by-score prefix the budget affords
    val docs = (1L to 10L).map(i => (i, "a", 10L, i)).toDF(
      "doc_id", "source", "tok", "sc")
    val kept = TextOps.mixToTokenBudgetByScore(docs, col("doc_id"),
        col("source"), col("tok"), col("sc"), Map("a" -> 35L))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("mix_rank")))
      .sortBy(_._2)
    // 35 tokens at 10/doc: ranks 1-3 start below budget, rank 4 is the
    // straddler (exclusive prefix 30 < 35) — top scores are ids 10..7
    assert(kept.map(_._1).toSeq == Seq(10L, 9L, 8L, 7L))
    assert(TextOps.mixToTokenBudgetByScore(docs, col("doc_id"),
      col("source"), col("tok"), col("sc"), Map("a" -> 0L)).count() == 0L)
    // null score fails loudly
    val bad = Seq((1L, "a", 5L, Option.empty[Long]),
      (2L, "a", 5L, Some(3L))).toDF("doc_id", "source", "tok", "sc")
    val e = intercept[Exception] {
      TextOps.mixToTokenBudgetByScore(bad, col("doc_id"), col("source"),
        col("tok"), col("sc"), Map("a" -> 100L)).collect()
    }
    assert(e.getMessage.contains("mixToTokenBudgetByScore") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("mixToTokenBudgetByScore"))
  }
}
