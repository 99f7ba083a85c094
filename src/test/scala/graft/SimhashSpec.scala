package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The single-pass codegen simhash64 kernel must be bit-for-bit equal to
  * the 64-aggregate-pass SQL formulation it replaced (the form the
  * DuckDB oracle replays) — the round-6 CPU-shape fix must not move a
  * single signature bit. */
class SimhashSpec extends SparkSpec {

  test("codegen simhash64 == 64-pass SQL aggregate form on the real corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val sh = Dedup.shingled(docs, col("doc_id"), col("text")).persist()
    try {
      val kernel = Dedup.simhash64Of(sh)
      val sql = Dedup.simhash64OfSql(sh)
      val diff = kernel.as("k")
        .join(sql.as("s"), col("k.doc_id") === col("s.doc_id"))
        .filter(col("k.simhash") =!= col("s.simhash"))
        .count()
      assert(diff == 0L, s"$diff docs disagree between kernel and SQL form")
      assert(kernel.count() == sh.count())
    } finally sh.unpersist()
  }

  test("simhash64 edge shapes: empty array ties to all zeros; null is null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta")),
      (2L, Seq.empty[String])).toDF("doc_id", "sh")
    val out = Dedup.simhash64Of(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).length == 64 && out(1L).forall(c => c == '0' || c == '1'))
    // zero shingles -> every bit's vote total is 0 -> all '0' (ties lose)
    assert(out(2L) == "0" * 64)
    val withNull = df.select(col("doc_id"),
      when(col("doc_id") === 2L, lit(null)).otherwise(col("sh")).as("sh"))
    val n = Dedup.simhash64Of(withNull)
      .filter(col("doc_id") === 2L).collect()(0)
    assert(n.isNullAt(1))
  }

  test("simhashPairs skew guard: mega-bucket stars bound pairs, keep components") {
    import spark.implicits._
    // a 31-doc near-identical cluster (distinct signatures — exact dedup
    // could NOT collapse these): center 0L = all zeros, member i flips
    // only bit i-1. Pairwise hamming <= 2, so UNGUARDED output is all
    // C(31,2) = 465 pairs — the bucket-squared shape. Plus one isolated
    // small pair far from the cluster (all-ones signatures) that must
    // keep exact all-pairs under the guard.
    val zeros = "0" * 64
    val cluster = (0 to 30).map { i =>
      val s = if (i == 0) zeros
      else zeros.substring(0, i - 1) + "1" + zeros.substring(i)
      (i.toLong, s)
    }
    val farPair = Seq((100L, "1" * 64), (101L, "1" * 63 + "0"))
    val sig = (cluster ++ farPair).toDF("doc_id", "simhash")

    val unguarded = Dedup.simhashPairs(sig, maxBucket = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(unguarded.size == 465 + 1)

    // skewMult = 0: absolute threshold only (this fixture is too small
    // for the relative floor — mean bucket size is single digits)
    val guarded = Dedup.simhashPairs(sig, maxBucket = 5, skewMult = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // every cluster bucket is hot (>= 23 members share any band key), so
    // only the 30 star edges to the center survive + the small far pair
    assert(guarded.size == 30 + 1, s"got ${guarded.keys.toSeq.sorted}")
    assert((1L to 30L).forall(i => guarded.get((0L, i)).contains(1)))
    assert(guarded.get((100L, 101L)).contains(1))
    // emitted hamming values are exact (verified, not estimated)
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val sigs = (cluster ++ farPair).toMap
    guarded.foreach { case ((a, b), h) => assert(h == ham(sigs(a), sigs(b))) }

    // connected components are unchanged by the cap
    def comps(pairs: Map[(Long, Long), Int]) =
      Dedup.connectedComponents(pairs.keys.toSeq.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(guarded) == comps(unguarded))
  }

  test("uniform bucket growth does not trigger the skew guard") {
    import spark.implicits._
    // every bucket the same size and above maxBucket: an absolute-only
    // threshold would star-cap ALL of them (collapsing recall on a
    // merely-large uniform corpus); the relative floor (bn > 16x mean)
    // must keep exact all-pairs because no bucket exceeds the mean
    val groups = 4
    val perGroup = 8 // > maxBucket below, == every other bucket
    val sigs = (0 until groups).flatMap { g =>
      // group g: identical signatures, >= 32 bits from other groups
      val s = ("%2s".format(g.toBinaryString).replace(' ', '0') * 32).take(64)
      (0 until perGroup).map(i => ((g * perGroup + i).toLong, s))
    }
    val sig = sigs.toDF("doc_id", "simhash")
    val exact = Dedup.simhashPairs(sig, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Dedup.simhashPairs(sig, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each group yields C(8,2)=28 within-group pairs at hamming 0
    assert(exact.size == groups * 28)
    assert(guarded == exact,
      "uniform buckets above maxBucket were star-capped despite no skew")
  }

  test("skew floor is the median: a dominant cluster cannot inflate the guard off") {
    import spark.implicits._
    // 24 near-identical docs (one boilerplate cluster) + 40 distinct
    // singletons: cluster buckets have 24 members, singleton buckets 1.
    // The MEDIAN bucket size is 1, so cap = max(5, 16x1) = 16 and the
    // cluster is star-capped. A MEAN-based floor would compute
    // (8x24 + 320x1)/328 = 1.6 -> cap 26 > 24 and never fire — the
    // guard would self-disable on exactly the corpus it exists for.
    val cluster = (0 until 24).map(i => (i.toLong, "0" * 64))
    val singles = (0 until 40).map { i =>
      val sig = (0 until 8).map { b =>
        val v = 1 + ((i * 13 + b * 29) % 255)
        ("0" * 8 + v.toBinaryString).takeRight(8)
      }.mkString
      (100L + i, sig)
    }
    val sig = (cluster ++ singles).toDF("doc_id", "simhash")
    val unguarded = Dedup.simhashPairs(sig, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.size == 24 * 23 / 2) // the cluster's all-pairs only
    val guarded = Dedup.simhashPairs(sig, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star edges to the cluster minimum only — bounded output
    assert(guarded == (1 until 24).map(i => (0L, i.toLong)).toSet)
  }

  test("comboBlocks block-combination banding emits the same verified " +
      "pair set as single-band banding (both pigeonhole-complete)") {
    import spark.implicits._
    // deterministic pseudo-random base signatures (pairwise far apart
    // with overwhelming probability) + planted neighbors at hamming
    // 1, 3 (kept) and 4 (excluded at maxHamming = 3)
    val rnd = new scala.util.Random(7)
    def randSig() =
      Seq.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString
    def flip(s: String, bits: Seq[Int]) = bits.foldLeft(s)((t, b) =>
      t.substring(0, b) + (if (t(b) == '1') '0' else '1') +
        t.substring(b + 1))
    val base = Seq.tabulate(40)(i => (i.toLong, randSig()))
    val plants = Seq(
      (100L, flip(base(0)._2, Seq(3))),
      (101L, flip(base(1)._2, Seq(5, 9, 60))),
      (102L, flip(base(2)._2, Seq(1, 17, 33, 49))))
    val sig = (base ++ plants).toDF("doc_id", "simhash")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").intValue())).toSet
    val legacy = pairs(Dedup.simhashPairs(sig, maxHamming = 3, bands = 4))
    val combo = pairs(Dedup.simhashPairs(sig, maxHamming = 3,
      comboBlocks = 6))
    assert(combo == legacy,
      s"combination-key candidates missed or invented pairs:\n" +
        s"legacy $legacy\ncombo $combo")
    assert(legacy.contains((0L, 100L, 1)) && legacy.contains((1L, 101L, 3)))
    assert(!legacy.exists(p => p._2 == 102L), "hamming-4 plant leaked in")
    // the guard rides combination buckets unchanged: a 24-doc
    // identical-signature cluster star-caps to 23 center edges
    val cluster = (0 until 24).map(i => (i.toLong, "0" * 64))
    val csig = cluster.toDF("doc_id", "simhash")
    val guarded = Dedup.simhashPairs(csig, maxHamming = 3,
        comboBlocks = 6, maxBucket = 5, skewMult = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == (1 until 24).map(i => (0L, i.toLong)).toSet)
  }

  test("comboBlocks = -1 routes single-band under comboMinDocs, combo above, " +
      "same rows on both arms (the dispatch discipline)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def randSig() =
      Seq.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString
    def flip(s: String, bits: Seq[Int]) = bits.foldLeft(s)((t, b) =>
      t.substring(0, b) + (if (t(b) == '1') '0' else '1') +
        t.substring(b + 1))
    val base = Seq.tabulate(30)(i => (i.toLong, randSig()))
    val plants = Seq((200L, flip(base(4)._2, Seq(2))),
      (201L, flip(base(5)._2, Seq(8, 21, 55))))
    val sig = (base ++ plants).toDF("doc_id", "simhash")
    // arm detection: combo keys fold bit-strings to longs via
    // conv(bits, 2, 10); the single-band arm keys on raw substrings
    // and never plans a conv
    def usesCombo(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("conv(")
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").intValue())).toSet

    // 32 docs, default threshold 1M: the adaptive arm is single-band
    val auto = Dedup.simhashPairs(sig, maxHamming = 3, bands = 4,
      comboBlocks = -1)
    assert(!usesCombo(auto), "small corpus must take the single-band arm")
    val want = run(Dedup.simhashPairs(sig, maxHamming = 3, bands = 4))
    assert(run(auto) == want)

    // threshold forced to 0 via the conf: the adaptive arm is combo —
    // rows STILL identical (the output is banding-independent)
    spark.conf.set(GraftConf.SimhashComboMinDocs, "0")
    try {
      val combo = Dedup.simhashPairs(sig, maxHamming = 3, bands = 4,
        comboBlocks = -1)
      assert(usesCombo(combo), "large corpus must take the combo arm")
      assert(run(combo) == want,
        "dispatch arms must emit identical verified pairs")
    } finally spark.conf.unset(GraftConf.SimhashComboMinDocs)

    // knownDocs is trusted in both directions: a huge claim flips a
    // tiny frame to combo with no count job; absent it, the 32-row
    // frame above resolved small through stats/count
    val byKnown = Dedup.simhashPairs(sig, maxHamming = 3, bands = 4,
      comboBlocks = -1, knownDocs = 5000000L)
    assert(usesCombo(byKnown), "knownDocs >= threshold must route combo")
    assert(run(byKnown) == want)
  }

  test("a null shingle element votes -1 everywhere, matching the SQL form") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Option("alpha beta gamma"), None, Option("beta gamma delta"))),
      (2L, Seq(Option.empty[String]))).toDF("doc_id", "sh")
    val kernel = Dedup.simhash64Of(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sql = Dedup.simhash64OfSql(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == sql)
    assert(kernel(2L) == "0" * 64) // lone null element: all votes -1
  }

  test("simhash64 registers as a SQL function") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a b c', 'b c d')) AS s").collect()(0).getString(0)
    assert(r.length == 64)
  }
}
