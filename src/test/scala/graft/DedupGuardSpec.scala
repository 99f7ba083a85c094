package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The round-7 unification: every LSH candidate path (MinHash bands,
  * hyperplane sign bands, simhash bit bands) shares the default-on
  * mega-bucket star guard of `Dedup.pairsFromBuckets`. The MinHash path
  * is the most dangerous one — near-identical docs share the ENTIRE
  * signature, so one boilerplate cluster makes every band the same
  * mega-bucket simultaneously. These specs pin the guard's behavior and
  * BOTH misfire directions on that path, mirroring SimhashSpec's
  * discipline for the simhash path.
  */
class DedupGuardSpec extends SparkSpec {

  test("minhash mega-cluster: every band hot at once, star cap bounds candidates, components unchanged") {
    import spark.implicits._
    // 50 near-identical docs share the FULL signature (exact dedup could
    // not collapse them: same shingle minima, different bytes), so all 4
    // bands concentrate into the same 50-member bucket — the unguarded
    // shape is C(50,2) = 1225 pairs from EACH of 4 bands. Plus one far
    // pair agreeing on band 0 only (must keep exact all-pairs) and 40
    // distinct singletons that anchor the median at 1.
    val clusterSig = (1 to 8).map(_ * 1000L)
    val cluster = (0L to 49L).map(i => (i, clusterSig))
    val farPair = Seq(
      (100L, Seq(9991L, 9992L, 7L, 8L, 9L, 10L, 11L, 12L)),
      (101L, Seq(9991L, 9992L, 17L, 18L, 19L, 20L, 21L, 22L)))
    val singles = (0 until 40).map { i =>
      (200L + i, (1 to 8).map(j => 100000L + i * 16L + j))
    }
    val sig = (cluster ++ farPair ++ singles).toDF("doc_id", "sig")

    val unguarded = Dedup.lshCandidatePairs(sig, 8, 4, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.size == 50 * 49 / 2 + 1)

    // DEFAULT skewMult: median bucket is a singleton, so the cap is
    // max(5, 16x1) = 16 < 50 and the cluster is star-capped in every band
    val guarded = Dedup.lshCandidatePairs(sig, 8, 4, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == ((1L to 49L).map(i => (0L, i)).toSet + ((100L, 101L))),
      s"expected 49 star edges + the small far pair, got ${guarded.size}")

    // connected components are unchanged by the cap
    def comps(pairs: Set[(Long, Long)]) =
      Dedup.connectedComponents(pairs.toSeq.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(guarded) == comps(unguarded))
  }

  test("bucketGuardStats: telemetry counts the cap's exact candidate trade") {
    import spark.implicits._
    // the mega-cluster fixture: 50 docs in one bucket per band (4
    // bands), 40 singletons anchoring the median at 1, the far pair in
    // ONE band-0 bucket of size 2. With maxBucket=5, skewMult=16 the
    // cap is max(5, 16*1) = 16, so the 4 cluster buckets cap and
    // nothing else: per bucket 49 star edges instead of C(50,2)=1225
    // pairs -> 1176 dropped, times 4 bands.
    val clusterSig = (1 to 8).map(_ * 1000L)
    val cluster = (0L to 49L).map(i => (i, clusterSig))
    val farPair = Seq(
      (100L, Seq(9991L, 9992L, 7L, 8L, 9L, 10L, 11L, 12L)),
      (101L, Seq(9991L, 9992L, 17L, 18L, 19L, 20L, 21L, 22L)))
    val singles = (0 until 40).map { i =>
      (200L + i, (1 to 8).map(j => 100000L + i * 16L + j))
    }
    val sig = (cluster ++ farPair ++ singles).toDF("doc_id", "sig")
    val (banded, keys) = Dedup.bandedOf(sig, 8, 4)
    val g = Dedup.bucketGuardStats(banded, keys, maxBucket = 5,
      skewMult = 16.0).head()
    assert(g.getLong(1) == 50L, s"max_bucket: $g")     // the hot bucket
    assert(g.getLong(2) == 16L, s"cap: $g")            // 16 x median 1
    assert(g.getLong(3) == 4L, s"n_capped: $g")        // one per band
    assert(g.getLong(4) == 200L, s"rows_in_capped: $g")
    assert(g.getLong(5) == 4 * 49L, s"star_edges: $g")
    assert(g.getLong(6) == 4 * (1225L - 49L), s"pairs_dropped: $g")
    // and on the guard-quiet shape the telemetry reads zero — the
    // guard-on == guard-off invariant as a measurable number
    val quiet = Dedup.bucketGuardStats(banded, keys).head()
    assert(quiet.getLong(3) == 0L && quiet.getLong(6) == 0L,
      s"default thresholds must not cap this fixture: $quiet")
  }

  test("minhash uniform bucket growth does not trigger the guard") {
    import spark.implicits._
    // every band bucket the same size and above maxBucket: an
    // absolute-only threshold would star-cap ALL of them (collapsing
    // recall on a merely-large uniform corpus); the median floor
    // (cap = max(maxBucket, 16 x median)) must keep exact all-pairs
    val groups = 4
    val perGroup = 8 // > maxBucket below, == every other bucket
    val sigs = (0 until groups).flatMap { g =>
      val s = (1 to 8).map(j => (g + 1) * 1000L + j)
      (0 until perGroup).map(i => ((g * perGroup + i).toLong, s))
    }
    val sig = sigs.toDF("doc_id", "sig")
    val exact = Dedup.lshCandidatePairs(sig, 8, 4, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == groups * perGroup * (perGroup - 1) / 2)
    val guarded = Dedup.lshCandidatePairs(sig, 8, 4, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == exact,
      "uniform buckets above maxBucket were star-capped despite no skew")
  }

  test("hyperplane path: dominant cluster capped under DEFAULT skewMult (median floor)") {
    import spark.implicits._
    // 24 identical all-positive vectors (one boilerplate cluster: both
    // 8-bit sign bands hot) + 40 diverse vectors whose sign bytes are
    // pairwise distinct in each band (singleton buckets -> median 1).
    // A mean-based floor would see (2x24 + 80x1)/82 = 1.6 -> cap 26 > 24
    // and self-disable on exactly the corpus the guard exists for; the
    // median floor gives cap = max(5, 16x1) = 16 and the cluster stars.
    val dim = 16
    val planes: Seq[Seq[Float]] = (0 until 16).map(p =>
      (0 until dim).map(j => if (j == p) 1.0f else 0.0f))
    val cluster = (0L until 24L).map(i => (i, Seq.fill(dim)(1.0f)))
    val singles = (0 until 40).map { i =>
      val pattern = i | ((64 + i) << 8) // distinct low byte AND high byte
      (200L + i, (0 until dim).map(j =>
        if ((pattern & (1 << j)) != 0) 1.0f else -1.0f))
    }
    val df = (cluster ++ singles).toDF("id", "v")
    val unguarded = Dedup.hyperplanePairs(df, col("id"), col("v"), planes,
        bands = 2, bitsPerBand = 8, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.size == 24 * 23 / 2)
    val guarded = Dedup.hyperplanePairs(df, col("id"), col("v"), planes,
        bands = 2, bitsPerBand = 8, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == (1L until 24L).map(i => (0L, i)).toSet)
  }

  test("connectedComponents: driver union-find and distributed loop agree") {
    import spark.implicits._
    // a chain (worst case for label propagation), a clique, an isolated
    // pair, and self-crossing edges — components must be identical on
    // the bounded driver path (default) and the distributed loop
    // (forced via driverEdgeLimit = 0)
    val pairs = ((1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq ++
      Seq((100L, 101L), (100L, 102L), (101L, 102L), (200L, 201L),
        (102L, 100L), (5L, 3L)))
      .toDF("doc_a", "doc_b")
    def comps(limit: Long) =
      Dedup.connectedComponents(pairs, driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = comps(Long.MaxValue)
    val dist = comps(0L)
    assert(driver == dist)
    // the chain collapses to min id 1, the clique to 100, the pair to 200
    assert((1L to 30L).forall(i => driver(i) == 1L))
    assert(Seq(100L, 101L, 102L).forall(i => driver(i) == 100L))
    assert(driver(200L) == 200L && driver(201L) == 200L)
    // int-typed id columns work in BOTH regimes and emit the same
    // long schema (the up-front cast - regimes must never produce
    // size-dependent schemas or a driver-path ClassCastException)
    val intPairs = Seq((1, 2), (2, 3), (10, 11)).toDF("doc_a", "doc_b")
    for (limit <- Seq(Long.MaxValue, 0L)) {
      val cc = Dedup.connectedComponents(intPairs, driverEdgeLimit = limit)
      assert(cc.schema.fields.map(_.dataType).forall(
        _ == org.apache.spark.sql.types.LongType))
      assert(cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }
  }

  test("connectedComponents: regimes agree on random graphs (seeded)") {
    import spark.implicits._
    // randomized equivalence sweep over graphs with duplicate edges,
    // reversed duplicates and self-loops — shapes the deterministic
    // fixture does not cover
    for (seed <- Seq(7L, 23L, 61L)) {
      val rnd = new java.util.Random(seed)
      val n = 40
      val pairs = (Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq((5L, 5L))) // self-loop
        .toDF("doc_a", "doc_b")
      def comps(limit: Long) =
        Dedup.connectedComponents(pairs, driverEdgeLimit = limit)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps(Long.MaxValue) == comps(0L),
        s"regimes disagree for seed $seed")
    }
  }

  test("connectedComponents fails fast on ids that do not cast to long") {
    import spark.implicits._
    // a string/UUID id column try_casts to NULL; without the up-front
    // check the driver regime NPEs and the distributed regime silently
    // collapses all vertices into one null row (dedup becomes a no-op).
    // Both regimes must instead refuse with an actionable message.
    val bad = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"))
      .toDF("doc_a", "doc_b")
    for (limit <- Seq(Long.MaxValue, 0L)) {
      val ex = intercept[IllegalArgumentException] {
        Dedup.connectedComponents(bad, driverEdgeLimit = limit).collect()
      }
      assert(ex.getMessage.contains("cast to long"), ex.getMessage)
    }
    // numeric STRINGS are fine in both regimes (the cast succeeds)
    val numeric = Seq(("1", "2"), ("2", "3")).toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(numeric)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("contract call shapes see no guard effect at test scale (hashes stay stable)") {
    import spark.implicits._
    // the q_lsh_pairs shape on the real corpus: the default-on guard
    // must not change a single candidate at sf scale (no mega-buckets
    // there) — this is the invariant that keeps the contract hashes
    // identical to the guard-off rounds 1-6
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val sig = Dedup.minhashSignature(docs, col("doc_id"), col("text"))
      .persist()
    try {
      val off = Dedup.lshCandidatePairs(sig, 8, 4, maxBucket = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val on = Dedup.lshCandidatePairs(sig, 8, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(on == off)
    } finally sig.unpersist()
  }
}
