package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ann.{AnnIndex, Metric}
object ScaleProbe {
  /** Peak OLD-GEN driver heap while `f` runs, via the JVM's resettable
    * per-pool peak counters — backs the "vacuum never materializes
    * vectors on the driver" claim with a measured number. Old gen (not
    * total heap) is the right signal: a driver-side collect of the
    * corpus allocates one humongous array that lands in the old/
    * humongous regions, while the torrent of short-lived task-result
    * garbage dies in eden and would swamp a whole-heap poller. */
  private def withOldGenPeak[T](f: => T): (T, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val oldPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP &&
        p.getName.toLowerCase.contains("old"))
    require(oldPools.nonEmpty, "no old-gen heap pool found")
    oldPools.foreach(_.resetPeakUsage())
    val before = oldPools.map(_.getUsage.getUsed).sum
    val r = f
    val peak = oldPools.map(_.getPeakUsage.getUsed).sum
    (r, before, peak)
  }

  def main(args: Array[String]): Unit = {
    // ScaleProbe [n=50000] [threads=8] — e.g. `500000 32` for the
    // half-million-row sweep at local[32]
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val threads = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic synthetic n x 64d corpus
    val df = spark.range(n).select(col("id"),
      expr("transform(sequence(0, 63), j -> cast(sin(id * 131 + j * 17) as float))").as("vec"))
      .cache()
    df.count()
    val dir = java.nio.file.Files.createTempDirectory("scale").toString
    val t0 = System.nanoTime()
    AnnIndex.build(df, "id", "vec", dir,
      AnnIndex.Params(Metric.L2Sq, numShards = threads))
    val buildS = (System.nanoTime() - t0) / 1e9
    val q = Array.tabulate(64)(j => math.sin(12345 * 131 + j * 17).toFloat)
    val t1 = System.nanoTime()
    val r = AnnIndex.topK(spark, dir, q, 10, 64).collect()
    val searchS = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    AnnIndex.topK(spark, dir, q, 10, 64).collect()
    val warmS = (System.nanoTime() - t2) / 1e9
    println(f"build: $buildS%.1fs (${n / buildS}%.0f inserts/s total, $threads shards on $threads threads)")
    println(f"coldSearch: $searchS%.2fs warmSearch: $warmS%.2fs top1=${r.head.getLong(0)}")
    // distributed vacuum with driver-heap high-water: tombstone 1% of
    // the ids, compact, and report peak driver heap relative to the
    // pre-vacuum baseline — the corpus vectors are n x 64 x 4 bytes
    // (e.g. 128 MB at n=500k), and the delta must stay far below that
    AnnIndex.delete(spark, dir,
      (0L until n.toLong).filter(_ % 100 == 37))
    val vacDir = java.nio.file.Files.createTempDirectory("scale_vac").toString
    System.gc()
    val t2b = System.nanoTime()
    val (vacMan, oldBefore, oldPeak) =
      withOldGenPeak(AnnIndex.vacuum(spark, dir, vacDir))
    val vacS = (System.nanoTime() - t2b) / 1e9
    println(f"vacuum: ${vacMan.count}%,d survivors (1%% tombstoned) in " +
      f"$vacS%.1fs; driver OLD-GEN ${oldBefore / 1e6}%.0f -> " +
      f"peak ${oldPeak / 1e6}%.0f MB (delta ${(oldPeak - oldBefore) / 1e6}%.0f MB " +
      f"vs ${n * 64L * 4 / 1e6}%.0f MB of corpus vectors; local mode " +
      f"shares the heap with executor state — ShardCache alone holds " +
      f"${graft.ann.ShardCache.cachedBytes / 1e6}%.0f MB of it, so the " +
      "number is an upper BOUND on driver retention; VacuumSpec pins the " +
      "structural no-LocalRelation guarantee)")
    // batch KNN join sweep: 10k queries x 8 shards in ONE job — pins the
    // topKJoin throughput claim (every query partition probes every
    // shard; shard graphs served from the executor LRU cache)
    val nq = 10000
    val queries = spark.range(nq).select(col("id"),
      expr("transform(sequence(0, 63), j -> cast(sin(id * 977 + j * 17) as float))").as("vec"))
      .cache()
    queries.count()
    AnnIndex.topKJoin(queries.limit(32), "id", "vec", dir, 10, 64).count() // warm caches
    val t3 = System.nanoTime()
    val joined = AnnIndex.topKJoin(queries, "id", "vec", dir, 10, 64).count()
    val joinS = (System.nanoTime() - t3) / 1e9
    println(f"topKJoin: $nq queries x $threads shards -> $joined rows in $joinS%.1fs " +
      f"(${nq / joinS}%.0f queries/s, cacheBytes=${graft.ann.ShardCache.cachedBytes})")
    // routed IVF batch join over the same corpus: nprobe/nCells of the
    // (brute-force) distance work per query vs the graph join's
    // every-shard graph walks — the scan-based trade: no graph
    // artifacts, pruned I/O, CPU linear in probed rows. Cells sized by
    // the FAISS sqrt(n) rule of thumb (~224 for 50k).
    val ivfDir = java.nio.file.Files.createTempDirectory("scale_ivf").toString
    val t4 = System.nanoTime()
    graft.ann.IvfIndex.build(df, "id", "vec", ivfDir,
      graft.ann.IvfIndex.Params(nCells = 256, sampleLimit = 20000))
    val ivfBuildS = (System.nanoTime() - t4) / 1e9
    graft.ann.IvfIndex.topKJoin(queries.limit(32), "id", "vec", ivfDir,
      10, nprobe = 8).count() // warm
    val t5 = System.nanoTime()
    val ivfJoined = graft.ann.IvfIndex.topKJoin(queries, "id", "vec", ivfDir,
      10, nprobe = 8).count()
    val ivfJoinS = (System.nanoTime() - t5) / 1e9
    println(f"ivfJoin: $nq queries x 8/256 cells -> $ivfJoined rows in " +
      f"$ivfJoinS%.1fs (${nq / ivfJoinS}%.0f queries/s; build $ivfBuildS%.1fs)")
    // 13-gram decontamination sweep: 45k train docs x 50 tokens vs a 5k
    // benchmark split — pins the broadcast-semi-join shape's throughput
    // (bench grams distinct+broadcast; the train side only scans). Body
    // tokens are md5-unique per (doc, position) so cross-doc grams never
    // collide by accident; docs with id % 25 == 7 open with a shared
    // 13-token boilerplate run — those ids alternate between the bench
    // (id%50==7 -> id%10==7) and train (id%50==32) splits, so flagged =
    // exactly the 2% of train docs carrying the boilerplate.
    val docsTxt = spark.range(n).select(col("id"),
      expr("concat(case when id % 25 = 7 then " +
        "'b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 ' else '' end, " +
        "array_join(transform(sequence(0, 49), " +
        "j -> concat('w', substr(md5(cast(id * 53 + j as string)), 1, 5))), ' '))")
        .as("text"))
      .cache()
    docsTxt.count()
    val t6 = System.nanoTime()
    val flagged = graft.text.TextOps.ngramDecontaminate(
        docsTxt.filter(col("id") % 10 =!= 7),
        docsTxt.filter(col("id") % 10 === 7),
        col("id"), col("text"), n = 13)
      .filter(col("contaminated")).count()
    val deconS = (System.nanoTime() - t6) / 1e9
    println(f"decontaminate: 45k train vs 5k bench -> $flagged flagged in " +
      f"$deconS%.1fs (${n * 9 / 10 / deconS}%.0f docs/s)")
    // line-level dedup sweep over the same corpus: ~7 8-token lines per
    // doc (~350k lines); the 13-token boilerplate head means its first
    // 8-token chunk is shared by every carrier, so exactly the 2000
    // boilerplate docs (id % 25 == 7, 4% of the corpus) report a
    // duplicated line.
    val t7 = System.nanoTime()
    val nDup = graft.dedup.Dedup.lineDedup(docsTxt, col("id"), col("text"))
      .filter(col("n_dup_lines") > 0).count()
    val lineS = (System.nanoTime() - t7) / 1e9
    println(f"lineDedup: $n docs -> $nDup with duplicated lines in " +
      f"$lineS%.1fs (${n / lineS}%.0f docs/s)")
    // byte-BPE encode sweep: 50k docs of 50 words drawn from the
    // tokenizer's training vocabulary, so the merges actually FIRE
    // (the md5-token corpus above would tokenize byte-per-byte and
    // understate the per-rank pass work). Pins the narrow per-row
    // tokenizer's scan throughput — the number that scales linearly
    // with executors at 100 TB (no shuffle, no state; cost
    // O(merges x bytes) with the presence-set prune).
    val vocabWords = graft.text.TextOps.langStop("en") ++
      Seq("table", "scan", "merge", "join", "filter", "window",
        "batch", "stream", "spark", "data", "query", "hash", "sort",
        "group", "column", "vector", "customer", "order", "value",
        "fast", "slow")
    val vocabSql = vocabWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    val bpeDocs = spark.range(n).select(col("id"),
      expr(s"array_join(transform(sequence(0, 49), " +
        s"j -> element_at($vocabSql, 1 + cast(pmod(id * 53 + j * 7, ${vocabWords.length}) as int))), ' ')")
        .as("text"))
      .cache()
    bpeDocs.count()
    val totalBytes = bpeDocs
      .agg(sum(octet_length(col("text")))).collect()(0).getLong(0)
    val t8 = System.nanoTime()
    val totalToks = bpeDocs
      .agg(sum(graft.functions.bpe_count(col("text")))).collect()(0).getLong(0)
    val bpeS = (System.nanoTime() - t8) / 1e9
    println(f"bpeCount: $n docs ($totalBytes%,d bytes -> $totalToks%,d tokens, " +
      f"${totalBytes.toDouble / totalToks}%.2f bytes/token) in $bpeS%.1fs " +
      f"(${n / bpeS}%.0f docs/s, ${totalBytes / bpeS / 1e6}%.1f MB/s on $threads threads)")
    // guarded-dedup sweep: a planted near-identical boilerplate cluster
    // (10% of the corpus) through BOTH banded candidate paths. The
    // guard-OFF candidate volume is COMPUTED from the bucket stats
    // (sum of C(bn, 2) over buckets) rather than materialized — at
    // n=500k the cluster alone would emit ~1.25e9 pairs per band, which
    // is the exact blowup the guard exists to prevent; the guard-ON
    // path runs for real with default parameters (maxBucket=10000,
    // 16x-median floor) and must stay O(cluster) candidates.
    val nClust = n / 10
    // simhash path: member i flips only bit (i % 64) of the all-zeros
    // center — pairwise hamming <= 2, every band bucket hot at once.
    // Distinct signatures, so exact dedup could NOT collapse them.
    // Banding is 4 x 16 bits (not the 8 x 8 default): at half a million
    // docs an 8-bit band key has only 256 values, so EVERY bucket of a
    // random corpus is ~2000 members and the quadratic candidate count
    // is real corpus-wide work, not skew — the caller-re-shapes-bands
    // case the guard's median floor deliberately refuses to cut. 16-bit
    // keys are the right banding at this decade (the guard then has an
    // actual skew signal to act on).
    val simSig = spark.range(n).select(col("id").as("doc_id"),
      expr(s"case when id < $nClust then " +
        "concat(repeat('0', cast(pmod(id, 64) as int)), '1', " +
        "repeat('0', cast(63 - pmod(id, 64) as int))) " +
        "else lpad(bin(xxhash64(cast(id as string))), 64, '0') end")
        .as("simhash"))
      .cache()
    simSig.count()
    val simOff = simSig
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b as band, " +
          "substring(simhash, b * 16 + 1, 16) as key))")).as("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("bn"))
      .agg(sum(expr("bn * (bn - 1) div 2"))).collect()(0).getLong(0)
    val t9 = System.nanoTime()
    val simOn = graft.dedup.Dedup.simhashPairs(simSig, maxHamming = 3,
      bands = 4).count()
    val simS = (System.nanoTime() - t9) / 1e9
    println(f"simhashGuard: $n docs ($nClust%,d boilerplate) guard-off " +
      f"candidates $simOff%,d (computed), guard-on pairs $simOn%,d in " +
      f"$simS%.1fs (default maxBucket=10000, 16x-median floor)")
    // minhash path: the cluster shares the ENTIRE signature, so all 4
    // bands concentrate into the same mega-bucket simultaneously — the
    // worst case for banded LSH (one hot band suffices elsewhere)
    val mhSig = spark.range(n).select(col("id").as("doc_id"),
      expr(s"case when id < $nClust then sequence(1001L, 1008L) " +
        "else transform(sequence(1, 8), " +
        "j -> xxhash64(concat(cast(id as string), '#', cast(j as string))) " +
        "% 268435456 + 268435456) end").as("sig"))
      .cache()
    mhSig.count()
    val mhOff = mhSig
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b as band, " +
          "element_at(sig, b * 2 + 1) as k0, element_at(sig, b * 2 + 2) as k1))"))
        .as("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("bn"))
      .agg(sum(expr("bn * (bn - 1) div 2"))).collect()(0).getLong(0)
    val t10 = System.nanoTime()
    val mhOn = graft.dedup.Dedup.lshCandidatePairs(mhSig, 8, 4).count()
    val mhS = (System.nanoTime() - t10) / 1e9
    println(f"minhashGuard: $n docs ($nClust%,d fully-shared signatures) " +
      f"guard-off candidates $mhOff%,d (computed), guard-on pairs $mhOn%,d " +
      f"in $mhS%.1fs")
    // connected components AT the driver-regime bound: a 1M-edge random
    // graph over 500k vertices solved by the bounded union-find — wall
    // time and driver old-gen high-water back the "bounded collect"
    // sizing claim with a measured number (the regime's worst case, not
    // its typical near-dup workload, which is orders smaller).
    val ccEdges = 1000000L
    val ccPairs = spark.range(ccEdges).select(
      pmod(expr("xxhash64(concat('a', cast(id as string)))"), lit(500000L))
        .as("doc_a"),
      pmod(expr("xxhash64(concat('b', cast(id as string)))"), lit(500000L))
        .as("doc_b"))
      .cache()
    ccPairs.count()
    System.gc()
    val t11 = System.nanoTime()
    val (ccCount, ccBefore, ccPeak) = withOldGenPeak(
      graft.dedup.Dedup.connectedComponents(ccPairs).count())
    val ccS = (System.nanoTime() - t11) / 1e9
    println(f"ccDriverBound: $ccEdges%,d edges / ~500k vertices -> " +
      f"$ccCount%,d labeled in $ccS%.1fs; driver OLD-GEN " +
      f"${ccBefore / 1e6}%.0f -> peak ${ccPeak / 1e6}%.0f MB " +
      f"(delta ${(ccPeak - ccBefore) / 1e6}%.0f MB at the 1M-pair " +
      "regime bound)")
    spark.stop()
  }
}
