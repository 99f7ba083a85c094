package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Distributed Lloyd's k-means over the engine's own primitives
  * (nearest_centroid_d assignment + vec_sum update). */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("kmeans recovers well-separated clusters") {
    val pts = Seq.tabulate(30) { i =>
      val c = i % 3
      (i.toLong, Seq(c * 10.0 + (i % 5) * 0.25, c * -5.0 + (i % 7) * 0.25))
    }
    val df = pts.toDF("id", "v").repartition(5)
    val (assign, cents) = Clustering.kmeans(df, col("id"), col("v"), 3, 5)
    val m = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = (0 until 3).map(c =>
      m.collect { case (id, l) if id % 3 == c => l }.toSet)
    assert(labels.forall(_.size == 1), s"each true cluster uniform: $labels")
    assert(labels.flatten.toSet.size == 3, "three distinct labels")
    assert(cents.length == 3 && cents.forall(_.length == 2))
  }

  test("assignments and centroids are partition-independent on grid input") {
    val pts = Seq.tabulate(40) { i =>
      (i.toLong, Seq((i % 11) * 0.25, (i % 7) * 0.5, (i % 5) * 1.0))
    }
    def run(parts: Int) = {
      val df = pts.toDF("id", "v").repartition(parts)
      val (a, c) = Clustering.kmeans(df, col("id"), col("v"), 4, 3)
      (a.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq,
        c.map(_.toSeq).toSeq)
    }
    val (a3, c3) = run(3)
    val (a8, c8) = run(8)
    assert(a3 == a8, "assignments identical across partitionings")
    assert(c3 == c8, "centroids bit-identical (exact grid sums)")
  }

  test("an emptied cluster keeps its previous centroid") {
    // two duplicate points: both their seeds are [7.0], the tie breaks
    // to the lower cid, so the higher duplicate seed's cluster empties
    // GUARANTEED on iteration 1 — and its centroid must stay [7.0]
    // (a reset-to-origin bug would leave [0.0], a NaN bug NaN)
    val pts = Seq((0L, Seq(7.0)), (1L, Seq(7.0)), (2L, Seq(50.0)))
    val df = pts.toDF("id", "v")
    val seeds = Clustering.seedCentroids(df, col("id"), col("v"), 3)
    val (assign, cents) = Clustering.kmeans(df, col("id"), col("v"), 3, 2)
    // only 2 of the 3 clusters can have members
    assert(assign.select("cid").distinct().count() == 2)
    // every centroid — including the emptied duplicate's — equals its
    // seed (members of [7.0] average to [7.0], [50.0] to itself)
    assert(cents.map(_.toSeq).toSeq == seeds.map(_.toSeq).toSeq)
  }

  test("kmeans ignores null vectors") {
    val df = Seq((0L, Seq(1.0)), (1L, null: Seq[Double]), (2L, Seq(5.0)))
      .toDF("id", "v")
    val (assign, cents) = Clustering.kmeans(df, col("id"), col("v"), 2, 2)
    val rows = assign.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L), "null row dropped")
    assert(cents.flatten.forall(x => !x.isNaN))
  }

  test("seeding is a pure function of (id, salt)") {
    val df = Seq((5L, Seq(1.0)), (1L, Seq(2.0)), (9L, Seq(3.0)))
      .toDF("id", "v")
    val s1 = Clustering.seedCentroids(df, col("id"), col("v"), 2)
    val s2 = Clustering.seedCentroids(df.repartition(3), col("id"), col("v"), 2)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    // a different salt reorders the md5 ranks: with 3 candidate rows
    // and k=2 the selected/ordered pair must actually move
    val other = Clustering.seedCentroids(df, col("id"), col("v"), 2, salt = "x")
    assert(s1.map(_.toSeq).toSeq != other.map(_.toSeq).toSeq,
      "salt must change the seed selection/order for this fixture")
  }

  test("prototypePrune keeps the hardest fraction of each cluster") {
    // two tight, well-separated clusters with a graded spread: the
    // kept set must be exactly the above-median-distance half of each
    val pts = (0 until 20).map { i =>
      val c = i % 2
      (i.toLong, Seq(c * 100.0 + (i / 2) * 0.5, c * -50.0))
    }
    val df = pts.toDF("id", "v").repartition(4)
    val kept = Clustering.prototypePrune(df, col("id"), col("v"),
        k = 2, iters = 4, keepFrac = 0.5, exact = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // replay naively: full assignments + dists, per-cluster median
    val (assign, cents) = Clustering.kmeans(df, col("id"), col("v"), 2, 4)
    val all = assign.collect().map { r =>
      val id = r.getLong(0); val cid = r.getInt(1)
      val v = pts(id.toInt)._2
      val d = v.zip(cents(cid)).map { case (a, b) => (a - b) * (a - b) }.sum
      (id, cid, d)
    }
    def median(xs: Seq[Double]): Double = {
      val s2 = xs.sorted
      if (s2.size % 2 == 1) s2(s2.size / 2)
      else { val lo = s2(s2.size / 2 - 1); lo + (s2(s2.size / 2) - lo) * 0.5 }
    }
    val med = all.groupBy(_._2).view.mapValues(g => median(g.map(_._3).toSeq)).toMap
    val expect = all.filter { case (_, cid, d) => d > med(cid) }
      .map(t => (t._1, t._2)).toSet
    assert(kept.map(t => (t._1, t._2)).toSet == expect)
    assert(kept.forall { case (_, cid, d) => d > med(cid) })
    // keepFrac = 1 keeps every assigned row
    assert(Clustering.prototypePrune(df, col("id"), col("v"),
      k = 2, iters = 4, keepFrac = 1.0).count() == 20L)
    // approx path agrees away from ties on this well-separated fixture
    val approx = Clustering.prototypePrune(df, col("id"), col("v"),
        k = 2, iters = 4, keepFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(approx == expect, "percentile_approx == exact off-tie")
  }

  test("clusterBalance apportions the budget across learned clusters") {
    // 60/20 imbalanced blobs: alpha = 0.5 must pull quotas toward
    // balance vs the 3:1 proportional split
    val pts = (0 until 80).map { i =>
      val c = if (i < 60) 0 else 1
      (i.toLong, Seq(c * 100.0 + (i % 10) * 0.25, c * 40.0))
    }
    val df = pts.toDF("id", "v").repartition(4)
    val out = Clustering.clusterBalance(df, col("id"), col("v"),
        k = 2, iters = 4, alpha = 0.5, total = 40L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 40, "quotas sum to the total when clusters suffice")
    val byCid = out.groupBy(_._2).view.mapValues(_.length).toMap
    // replay the quota arithmetic over the actual cluster sizes
    val (assign, _) = Clustering.kmeans(df, col("id"), col("v"), 2, 4)
    val sizes = assign.groupBy("cid").count().collect()
      .map(r => r.getInt(0).toString -> r.getLong(1)).toMap
    val quotas = graft.text.TextOps.temperatureQuotas(
      assign.withColumn("c", col("cid").cast("string")), col("c"),
      0.5, 40L).toMap
    assert(byCid.map { case (cid, n) => cid.toString -> n.toLong } == quotas)
    // sqrt flattening: the small cluster gets MORE than its
    // proportional share 40 * size/80
    val small = sizes.minBy(_._2)._1
    assert(quotas(small) > 40L * sizes(small) / 80L)
    // per-cluster ranks are dense from 1
    assert(out.groupBy(_._2).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (1L to rs.size.toLong).toSeq })
    // the whole composition is partitioning-independent
    val again = Clustering.clusterBalance(df.repartition(9), col("id"),
        col("v"), k = 2, iters = 4, alpha = 0.5, total = 40L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.toSet, "selection identical across partitionings")
  }
}
