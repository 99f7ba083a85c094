package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** SemDeDup-style semantic near-dup pairs: coarse k-means blocking +
  * banded hyperplane LSH + exact cosine verify. */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  // 8 deterministic sign planes (2 bands x 4 bits)
  private val planes: Seq[Seq[Float]] = (0 until 8).map { p =>
    (0 until dim).map(j => if (((p * 7 + j * 3) % 5) < 2) 1.0f else -1.0f)
  }

  private def vec(base: Array[Float], eps: Float, j: Int): Seq[Float] =
    base.zipWithIndex.map { case (x, i) =>
      x + (if (i == j % dim) eps else 0f) }.toSeq

  test("finds near-dups within clusters, verified by exact cosine") {
    val a = Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val b = Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f)
    val docs = Seq(
      (1L, vec(a, 0.001f, 1)), // near-dup pair in cluster A
      (2L, vec(a, 0.002f, 2)),
      (3L, Seq(5f, 0f, 4f, 4f, 0f, 0f, 3f, 0f)), // A-side but far in angle
      (11L, vec(b, 0.001f, 3)), // near-dup pair in cluster B
      (12L, vec(b, 0.002f, 4)),
      (13L, Seq(0f, 5f, 0f, 4f, 4f, 0f, 0f, 3f))).toDF("doc_id", "v")
    val centroids = Array(a, b)
    val pairs = Dedup.semanticPairs(docs, col("doc_id"), col("v"),
        centroids, planes, bands = 2, bitsPerBand = 4, maxDist = 0.001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (11L, 12L)))
  }

  test("verification bounds the output: angular outliers never pair") {
    val a = Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    // same cluster, same sign bands as the near-dups is possible — but
    // cosine distance to them is far above maxDist, so the exact
    // verify drops every candidate it appears in
    val docs = Seq(
      (1L, vec(a, 0.001f, 1)),
      (2L, vec(a, 0.002f, 2)),
      (3L, Seq(10f, 0f, 3f, 0f, 1f, 0f, 0f, 0f))).toDF("doc_id", "v")
    val pairs = Dedup.semanticPairs(docs, col("doc_id"), col("v"),
        Array(a), planes, bands = 2, bitsPerBand = 4, maxDist = 1e-4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedup keeps the group minimum plus every unclustered row") {
    val a = Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val b = Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f)
    val docs = Seq(
      (1L, vec(a, 0.001f, 1)), (2L, vec(a, 0.002f, 2)),
      (3L, Seq(5f, 0f, 4f, 4f, 0f, 0f, 3f, 0f)),
      (11L, vec(b, 0.001f, 3)), (12L, vec(b, 0.002f, 4)),
      (13L, Seq(0f, 5f, 0f, 4f, 4f, 0f, 0f, 3f))).toDF("doc_id", "v")
    val kept = Dedup.semanticDedup(docs, col("doc_id"), col("v"),
        Array(a, b), planes, bands = 2, bitsPerBand = 4, maxDist = 0.001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // groups {1,2} and {11,12} collapse to their minima; the angular
    // outliers 3 and 13 never pair and survive untouched
    assert(kept == Set(1L, 3L, 11L, 13L))
  }

  test("composes with an IVF index's quantizer (shared coarse clustering)") {
    val pts = (0 until 4).flatMap { c =>
      val base = Array.tabulate(dim)(i => if (i == c * 2) 10f else 0f)
      (0 until 10).map(j => ((c * 10 + j).toLong, vec(base, 0.01f * j, j)))
    }
    val df = pts.toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("semivf").toString
    val cents = graft.ann.IvfIndex.build(df, "id", "v", dir,
      graft.ann.IvfIndex.Params(nCells = 4, metric = graft.ann.Metric.Cos,
        sampleLimit = pts.length, seed = 7L))
    val pairs = Dedup.semanticPairs(df, col("id"), col("v"),
        cents, planes, bands = 2, bitsPerBand = 4, maxDist = 1e-4)
      .collect()
    // every cluster's ten jittered copies are mutual near-dups
    assert(pairs.length >= 4 * 30) // >= C(10,2) x 4 minus band misses
    // and no pair crosses clusters (ids 0-9, 10-19, ...)
    assert(pairs.forall(r => r.getLong(0) / 10 == r.getLong(1) / 10))
  }
}
