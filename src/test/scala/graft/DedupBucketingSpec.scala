package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.dedup.Dedup
import graft.sources.Bucketing

/** The contract dedup path reads its corpus-sided frames (shingles,
  * signatures) from tables bucketed by doc_id: jaccardVerify joins the
  * shingle table twice per candidate batch, and the bucketed side must
  * plan WITHOUT an Exchange — the pairs side shuffles, the corpus
  * never re-does. (Round-4 review item #5: the helpers existed but the
  * contract path didn't exercise them.) */
class DedupBucketingSpec extends SparkSpec {

  import spark.implicits._

  test("jaccardVerify over a bucketed shingle table shuffles only the pairs side") {
    val dbLoc = Files.createTempDirectory("graft_dedup_bkt").toString
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val sh = Dedup.shingled(docs, col("doc_id"), col("text"))
    Bucketing.writeBucketed(sh, "graft_dbkt", "shingled", "doc_id", 4,
      sortCols = Seq("doc_id"), location = Some(dbLoc))
    val shB = Bucketing.readBucketed(spark, "graft_dbkt", "shingled")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force merge joins: a broadcast of the pairs side would have no
      // shuffle anywhere and prove nothing about the corpus side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val pairs = Seq((0L, 1L), (2L, 3L), (10L, 11L))
        .toDF("doc_a", "doc_b")
      val verified = Dedup.jaccardVerify(shB, pairs)
      val plan = verified.queryExecution.executedPlan
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.length == 2, s"expected two merge joins:\n$plan")
      // each join's shingle side must be a bucketed scan fed to the
      // join with NO Exchange in between (the pairs/intermediate side
      // shuffles — one Exchange per join, and only there)
      joins.foreach { j =>
        val shingleSide = Seq(j.left, j.right).filter { side =>
          side.collect {
            case sc: FileSourceScanExec if sc.bucketedScan => sc
          }.nonEmpty &&
          side.collect { case e: ShuffleExchangeExec => e }.isEmpty
        }
        assert(shingleSide.nonEmpty,
          s"join has no exchange-free bucketed side:\n$j")
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length == 2,
        s"expected exactly the two pairs-side shuffles, got ${shuffles.length}:\n$plan")
      // and the numbers are right (0/1 and 2/3 are near-dup planted
      // pairs or at least valid doc ids; jaccard must be defined)
      val rows = verified.collect()
      assert(rows.length == 3)
      assert(rows.forall(r => !r.isNullAt(r.fieldIndex("jaccard"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS `graft_dbkt`.`shingled`")
      spark.sql("DROP DATABASE IF EXISTS `graft_dbkt`")
    }
  }
}
