package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `tombstone_live(id)`: true iff `id` is NOT tombstoned in the index at
  * `indexPath` — the DataFrame-side analog of the graph probes'
  * executor-side skip predicate ([[graft.ann.AnnIndex]] scan semantics,
  * reference scan.c:294-300). The tombstone set is resolved ON THE
  * EXECUTOR through the same TTL-cached packed-long file the graph
  * probes binary-search ([[graft.ann.TombstoneCache]]) — no driver-held
  * set rides the plan, a million deletes is an 8 MB artifact read once
  * per executor per TTL. An index with no tombstones short-circuits on
  * an empty cached array. Codegen-friendly: stays inside whole-stage
  * codegen as a static kernel call, so the filter fuses with the
  * partition-pruned parquet scan it sits above. */
case class TombstoneLive(child: Expression, indexPath: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "tombstone_live"

  override def nullSafeEval(v: Any): Any =
    graft.ann.TombstoneCache.isLive(indexPath, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val path = ctx.addReferenceObj("indexPath", indexPath, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.ann.TombstoneCache.isLive($path, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
