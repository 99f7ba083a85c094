package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-snapshot normalizer for golden tests (reference
  * `lantern.masked_explain` + `_lantern_internal.mask_arrays` /
  * `mask_order_by_in_plan`, lantern_hnsw/sql/lantern.sql:599-654,
  * 888-915): vector literals and run-varying ids are masked so two
  * plans of the same shape compare equal across sessions. */
object MaskedExplain {

  /** Formatted plan with masked literals/ids. */
  def explain(df: DataFrame, mode: String = "formatted"): String =
    mask(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode)))

  def mask(plan: String): String = {
    var s = plan
    // expression ids:  col#123 / col#123L -> col#N
    s = s.replaceAll("#\\d+", "#N")
    // long numeric array literals (query vectors): [0.0, -0.5625, ...] -> [MASKED]
    s = s.replaceAll(
      "\\[\\s*-?\\d+(?:\\.\\d+(?:E-?\\d+)?)?(?:\\s*,\\s*-?\\d+(?:\\.\\d+(?:E-?\\d+)?)?){3,}\\s*\\]",
      "[MASKED]")
    // plan / subquery ids that vary per session
    s = s.replaceAll("(?i)(Subquery(?:Broadcast)?|ReusedExchange|Exchange)\\s+subquery#N",
      "$1 subquery#N")
    s = s.replaceAll("cachedrdd:\\s*\\d+", "cachedrdd: N")
    s = s.replaceAll("(?m)^\\s*$", "")
    s
  }
}
