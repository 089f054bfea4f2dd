package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters, for
  * exposing engine-native Catalyst expressions (graft.functions.DotProduct)
  * through the public Column API — the same technique third-party Spark
  * connectors use since the Spark 4 Column/ColumnNode split.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a one-row/one-column DataFrame as an uncorrelated scalar subquery
    * expression — the form expressions like `BloomFilterMightContain`
    * require for their "constant" side. The subquery executes once per
    * query (Spark subquery reuse), not per row.
    */
  def scalarSubquery(df: DataFrame): Column =
    column(catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed))

  /** Re-root a DataFrame's (already analyzed) plan in another session —
    * the standard way to give one query a session-scoped SQL conf (e.g. a
    * shuffle partition count sized to ITS data) without mutating the
    * caller's session. The analyzed plan is self-contained (relations and
    * functions are resolved), so re-analysis under the target session is a
    * no-op on the subtree.
    */
  def ofRows(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed)
}
