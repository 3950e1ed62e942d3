package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time batch operators shared by the declared queries and user code. */
object TimeOps {

  /** Gaps-and-islands sessionization: one shuffle on the key, two window
    * passes. `tsCol` is any monotonic numeric time column; `gap` in the same
    * unit. Identical semantics to Structured Streaming's `session_window`
    * (session extends while inter-event gap <= gap). */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderTieBreak: String,
      gap: Long
  ): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(tsCol, orderTieBreak)
    val lagT = lag(tsCol, 1).over(wOrd)
    df.withColumn("__new_s", when(lagT.isNull || (col(tsCol) - lagT) > gap, 1).otherwise(0))
      .withColumn(
        "sid",
        sum("__new_s").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .drop("__new_s")
  }

  /** Fixed-width tumbling bucket of a numeric time column (by name). */
  def tumble(tsCol: String, width: Long, outScale: Long = 1L): Column =
    expr(s"($tsCol div $width) * ${width / outScale}")
}
