package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator the reference lacks and Spark has
  * no built-in for (SURVEY.md §2.3). For each left row, attach the payload of
  * the latest right row with the same keys and right.ts <= left.ts.
  *
  * Implementation: union both sides, one shuffle on the keys, running
  * `last(payload, ignoreNulls)` over (ts, side) ordering. Unlike a range
  * theta-join this never forms candidate pairs, so it scales linearly in
  * rows — the correct shape for 100 TB event tables.
  */
object AsOf {
  /** The payload is carried as ONE struct of all payload columns (`last`
    * over the struct, ignoreNulls): the match is atomic per right row — a
    * right row whose payload value is legitimately NULL still wins (the
    * struct itself is non-null), and all attached columns always come from
    * the same right row, matching DuckDB ASOF JOIN semantics. A left row
    * with no prior right row gets NULL in every payload column. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      suffix: String = "_asof"
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType = StructType(payloadCols.map(p => right.schema(p)))

    // left side: own columns + a null payload struct
    val l2 = left
      .select(leftCols.map(col) :+ lit(null).cast(payType).as("__pay"): _*)
      .withColumn("__side", lit(1))
    // right side: keys + ts + payload struct, null for left-only columns
    val lOnly = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val r2 = right
      .select(
        (keys :+ tsCol).map(col) ++
          lOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payloadCols.map(col): _*).as("__pay"): _*
      )
      .withColumn("__side", lit(0))
      .select(l2.columns.filter(_ != "__side").map(col) :+ col("__side"): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2
      .unionByName(r2)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
    val expanded = payloadCols.foldLeft(carried) { (df, p) =>
      df.withColumn(p + suffix, col("__pay").getField(p))
    }
    expanded.filter(col("__side") === 1).drop("__side", "__pay")
  }
}
