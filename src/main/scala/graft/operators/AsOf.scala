package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

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
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      suffix: String = "_asof"
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = payloadCols.map(_ + suffix)
    val rSchema = right.schema

    def fieldType(name: String): StructField = rSchema(name)

    // left side: own columns + null payload slots
    val l2 = left
      .select(
        leftCols.map(col) ++
          payloadCols.map(p => lit(null).cast(fieldType(p).dataType).as(p + suffix)): _*
      )
      .withColumn("__side", lit(1))
    // right side: keys + ts + payload, null for left-only columns
    val lOnly = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val r2 = right
      .select(
        (keys :+ tsCol).map(col) ++
          lOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(p => col(p).as(p + suffix)): _*
      )
      .withColumn("__side", lit(0))
      .select(l2.columns.filter(_ != "__side").map(col) :+ col("__side"): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = pay.foldLeft(l2.unionByName(r2)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
