package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval join — an operator Spark has no shuffle-based
  * plan for: a bare `point >= lo AND point < hi` condition plans as a
  * broadcast nested-loop / cartesian product, O(|points| x |intervals|).
  *
  * The bucketed formulation is the standard fix (Flink interval joins and
  * Spark range-join hints in other engines use the same shape): quantize the
  * value domain into fixed-width buckets, explode each interval to every
  * bucket it overlaps, tag each point with its bucket, equi-join on the
  * bucket id (ONE shuffle, hash-partitioned), and re-check the exact range
  * predicate. Cost is |points| + sum(interval_width/bucketWidth) join rows —
  * linear, never the cross product. Pick `bucketWidth` near the median
  * interval width: too small explodes intervals, too large fans buckets.
  */
object RangeJoin {

  /** Join `points` to every interval containing them.
    * @param points      left side; `pointCol` is a numeric column
    * @param intervals   right side with [`loCol`, `hiCol`) half-open bounds
    * @param bucketWidth quantization width (same units as the point column)
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    // Degenerate intervals (hi <= lo) are empty under half-open semantics
    // and MUST be dropped before the explode: sequence() steps DOWNWARD
    // when hi's bucket precedes lo's, which would replicate the interval
    // into buckets it doesn't overlap.
    // half-open [lo, hi): the last overlapped bucket is the one containing
    // the largest value strictly below hi
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn(
        "__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol))))
      )
    val pts = points.withColumn("__bucket", bucketOf(col(pointCol)))
    pts
      .join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
