package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile facade over Spark's two built-in percentile aggregates, with
  * the scale trade-off made explicit instead of implicit in query text
  * (reference surface: the Polars `quantile` calls prescribed in
  * README.md:119-127 / examples/basic_usage.py).
  *
  * `exact = true` routes to `percentile`: a single TypedImperativeAggregate
  * buffer that holds and sorts EVERY value of a group — exact, but
  * per-group memory is O(group rows), so it only survives groups known to
  * fit in one executor's heap (q10/x42 at bench scale qualify; a 100 TB
  * group does not).
  *
  * `exact = false` (the default — the 100 TB path) routes to
  * `approx_percentile`: a mergeable bounded-memory sketch computed with
  * map-side partials, rank error at most n/accuracy (x58 verifies the
  * bound in-engine against exact ranks).
  */
object Quantiles {

  /** Column label for fraction f: 0.05 -> p05, 0.5 -> p50, 0.999 -> p99_9. */
  private[operators] def label(f: Double): String = {
    // scale-then-strip dodges double artifacts (0.05*100 = 5.000000000000001)
    val pct = BigDecimal(f * 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    val base = if (pct.contains(".")) pct.replace(".", "_") else f"${pct.toDouble}%02.0f"
    s"p$base"
  }

  /** Quantiles of `valueCol` at `fractions`, grouped by `keys` (empty keys
    * = one global row). All fractions share ONE aggregation buffer — a
    * single sort (exact) or sketch (approx) instead of one per fraction —
    * and surface as one named column each (`p05`, `p50`, ...). */
  def quantiles(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      fractions: Seq[Double],
      exact: Boolean = false,
      accuracy: Int = 10000
  ): DataFrame = {
    require(fractions.nonEmpty, "at least one fraction")
    require(fractions.forall(f => f >= 0.0 && f <= 1.0), s"fractions must be in [0,1]: $fractions")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val arr = fractions.map(f => s"${f}D").mkString("array(", ", ", ")")
    val aggCol =
      if (exact) expr(s"percentile($valueCol, $arr)")
      else expr(s"approx_percentile($valueCol, $arr, $accuracy)")
    val grouped =
      if (keys.isEmpty) df.agg(aggCol.as("__qs"))
      else df.groupBy(keys.map(col): _*).agg(aggCol.as("__qs"))
    val out: Seq[Column] = keys.map(col) ++ fractions.zipWithIndex.map { case (f, i) =>
      element_at(col("__qs"), i + 1).as(label(f))
    }
    grouped.select(out: _*)
  }
}
