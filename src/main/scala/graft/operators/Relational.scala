package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small relational conveniences mirroring reference API ergonomics. */
object Relational {

  /** Rename every column (except `keep`) with a suffix — the Spark analog of
    * the reference's join `suffix=` disambiguation (reference: README.md:143
    * `join(..., suffix="_min")`; Spark has no suffix argument, so rename
    * before joining). */
  def withSuffix(df: DataFrame, suffix: String, keep: Set[String] = Set.empty): DataFrame =
    df.select(df.columns.map { c =>
      if (keep(c)) col(c) else col(c).as(c + suffix)
    }.toIndexedSeq: _*)

  /** Equi-join on `keys` where right-side non-key columns get `suffix`. */
  def joinWithSuffix(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      suffix: String,
      how: String = "inner"
  ): DataFrame =
    left.join(withSuffix(right, suffix, keys.toSet), keys, how)

  /** Exact decimal sum of a 2-dp-valued double column, returned as double.
    * Sums of doubles are partition-order dependent; routing money-like
    * columns through DecimalType makes the aggregate exact and
    * deterministic at any parallelism — required for oracle hash-parity and
    * the right call for currency at 100 TB anyway. */
  def dsum(c: Column, precision: Int = 18): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(precision, 2))).cast("double")
}
