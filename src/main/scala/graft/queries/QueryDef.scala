package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  * Column names/types must agree between the two (driver compares after
  * sorting columns by name). */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Shared DuckDB-SQL fragments for oracle strings. */
object Sql {
  /** Exact decimal-routed SUM of a 2-dp double column (see Relational.dsum). */
  def dsum(x: String, p: Int): String = s"CAST(SUM(CAST($x AS DECIMAL($p,2))) AS DOUBLE)"
}
