package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Testdata vintages store `events.ts` either as epoch-nanos int64 (read
    * as LongType under `nanosAsLong`) or as parquet timestamp[us] (read as
    * TIMESTAMP_NTZ). Every downstream program does integer arithmetic on ts
    * as epoch nanos, so normalize here: the session timezone is UTC, making
    * the NTZ→timestamp cast lossless, and `unix_micros * 1000` restores the
    * exact epoch-nanos longs. LongType passes through untouched so both
    * vintages work. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      case _ => df
    }
}

/** Shared DuckDB-SQL fragments for oracle strings. */
object Sql {
  /** Exact decimal-routed SUM of a 2-dp double column (see Relational.dsum). */
  def dsum(x: String, p: Int): String = s"CAST(SUM(CAST($x AS DECIMAL($p,2))) AS DOUBLE)"
}
