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

  /** [[t]] plus a scale-adaptive scan fan-out (optimization guide
    * §2.2/§2.5: derive partitioning from the input, never a constant
    * tuned for one scale) — the WIDE loader for queries whose per-row
    * compute dominates their scan.
    *
    * The bench inputs are single-row-group parquet files, so the scan
    * plans ONE non-empty task regardless of `maxPartitionBytes` (parquet
    * splits at row-group boundaries) and every per-row expression fused
    * into the scan stage — tokenize/explode/hash chains, vector math —
    * runs on one of the session's cores. One round-robin exchange right
    * after the scan moves that work onto all cores.
    *
    * The exchange is CONDITIONAL on the planned scan parallelism actually
    * being below the session's (a plan-time file-listing check, no job):
    * at real scale the inputs split into >= cores partitions on their
    * own, the condition is false, and the plan is untouched — so this is
    * not a local-mode constant; it is the degenerate-input repair. The
    * shuffle is round-robin (deterministic under Spark's
    * sort-before-repartition) and every declared query's output contract
    * is partition-invariant (spec-pinned across the corpus), so results
    * are identical either way.
    *
    * Opt-in per query, not the default: the exchange re-serializes the
    * table once per action, so queries whose downstream work is CHEAP
    * relative to one serialize+shuffle pass (plain aggregates, sketch
    * builds, multi-action driver walks that replay the loader) measure
    * SLOWER with it — the r18 bench A/B over all 229 queries picked the
    * winners (OPTIMIZATION_r18.md records both lists).
    *
    * Sketch caveat (ADVICE r18): partition-invariance is EXACT for the
    * opted-in exact aggregates/total-order sorts, but approx-sketch
    * consumers (q10's approx_percentile) are merge-order-dependent in
    * principle; those are tolerance-verified against the oracle at the
    * tested SFs rather than proven invariant — keep new sketch-based
    * queries on the plain loader unless verified the same way. */
  def tw(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

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
