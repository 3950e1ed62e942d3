package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Event-time streaming over the events table shape (SURVEY.md §2.9: absent
  * in the reference — Structured Streaming is the Spark-native extension
  * surface). Transformations are defined once and used both in batch (oracle
  * parity: x12/x13 declared queries) and as streaming queries with
  * watermarks; at 100 TB/day the same code runs against a real source
  * (Kafka/files) with state cleanly bounded by the watermark.
  */
object EventStreams {

  /** events schema as written by the current testdata vintage (ts =
    * parquet timestamp[us] → TIMESTAMP_NTZ). Prefer [[eventsSchema]] for
    * streaming reads — it infers from the actual files so either vintage
    * (int64 epoch-nanos or timestamp[us]) works. */
  val EventsSchema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    )
  )

  /** Schema for a streaming read of an events parquet directory, inferred
    * from the files so both ts vintages stream correctly. A stream is
    * often started BEFORE its writer's first batch lands — when inference
    * finds no files (empty or not-yet-created directory, an
    * AnalysisException), fall back to the static [[EventsSchema]] instead
    * of failing stream start. Any OTHER failure (corrupt footer,
    * permission denied) propagates: silently substituting the static
    * schema there would surface later as a confusing mid-stream type
    * mismatch far from the root cause. */
  def eventsSchema(spark: SparkSession, path: String): StructType =
    try spark.read.parquet(path).schema
    catch { case _: org.apache.spark.sql.AnalysisException => EventsSchema }

  /** Normalize ts to epoch-nanos long (either vintage) and attach a proper
    * event-time column (no-op if the caller already attached one, e.g. with
    * a watermark). */
  def withEventTime(df: DataFrame): DataFrame =
    if (df.columns.contains("etime")) df
    else
      graft.queries.Tables
        .normalizeTs(df)
        .withColumn("etime", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 5-minute aggregate; in streaming mode add
    * `.withWatermark("etime", ...)` upstream. Batch-parity: x12_window_5m. */
  def tumbling5m(df: DataFrame): DataFrame =
    withEventTime(df)
      .groupBy(window(col("etime"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(
        unix_timestamp(col("w.start")).as("bucket_s"),
        col("event_type"),
        col("n"),
        col("sum_v")
      )

  /** Session windows with a 30-minute gap (batch-parity: x13_sessionize
    * computes the same islands with window functions). */
  def sessions30m(df: DataFrame): DataFrame =
    withEventTime(df)
      .groupBy(session_window(col("etime"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events")
      )

  /** Per-user running state for stateful anomaly flagging. */
  case class UserState(n: Long, mean: Double)
  case class EventRow(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  case class Flagged(event_id: Long, user_id: Long, value: Double, prior_mean: Double)

  /** Custom stateful streaming: flag events whose value exceeds `factor` x
    * the user's running mean (computed over at least `minN` PRIOR events).
    * State is one (count, mean) pair per user — bounded, mergeable, and
    * exactly what `flatMapGroupsWithState` is for (SURVEY.md §2.9 extension
    * surface). Within a batch, events are processed in (ts, event_id) order
    * so results are deterministic. */
  def flagAnomalies(
      ds: org.apache.spark.sql.Dataset[EventRow],
      factor: Double,
      minN: Long
  ): org.apache.spark.sql.Dataset[Flagged] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, events: Iterator[EventRow], state: org.apache.spark.sql.streaming.GroupState[UserState]) => {
          var (n, mean) = state.getOption.map(s => (s.n, s.mean)).getOrElse((0L, 0.0))
          val out = scala.collection.mutable.ListBuffer[Flagged]()
          events.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            if (n >= minN && e.value > factor * mean)
              out += Flagged(e.event_id, uid, e.value, mean)
            mean = (mean * n + e.value) / (n + 1)
            n += 1
          }
          state.update(UserState(n, mean))
          out.iterator
        }
      )
  }

  /** Streaming deduplication on a business key, state bounded by the
    * watermark: duplicates arriving within `delay` of each other are
    * dropped; state for keys older than the watermark is evicted — the
    * streaming face of `Dedup.exact`, and the only dedup shape that runs
    * forever on an unbounded source (an unbounded `dropDuplicates` grows
    * state without limit). In batch mode the same call degenerates to a
    * plain dropDuplicates over the keys. */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], delay: String): DataFrame = {
    val withTime = withEventTime(df).withWatermark("etime", delay)
    if (df.isStreaming) withTime.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else withTime.dropDuplicates(keys)
  }

  /** Run a streaming query over a bounded parquet directory with a memory
    * sink — the local harness for the streaming path (file source → watermark
    * → windowed agg → sink). */
  def runBounded(
      spark: SparkSession,
      parquetPath: String,
      transform: DataFrame => DataFrame,
      queryName: String,
      watermarkCol: String = "etime",
      watermark: String = "1 hour"
  ): StreamingQuery = {
    val src = spark.readStream.schema(eventsSchema(spark, parquetPath)).parquet(parquetPath)
    val withWm = transform(withEventTime(src).withWatermark(watermarkCol, watermark))
    val q = withWm.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q
  }
}
