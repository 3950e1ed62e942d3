package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time batch operators shared by the declared queries and user code. */
object TimeOps {

  /** Ordered funnel analysis: for each step i, count users whose earliest
    * step-i event strictly follows their earliest qualifying step-(i-1)
    * event — the standard min-timestamp funnel. Each stage is one
    * filter + user-keyed aggregate + (from stage 2 on) a user-keyed join
    * to the previous stage's per-user frontier: shuffle keys are all
    * `userCol`, so the whole funnel co-partitions on one key and the
    * per-stage state is one row per surviving user. Returns
    * (step_idx, step, users) — one row per step. */
  def funnel(
      events: org.apache.spark.sql.DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]
  ): org.apache.spark.sql.DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // EAGER by design: each stage's frontier (one row per surviving user)
    // is persisted, counted once, and released when the next stage has
    // materialized — a lazy union of S count branches would recompute
    // frontier i for every branch j >= i (S(S+1)/2 scans of events). The
    // result is S summary rows, so eagerness costs nothing downstream.
    var frontier: org.apache.spark.sql.DataFrame = null
    var prevCache: Option[org.apache.spark.sql.DataFrame] = None
    val rows = steps.zipWithIndex.map { case (step, i) =>
      val ev = events.filter(col(typeCol) === step)
      frontier = (
        if (i == 0)
          ev.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        else
          ev.join(frontier, userCol)
            .filter(col(tsCol) > col("__t"))
            .groupBy(col(userCol))
            .agg(min(col(tsCol)).as("__t"))
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val users = frontier.count()
      prevCache.foreach(_.unpersist())
      prevCache = Some(frontier)
      (i + 1, step, users)
    }
    prevCache.foreach(_.unpersist())
    val spark = events.sparkSession
    import spark.implicits._
    rows.toDF("step_idx", "step", "users")
  }

  /** Weekly retention cohorts: users are cohorted by the week of their
    * first `anchorType` event; `users` at (cohort_week, week_n) counts
    * distinct users from that cohort active in week cohort+n (any event).
    * Two user-keyed aggregations + one join — the cohort frontier is one
    * row per user, and the final count groups the deduplicated
    * (user, week) activity grid, so nothing scales with raw event count
    * past the first aggregate. `tsCol` is a timestamp-valued column
    * expression (pass a conversion for epoch-long sources). */
  def retentionCohorts(
      events: org.apache.spark.sql.DataFrame,
      userCol: String,
      tsCol: org.apache.spark.sql.Column,
      typeCol: String,
      anchorType: String
  ): org.apache.spark.sql.DataFrame = {
    val ev = events.select(
      col(userCol).as("__u"),
      to_date(date_trunc("week", tsCol)).as("__w"),
      col(typeCol).as("__t")
    )
    val cohort = ev
      .filter(col("__t") === anchorType)
      .groupBy("__u")
      .agg(min(col("__w")).as("__cw"))
    ev
      .select("__u", "__w")
      .distinct()
      .join(cohort, "__u")
      .filter(col("__w") >= col("__cw"))
      .select(
        col("__cw").as("cohort_week"),
        (datediff(col("__w"), col("__cw")) / 7).cast("int").as("week_n"),
        col("__u")
      )
      .groupBy("cohort_week", "week_n")
      .agg(count(lit(1)).as("users"))
  }

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

  /** Sliding (hopping) event-time windows over a numeric time column:
    * each row explodes into every window `[k·step, k·step + width)` that
    * contains its timestamp, appended as `window_start` — the batch analog
    * of Structured Streaming's `window(ts, width, step)`, for overlapping
    * aggregates ("5-minute stats every minute"). `width < step` leaves
    * gaps; rows falling in a gap emit no window rows, never a wrong one.
    *
    * 100 TB shape: a pure per-row generate of `ceil(width/step)` window
    * rows followed by whatever aggregate the caller groups with — the
    * fan-out factor is the window overlap, not data size, and map-side
    * partial aggregation collapses it before any shuffle. */
  def slide(df: DataFrame, tsCol: String, width: Long, step: Long): DataFrame = {
    require(width > 0 && step > 0, s"slide: width/step must be positive, got $width/$step")
    require(
      !df.columns.contains("window_start"),
      "slide: input already has a 'window_start' column — withColumn would silently overwrite it"
    )
    // FLOOR division, not `div`: SQL div truncates toward zero, which
    // drops the earliest window for timestamps within `width` of zero (or
    // any negative time column)
    def fdiv(x: String): String =
      s"((($x) div $step) + (CASE WHEN ($x) % $step != 0 AND ($x) < 0 THEN -1 ELSE 0 END))"
    val loS = fdiv(s"$tsCol - $width") + " + 1"
    val hiS = fdiv(tsCol)
    df.withColumn(
      "window_start",
      explode(
        when(
          expr(loS) <= expr(hiS),
          expr(s"transform(sequence($loS, $hiS), k -> k * $step)")
        ).otherwise(array().cast("array<bigint>"))
      )
    )
  }

  /** Time-RANGE rolling aggregates per key — the trailing-window feature
    * family (count / exact sum / min / max of `valueCol` over the last
    * `width` time units, endpoints inclusive: `[ts - width, ts]`). The
    * frame is a true RANGE frame over the numeric time column, so
    * irregularly-spaced events get correct time-based (not row-based)
    * windows, and rows sharing a timestamp are peers (each sees the other,
    * matching ANSI RANGE semantics on both engines).
    *
    * The sum routes through DECIMAL (see [[Relational.dsum]]): sliding
    * double sums are evaluation-order dependent (Spark re-scans the frame,
    * DuckDB uses segment trees), decimal addition is associative — exact
    * and deterministic at any parallelism, which a 2-dp money-like column
    * wants anyway.
    *
    * 100 TB shape: one hash exchange on `keyCol`, then each key sorts
    * independently inside its partition — no global sort, no driver state;
    * skewed keys shard like any window (salt the key upstream if one user
    * dominates). Appended columns: `n_win`, `sum_win`, `min_win`,
    * `max_win`. */
  def rollingByTime(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      width: Long,
      sumPrecision: Int = 14
  ): DataFrame = {
    require(width > 0, s"rollingByTime: width must be positive, got $width")
    val clash = df.columns.toSet.intersect(Set("n_win", "sum_win", "min_win", "max_win"))
    require(
      clash.isEmpty,
      s"rollingByTime: input already has ${clash.mkString(", ")} — withColumn would silently overwrite"
    )
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol)).rangeBetween(-width, 0)
    val dec = org.apache.spark.sql.types.DecimalType(sumPrecision, 2)
    df.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum(col(valueCol).cast(dec)).over(w).cast("double"))
      .withColumn("min_win", min(col(valueCol)).over(w))
      .withColumn("max_win", max(col(valueCol)).over(w))
  }
}
