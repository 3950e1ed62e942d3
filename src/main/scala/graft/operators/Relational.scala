package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Materialize.StageSyntax

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

  /** Per-key standardization: appends the key-group mean, sample stddev,
    * and z-score of `valueCol` — the outlier-screening / feature-scaling
    * primitive. A constant (or singleton) group has zero stddev; its z is
    * NULL (never ±Inf), so downstream |z| filters drop those rows instead
    * of keeping every member of a degenerate group.
    *
    * 100 TB shape: the stats side is ONE map-side-partial aggregate
    * bounded by |keys| rows, broadcast back onto the fact table — the data
    * itself never shuffles. (A window-function formulation would instead
    * hash-exchange every row and hold whole key groups per task.) */
  def zscore(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val stats = df
      .groupBy(keys.map(col): _*)
      .agg(
        avg(col(valueCol)).as("mean_v"),
        stddev_samp(col(valueCol)).as("std_v")
      )
    df.join(broadcast(stats), keys)
      .withColumn(
        "z",
        (col(valueCol) - col("mean_v")) /
          when(col("std_v") === 0.0, lit(null)).otherwise(col("std_v"))
      )
  }

  /** Per-key rank statistics: appends ANSI `percent_rank` (`pr`) and
    * `cume_dist` (`cd`) of `valueCol` within each key group — the
    * normalized-position features ("what fraction of this user's events
    * are smaller"). Ties share a value on both engines by definition, and
    * the `(rank-1)/(n-1)` division is a single IEEE op, so outputs are
    * bit-stable.
    *
    * 100 TB shape: one hash exchange on the keys, per-key sort inside the
    * partition — the same cost class as any ranked output; a pathological
    * hot key sorts in one task (salt upstream, or reach for the
    * [[Quantiles]] sketch when approximate positions suffice). */
  def rankStats(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol))
    df.withColumn("pr", percent_rank().over(w)).withColumn("cd", cume_dist().over(w))
  }

  /** Per-group mode: the most frequent `valueCol` per key group, ties
    * broken to the LARGEST value (deterministic at any parallelism), with
    * its count. Two-level aggregate — `(keys, value)` counts, then a
    * `max(struct(count, value))` per key: map-side partials both times,
    * never a window sort over the raw rows. */
  def modeOf(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(max(struct(col("__n"), col(valueCol))).as("__m"))
      .select(
        keys.map(col) :+
          col(s"__m.$valueCol").as(s"mode_$valueCol") :+
          col("__m.__n").as("n_mode"): _*
      )

  /** Winsorization: clamp `valueCol` into its per-key `[lo, hi]` quantile
    * band — outlier clipping for numeric features (the keep-the-row
    * alternative to dropping tail rows). Appends `<valueCol>_w`.
    *
    * Thresholds come from the [[Quantiles]] facade: `exact=false`
    * (default) uses the mergeable sketch — the 100 TB path; `exact=true`
    * sorts, for oracle parity at bench scale. Either way the threshold
    * side is |keys| rows broadcast back onto the fact table — the data
    * never shuffles, mirroring [[zscore]]. A value equal to a threshold is
    * unchanged by the clamp, so interpolation ulp wobble cannot move an
    * output by more than one ulp. */
  def winsorize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      exact: Boolean = false
  ): DataFrame = {
    require(lo < hi, s"winsorize: lo must be < hi, got [$lo, $hi]")
    val stats = Quantiles
      .quantiles(df, keys, valueCol, Seq(lo, hi), exact)
      .toDF((keys :+ "__qlo" :+ "__qhi"): _*)
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), keys)
    joined
      .withColumn(
        s"${valueCol}_w",
        least(greatest(col(valueCol), col("__qlo")), col("__qhi"))
      )
      .drop("__qlo", "__qhi")
  }

  /** Grouped top-k via the bounded-heap aggregate
    * [[graft.functions.TopKStructs]] — at most k rows per group per
    * partition cross the shuffle, vs `row_number() OVER (...)` which
    * shuffles and sorts EVERY row of every group. `packed` is a struct
    * whose FIRST field is the ranking value (descending), remaining fields
    * deterministic tie-breakers; all struct fields come back as columns
    * plus a 1-based `rankCol`. */
  def topKPerKey(
      df: DataFrame,
      keys: Seq[String],
      packed: Column,
      k: Int,
      rankCol: String = "rk"
  ): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKAggFunctions.topKStructs(packed, k).as("__topk"))
      .select(keys.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__s")): _*)
      .select(
        keys.map(col) :+ (col("__pos") + 1).as(rankCol) :+ col("__s.*"): _*
      )

  /** CUBE(k1, k2) with count + exact decimal sum via re-aggregation of the
    * base (k1, k2) aggregate — `.cube()` would Expand every input row 4x
    * through the aggregate; deriving the three coarser levels from the
    * (tiny) finest-grain partials scans the fact table once. Exact because
    * count and decimal sum are associative. Output: (k1, k2, n, <sumName>)
    * with NULL key columns on the rolled-up levels, double-cast sum. */
  def cubeCountDsum(
      df: DataFrame,
      k1: String,
      k2: String,
      valueCol: String,
      sumName: String,
      precision: Int = 18
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(precision, 2)
    val base = df
      .groupBy(k1, k2)
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast(dec)).as("sq"))
    def shape(d: DataFrame, c1: Column, c2: Column): DataFrame =
      d.select(c1.as(k1), c2.as(k2), col("n"), col("sq").cast("double").as(sumName))
    // null key slots cast to each key's ACTUAL type so the unions line up
    // for non-string grouping keys too
    val nul1 = lit(null).cast(df.schema(k1).dataType)
    val nul2 = lit(null).cast(df.schema(k2).dataType)
    // coalesce(sum(n), 0): on an EMPTY input the global agg still emits one
    // row, and CUBE's () grouping reports n=0 there, not NULL. (Remaining
    // documented divergence from .cube(): no grouping_id column, so a
    // data-NULL key value is indistinguishable from a subtotal NULL —
    // callers with nullable keys need .cube() itself.)
    val byK1 = base.groupBy(k1).agg(coalesce(sum(col("n")), lit(0L)).as("n"), sum(col("sq")).as("sq"))
    val byK2 = base.groupBy(k2).agg(coalesce(sum(col("n")), lit(0L)).as("n"), sum(col("sq")).as("sq"))
    val total = base.agg(coalesce(sum(col("n")), lit(0L)).as("n"), sum(col("sq")).as("sq"))
    shape(base, col(k1), col(k2))
      .unionByName(shape(byK1, col(k1), nul2))
      .unionByName(shape(byK2, nul1, col(k2)))
      .unionByName(shape(total, nul1, nul2))
  }

  /** Approximate per-key distinct cardinality — the 100 TB path for
    * `COUNT(DISTINCT value)`: Spark's HyperLogLog++ sketch
    * (`approx_count_distinct`) builds FIXED-SIZE per-key registers that
    * merge map-side, so nothing but the sketches crosses the exchange;
    * the exact aggregate instead shuffles every distinct value string.
    * Deterministic: HLL registers are hash-derived maxima, so the result
    * is independent of partitioning and row order (pinned in spec).
    * `rsd` is the target relative standard deviation (default 5%). */
  def approxDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rsd: Double = 0.05
  ): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("n_approx"))

  /** [[approxDistinct]] AUDITED against the exact count in one pass —
    * the verification query a pipeline runs on a sample before trusting
    * the sketch corpus-wide: per key, the exact distinct count plus a
    * boolean pinning `|approx − exact| <= 4·rsd·exact` (a ±4σ band on
    * the sketch's target rsd). The exact side makes this the EXPENSIVE
    * variant — it exists for auditing, not the hot path. */
  def approxDistinctAudit(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rsd: Double = 0.05
  ): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("n_approx"),
        countDistinct(col(valueCol)).as("n_exact")
      )
      .select(
        keys.map(col) :+ col("n_exact") :+
          (abs(col("n_approx") - col("n_exact")) <= lit(4.0 * rsd) * col("n_exact"))
            .as("within_bound"): _*
      )

  /** EXACT heavy hitters (every value with frequency > phi·N) without ever
    * shuffling the full domain — the 100 TB answer to "which join keys /
    * tokens / URLs are hot": a plain `GROUP BY value HAVING count > phi*N`
    * shuffles one row per DISTINCT value of a possibly-unbounded domain.
    *
    * Two candidate-bounded passes instead:
    *   1. ONE pass computes N and a Misra–Gries summary
    *      ([[graft.functions.MisraGriesSummary]], cap = ceil(1/phi)
    *      counters, fixed-size state merging map-side). The MG guarantee —
    *      under ANY partitioning — is that every value with frequency
    *      > N/(cap+1) ≥ phi·N survives, so the summary is a SUPERSET of
    *      the answer with at most cap entries.
    *   2. The ≤ cap candidates recount exactly behind a broadcast-hash
    *      `isin` set (no join, no extra shuffle of non-candidates —
    *      non-candidate rows die at the scan).
    *
    * The final output is therefore EXACT and partitioning-independent even
    * though the intermediate summary is not (its estimates are
    * partitioning-dependent lower bounds; only the superset guarantee is
    * used). The threshold compare is one IEEE double product — identical
    * in any engine. Composes with [[graft.operators.Scale.saltedJoin]]:
    * feed the returned values in as the hot-key set. Values are compared
    * and returned in STRING form (`valueCol` is cast); nulls are not part
    * of the stream. Returns `(valueCol string, cnt long)`, unordered.
    *
    * PRECONDITION: `df` must evaluate to the SAME rows in both passes —
    * the superset guarantee links pass 1's candidates to pass 2's
    * recount, so a non-deterministic input (`rand()`/`sample` without a
    * seed, a table mutated between jobs) silently voids exactness. For
    * such inputs pass `cache = true`: the projected value column is
    * `localCheckpoint(true)`-ed across the two passes (eager, and the
    * LINEAGE IS TRUNCATED — a checkpoint block lost to executor failure
    * fails the job loudly instead of silently recomputing a DIFFERENT
    * snapshot from the non-deterministic source, which a plain persist
    * would do) and the (≤ cap rows) result is materialized before the
    * snapshot is released — both passes provably see one snapshot or
    * the call errors. Default is off because materializing a 100 TB
    * scan costs more than the second pass over an immutable source. */
  def heavyHitters(
      df: DataFrame,
      valueCol: String,
      phi: Double,
      cache: Boolean = false
  ): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"heavyHitters: phi must be in (0,1), got $phi")
    val cap = math.ceil(1.0 / phi).toInt
    val vals0 = df.select(col(valueCol).cast("string").as(valueCol))
    // localCheckpoint, not persist: truncated lineage means a lost block
    // FAILS instead of recomputing non-deterministic input between passes
    val vals = if (cache) vals0.stageCheckpoint() else vals0
    val v = col(valueCol)
    val head = vals
      .agg(count(v).as("__n"), graft.functions.MgAggFunctions.mgSummary(v, cap).as("__cand"))
      .collect()(0) // bounded: one row, ≤ cap candidate structs
    val n = head.getLong(0)
    val cands = head
      .getAs[collection.Seq[org.apache.spark.sql.Row]](1)
      .map(_.getString(0))
      .toSeq
    val kept = vals
      .filter(if (cands.isEmpty) lit(false) else v.isin(cands: _*))
      .groupBy(valueCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi * n))
    if (!cache) kept
    else {
      // materialize the ≤ cap result rows BEFORE releasing the snapshot —
      // the returned frame must not lazily re-read freed checkpoint blocks
      val rows = kept.collect().toSeq
      // EAGER release of the snapshot's checkpoint blocks: a long-lived
      // driver making repeated cached calls over large frames must not
      // accumulate blocks between ContextCleaner GC cycles — unpersist the
      // checkpointed RDD backing `vals` now (the ContextCleaner stays as
      // the backstop for the no-longer-reachable RDD object itself)
      vals.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _                                             => ()
      }
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.parallelize(rows, 1),
        kept.schema
      )
    }
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * N ranked retrieval lists — the standard hybrid-retrieval combiner
    * (lexical BM25 + embedding ANN is the canonical pair; RRF needs no
    * score normalization across lists because it consumes only RANKS).
    * Per (query, doc): `score = Σ_lists 1 / (k0 + rank)`, then the top
    * `k` docs per query. A doc absent from a list contributes nothing
    * for it — no outer-join scaffolding, exactly the paper's sum.
    *
    * Inputs: frames each carrying (`qidCol`, `docCol`, `rankCol`) —
    * the (qid, doc, rank) shape every top-k operator here emits
    * ([[graft.operators.TextAnalysis.bm25TopK]],
    * [[graft.operators.Similarity.ivfTopK]]/bruteForceTopK). `docCol`
    * must be numeric (ids): the tie-break ranks equal fused scores by
    * SMALLER doc id via sign flip inside the heap struct.
    *
    * Determinism: each reciprocal is rounded to 9 dp and summed as
    * DECIMAL — exact and associative, so the fused ranking is identical
    * at any parallelism and replayable by an external engine (the
    * bm25TopK decimal contract); input ranks are ints, so no float
    * wobble enters at all.
    *
    * 100 TB shape: every input is k-bounded per query by construction,
    * so the union holds |queries| · Σ k_list rows; one (qid, doc)
    * aggregate plus the bounded [[topKPerKey]] map-side heap — query
    * text, postings and vectors never enter the fusion. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      qidCol: String,
      docCol: String,
      rankCol: String,
      k: Int,
      k0: Int = 60
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k >= 1, s"rrfFuse: k must be >= 1, got $k")
    require(k0 >= 1, s"rrfFuse: k0 must be >= 1, got $k0")
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val shaped = rankings.map(
      _.select(
        col(qidCol),
        col(docCol),
        round(lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double")), 9)
          .cast(dec)
          .as("__c")
      )
    )
    val scored = shaped
      .reduce(_ unionByName _)
      .groupBy(col(qidCol), col(docCol))
      .agg(sum(col("__c")).as("__s"))
    topKPerKey(
      scored,
      Seq(qidCol),
      struct(col("__s"), (-col(docCol)).as("__nd")),
      k,
      rankCol = "rn"
    ).select(
      col(qidCol),
      col("rn"),
      (-col("__nd")).as(docCol),
      round(col("__s").cast("double"), 9).as("rrf_score")
    )
  }
}
