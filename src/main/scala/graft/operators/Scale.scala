package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Materialize.StageSyntax

/** Scale toolkit: the shuffle-avoidance and skew primitives a 100 TB
  * deployment leans on (SURVEY.md §7.0 — "100 TB scaling is partition count
  * + AQE"). Local tests prove the plan shapes; the same calls run unchanged
  * on a cluster. */
object Scale {

  /** Write a bucketed+sorted table: joins/aggregations on `keys` between
    * tables bucketed the same way need no shuffle (co-located join — the
    * Spark analog of the reference's chunk-alignment guidance,
    * docs/user_guide/performance_tips.md:67-78). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int
  ): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Curriculum ordering with source ROUND-ROBIN interleave: rank docs
    * within each source by difficulty (easiest first — the classic
    * short-to-long curriculum when `difficultyCol` is a token count),
    * then assign the GLOBAL training position by taking rank-1 docs
    * from every source in source order, then rank-2, and so on —
    * sorted-by-quality data without long same-source runs (the
    * data-ordering half of curriculum learning, Bengio et al. 2009,
    * with the source-stratified interleave multi-corpus trainers use).
    *
    * The global position is NOT a global window: with per-source totals
    * `cnt_s` (a tiny broadcast frame), the position of the doc at
    * per-source rank `rn` of source `src` under (rn, source) ordering is
    * CLOSED-FORM — `Σ_s min(rn−1, cnt_s)` docs from earlier rounds plus
    * this round's sources at-or-before `src` that still have a doc
    * (`cnt_s ≥ rn`). Per-row arithmetic over a broadcast array: no
    * single-partition window, no global sort.
    *
    * The per-source rank itself is two-level for the same reason: a
    * window partitioned by (source, difficulty) — fine-grained, no
    * whole-source partition — plus a broadcast cumulative offset per
    * (source, difficulty) group. The offset frame has one row per
    * (source, distinct difficulty), bounded for any discrete difficulty
    * (token counts top out at the corpus max doc length).
    *
    * CARDINALITY CONTRACT (ADVICE r17): `sourceCol` must be a
    * LOW-cardinality corpus label (sources, languages — single-to-double
    * digits). The per-source count array is ONE broadcast row evaluated
    * with aggregate/filter HOFs per doc — O(|sources|) work per row and a
    * single in-memory array. A high-cardinality column (a domain or URL
    * host) would blow both; the `maxSources` guard (plan-level, no extra
    * action) refuses past the bound rather than degrading silently.
    *
    * Output: `(idCol, sourceCol, difficultyCol, rn, pos)`, `pos` 1-based.
    * Ties within (source, difficulty) break by ascending id. */
  def curriculumInterleave(
      docs: DataFrame,
      idCol: String,
      difficultyCol: String,
      sourceCol: String,
      maxSources: Int = 1000
  ): DataFrame = {
    require(maxSources >= 1, s"curriculumInterleave: maxSources must be >= 1, got $maxSources")
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col(idCol), col(sourceCol), col(difficultyCol))
    // per-(source, difficulty) counts -> per-source running offsets; the
    // window runs on the aggregated frame (sources x distinct difficulties)
    val grp = d
      .groupBy(col(sourceCol), col(difficultyCol))
      .agg(count(lit(1)).as("__gc"))
    val offW = Window
      .partitionBy(sourceCol)
      .orderBy(difficultyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = grp.withColumn("__off", coalesce(sum("__gc").over(offW), lit(0L)))
    val rnW = Window.partitionBy(sourceCol, difficultyCol).orderBy(idCol)
    val ranked = d
      .join(broadcast(off.select(col(sourceCol), col(difficultyCol), col("__off"))),
        Seq(sourceCol, difficultyCol))
      .withColumn("rn", col("__off") + row_number().over(rnW))
    // per-source totals as ONE broadcast array column; pos is pure per-row
    // arithmetic over it (aggregate + filter higher-order functions)
    val cnts = grp
      .groupBy(col(sourceCol))
      .agg(sum("__gc").as("__cnt"))
      .agg(collect_list(struct(col(sourceCol).as("src"), col("__cnt").as("cnt"))).as("__cs"))
    val prior = aggregate(
      col("__cs"),
      lit(0L),
      (acc, x) => acc + least(col("rn") - 1L, x.getField("cnt"))
    )
    val thisRound = size(
      filter(
        col("__cs"),
        x => x.getField("cnt") >= col("rn") && x.getField("src") <= col(sourceCol)
      )
    ).cast("long")
    ranked
      .crossJoin(broadcast(cnts))
      .withColumn(
        "pos",
        // plan-level cardinality guard: fires on the first evaluated row if
        // the broadcast source array exceeds the contract, before any
        // O(rows x sources) work completes
        when(
          size(col("__cs")) > maxSources,
          raise_error(concat(
            lit(s"curriculumInterleave: more than $maxSources distinct sources ("),
            size(col("__cs")).cast("string"),
            lit(s") — the per-row closed-form walks the broadcast source array; " +
              "pass a low-cardinality source label or raise maxSources deliberately")))
        ).otherwise(prior + thisRound)
      )
      .select(col(idCol), col(sourceCol), col(difficultyCol), col("rn"), col("pos"))
  }

  /** Salted equi-join for skewed keys: the left side gets a deterministic
    * per-row salt, the right side is replicated once per salt value, and the
    * join key becomes (keys, salt) — a hot key's rows spread over
    * `saltBuckets` reducers instead of one. Use when AQE skew handling isn't
    * enough (e.g. one key is >> a single executor's memory).
    *
    * Only inner and left-outer joins are supported: every right row is
    * replicated `saltBuckets` times, so a right/full outer join would emit
    * each unmatched right row once per replica. (Left-outer is safe — an
    * unmatched left row carries exactly one salt value, so it is emitted
    * exactly once.) For those semantics, replication must be followed by a
    * dedup of unmatched right rows; use a plain join + AQE skew handling
    * instead. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      how: String = "inner"
  ): DataFrame = {
    val normalized = how.toLowerCase.replace("_", "")
    // semi/anti are salting-safe too: a left row carries exactly one salt,
    // and every right key is replicated to every salt, so the per-(key,salt)
    // existence decision equals the per-key one. Only right/full outer are
    // broken (each unmatched right row would surface once per replica).
    require(
      Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")
        .contains(normalized),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, got '$how': the right " +
        s"side is replicated per salt value, so right/full outer joins would duplicate " +
        s"unmatched right rows"
    )
    val saltL = pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets))
    val l = left.withColumn("__salt", saltL)
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }

  /** Deterministic stratified sampling by key hash — the reproducible
    * alternative to `df.sampleBy` (whose RNG draw depends on partitioning):
    * a row survives iff `hash(its id columns) mod 1000 < rate*1000` for its
    * stratum's rate. Pure per-row predicate — no shuffle, no RNG state,
    * identical output at any partition count and on re-runs, which is what a
    * training-data pipeline needs for auditable subsampling. The hash is the
    * md5-based 60-bit integer (portable across engines; see
    * [[Dedup.tokenHash60]]). Strata missing from `rates` are dropped. */
  def stratifiedHashSample(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      rates: Map[String, Double]
  ): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= 1), s"bad rates: $rates")
    // NULL id segments coalesce to a SOH (0x01) sentinel BEFORE concat_ws
    // (which would silently skip them, colliding "a|NULL|b" with "a|b" and
    // degenerating the bucket hash for null-keyed rows). A real id string
    // equal to the sentinel still collides — keep control chars out of ids.
    val nullSentinel = "\u0001"
    val keyed = idCols.map(c => coalesce(col(c).cast("string"), lit(nullSentinel)))
    val h = pmod(
      graft.operators.Dedup.tokenHash60(concat_ws("|", keyed: _*)),
      lit(1000L)
    )
    val rate = rates.foldLeft(lit(null).cast("double")) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(h < rate * lit(1000.0))
  }

  /** Per-key frequency cap — the curation step bounding any one source's
    * contribution to a training corpus: keep at most `k` rows per `keyCol`,
    * chosen as the k LARGEST by `(priority, idCol)` (the unique id breaks
    * ties, so selection is deterministic at any parallelism). Returns the
    * surviving FULL rows.
    *
    * 100 TB shape: a bounded-heap aggregate (TopKStructs — map-side
    * k-element heaps with partial aggregation) picks winners, then a
    * left-semi join on (key, id) keeps their rows. A window
    * `row_number() OVER (PARTITION BY key ...)` would instead sort every
    * row of the hottest source in one task — the skew cliff this avoids;
    * the winner set is k x nKeys rows, tiny next to the input, so the
    * semi-join's build side broadcasts under AQE. */
  def capPerKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      priority: org.apache.spark.sql.Column,
      k: Int
  ): DataFrame = {
    require(k > 0, s"capPerKey: k must be positive, got $k")
    val winners = Relational
      .topKPerKey(df, Seq(keyCol), struct(priority.as("__prio"), col(idCol).as("__id")), k)
      .select(col(keyCol), col("__id").as(idCol))
    df.join(winners, Seq(keyCol, idCol), "left_semi")
  }

  /** Downsample to a target domain mixture — the DoReMi/Pile-style curation
    * step: given target corpus shares per group (e.g. language or source
    * weights summing to 1), keep the LARGEST output that respects every
    * share without upsampling, via deterministic per-group hash rates.
    *
    * With N_g rows in group g and target share s_g, the max feasible total
    * is S = min_g(N_g / s_g) (the binding group keeps 100% of its rows);
    * every group is then filtered to rate_g = s_g * S / N_g with the same
    * portable md5 hash-bucket predicate as [[stratifiedHashSample]] — no
    * RNG, identical output at any partition count. Groups absent from
    * `shares` are dropped (they're not part of the target mixture).
    *
    * 100 TB shape: one tiny groupBy(count) over the corpus (map-side
    * partial agg, group-column-pruned scan), a rate table BOUNDED BY
    * |shares| rows (the inner join with the target map) collected to the
    * driver -- the same bounded-by-construction collect as kmeansFit's k
    * centroids -- then re-broadcast as a rate-table hash join + per-row
    * hash filter: no shuffle of the data itself, and the group column is
    * evaluated ONCE per row (a per-group when-chain predicate would
    * re-evaluate it per branch -- ruinous when the group is a derived
    * expression like a regex domain). The realized mixture converges to
    * `shares` at corpus scale (hash buckets are uniform); small groups
    * quantize at the 1/1000 bucket granularity like any hash sampler.
    * A target group with ZERO corpus rows can't constrain the mixture (its
    * share is unattainable); the max-total is taken over the groups
    * actually present. */
  def resampleToMix(
      df: DataFrame,
      idCols: Seq[String],
      groupCol: String,
      shares: Map[String, Double]
  ): DataFrame = {
    require(
      shares.nonEmpty && shares.values.forall(s => s > 0 && s <= 1),
      s"resampleToMix: shares must be in (0, 1]: $shares"
    )
    val spark = df.sparkSession
    import spark.implicits._
    val sh = shares.toSeq.toDF(groupCol, "__share")
    // the double cast makes the rate arithmetic bit-identical to the
    // oracle's (DOUBLE division throughout, association (share*smax)/ng)
    val present = df
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("__ng"))
      .join(broadcast(sh), Seq(groupCol))
      .collect() // <= |shares| rows by the inner join: bounded by construction
      .map(r => (r.get(0), r.getDouble(1), r.getDouble(2)))
    if (present.isEmpty) return df.filter(lit(false))
    val smax = present.map { case (_, ng, share) => ng / share }.min
    // rates attach via a BROADCAST join on the group column, NOT a
    // per-group when-chain predicate: a chain evaluates the group column
    // once PER BRANCH per row, which is catastrophic when the column is a
    // derived expression (a regex urlDomain over 60M rows at 65 groups ran
    // >30 min before this change; the join form hashes the group key once
    // per row). Absent groups drop on the inner join exactly as the
    // null-default chain dropped them; the rate doubles are the same
    // driver-computed (share·smax)/ng values, so the kept set is
    // bit-identical (oracle-gated at x61/x95/x132).
    require(
      !df.columns.contains("__rate"),
      "resampleToMix: input already carries a __rate column — rename it first"
    )
    val rateDf = broadcast(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          present.toSeq.map { case (g, ng, share) =>
            org.apache.spark.sql.Row(g, share * smax / ng)
          },
          1
        ),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(groupCol, df.schema(groupCol).dataType),
          org.apache.spark.sql.types.StructField(
            "__rate", org.apache.spark.sql.types.DoubleType, nullable = false)
        ))
      )
    )
    // same null-segment sentinel contract as stratifiedHashSample
    val nullSentinel = "\u0001"
    val keyed = idCols.map(c => coalesce(col(c).cast("string"), lit(nullSentinel)))
    val h = pmod(
      graft.operators.Dedup.tokenHash60(concat_ws("|", keyed: _*)),
      lit(1000L)
    )
    df.join(rateDf, Seq(groupCol))
      .filter(h < col("__rate") * lit(1000.0))
      .select(df.columns.map(col): _*)
  }

  /** Temperature-weighted domain mixture — the α-exponent sampling rule of
    * multilingual/multi-domain pretraining (target share of group g ∝
    * n_g^α): α=1 keeps natural proportions (every row survives — pinned in
    * spec), α→0 approaches uniform, α=0.5 is the common √-rule that keeps
    * head domains from drowning the tail. Shares route through
    * [[resampleToMix]] unchanged, so sampling stays a deterministic
    * per-row hash test.
    *
    * Determinism across engines and runs: the normalizing sum folds in
    * ASCENDING group-key order (float addition is order-dependent; an
    * unordered sum would wobble the rate boundaries in the last ulp), and
    * α=0.5 is special-cased to math.sqrt — sqrt IS correctly-rounded IEEE
    * on every engine, whereas Math.pow is only 1-ulp-accurate and not
    * specified to equal sqrt, so pow(x, 0.5) could differ from a peer
    * engine's libm in the last ulp and flip a row sitting exactly on a
    * rate cutoff. General α stays best-effort pow (documented).
    *
    * 100 TB shape: one |groups|-bounded count aggregate collects to the
    * driver (like resampleToMix's own share join), then one per-row
    * hash filter — no extra pass beyond resampleToMix's. */
  def temperatureMix(
      df: DataFrame,
      idCols: Seq[String],
      groupCol: String,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureMix: alpha must be in (0, 1], got $alpha")
    val rows = df
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("__n"))
      .collect()
    if (rows.isEmpty) return df.filter(lit(false))
    val weighted = rows.map { r =>
      require(!r.isNullAt(0), s"temperatureMix: null $groupCol group unsupported")
      // alpha == 0.5 MUST be sqrt, not pow: sqrt is correctly-rounded
      // IEEE everywhere; pow is only 1-ulp and engine-dependent
      val w =
        if (alpha == 0.5) math.sqrt(r.getDouble(1)) else math.pow(r.getDouble(1), alpha)
      r.get(0).toString -> w
    }
    val tot = weighted.sortBy(_._1).foldLeft(0.0)(_ + _._2) // ordered: deterministic float sum
    resampleToMix(df, idCols, groupCol, weighted.map { case (g, w) => g -> w / tot }.toMap)
  }

  /** Deterministic named splits (train/val/test) by key hash — the
    * reproducible split assignment a training pipeline records next to the
    * data: a row's split is a pure function of its id columns, so it never
    * changes with partitioning, re-runs, or corpus growth (new rows land in
    * splits at the target fractions; existing rows never migrate — the
    * property RNG-based `randomSplit` lacks).
    *
    * `splits` are (name, fraction) in priority order, fractions summing to
    * 1; assignment thresholds are the cumulative fractions quantized to the
    * 1000-bucket hash space with integer rounding (so an inexact double
    * cumsum can never disagree with an oracle's literal thresholds).
    * Pure per-row expression: no shuffle, no state. */
  def hashSplit(
      df: DataFrame,
      idCols: Seq[String],
      splits: Seq[(String, Double)],
      splitCol: String = "split"
  ): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad split fractions: $splits")
    require(
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits"
    )
    val nullSentinel = "\u0001"
    val keyed = idCols.map(c => coalesce(col(c).cast("string"), lit(nullSentinel)))
    val h = pmod(
      graft.operators.Dedup.tokenHash60(concat_ws("|", keyed: _*)),
      lit(1000L)
    )
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(c => math.round(c * 1000))
    // last split is the default branch — its threshold is 1000 by the sum
    // requirement, so every bucket lands somewhere
    val assign = splits.init.zip(thresholds.init).reverse.foldLeft(
      lit(splits.last._1)
    ) { case (acc, ((name, _), cut)) => when(h < lit(cut), lit(name)).otherwise(acc) }
    df.withColumn(splitCol, assign)
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (keys, salt), then final aggregate on keys. Caller supplies both
    * phases (they differ: e.g. partial count -> final sum). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      fin: org.apache.spark.sql.RelationalGroupedDataset => DataFrame
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val p = partial(salted.groupBy((keys :+ "__salt").map(col): _*))
    fin(p.groupBy(keys.map(col): _*))
  }

  // --------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al.,
  // NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
  // distribution looks like a TARGET corpus, by importance weight
  // log w(x) = log p_target(x) − log p_raw(x) under smoothed
  // bag-of-hashed-grams models, then Gumbel top-k resampling.

  /** Hashed unigram + bigram stream of a document — the DSIR feature set
    * (the paper uses word n-grams, n ≤ 2, hashed into `buckets`). */
  private def dsirGrams(text: Column): Column = {
    val tk = split(text, " ")
    val bi = when(
      size(tk) >= 2,
      transform(
        sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))
      )
    ).otherwise(array().cast("array<string>"))
    concat(tk, bi)
  }

  private def dsirBucket(g: Column, buckets: Int): Column =
    shiftright(graft.operators.Dedup.tokenHash60(g), 1) % buckets

  /** One B-bounded count aggregate: gram occurrences per hash bucket. */
  private def dsirCounts(df: DataFrame, textCol: String, buckets: Int): (Array[Long], Long) = {
    val rows = df
      .select(explode(dsirGrams(col(textCol))).as("g"))
      .select(dsirBucket(col("g"), buckets).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"))
      .collect() // <= `buckets` rows — model-bounded, never corpus-bounded
    val arr = new Array[Long](buckets)
    var tot = 0L
    rows.foreach { r => arr(r.getLong(0).toInt) = r.getLong(1); tot += r.getLong(1) }
    (arr, tot)
  }

  /** Per-document DSIR log importance weight, appended as `dsir_logw`:
    * `Σ_grams λ[bucket(gram)]` with
    * `λ[b] = ln(t_b + 1) − ln(r_b + 1) + (ln(R + B) − ln(T + B))`
    * (Laplace-smoothed target/raw log-prob ratio), λ snapped to the
    * 2⁻²⁰ dyadic grid so per-doc sums are ORDER-INDEPENDENT and exact —
    * the x88 exact-grid trick, which is what lets an external engine
    * replay scores bit-for-bit with a plain group SUM.
    *
    * 100 TB shape: two B-bounded count aggregates fit the models (the
    * only passes over target and raw); λ rides the plan as a literal
    * array (B doubles — the x88 literal-weights path, sized for
    * B ≤ ~64k) and scoring is a pure per-row fold — NO shuffle, no
    * broadcast, no feature materialization. */
  /** Fit the DSIR model: the per-bucket log-prob-ratio λ, grid-snapped.
    * Two B-bounded count aggregates — the only passes over target and
    * raw; the returned λ is the whole model (serve it via
    * [[dsirScore]], including on a STREAM — scoring is stateless). */
  def dsirFit(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 4096
  ): Seq[Double] = {
    require(
      buckets >= 1 && buckets <= (1 << 16),
      s"dsirFit: buckets must be in [1, 65536] (λ ships as a plan literal), got $buckets"
    )
    val (rc, rTot) = dsirCounts(raw, textCol, buckets)
    val (tc, tTot) = dsirCounts(target, textCol, buckets)
    require(tTot > 0, "dsirFit: target corpus has no grams")
    val c0 = math.log(rTot.toDouble + buckets) - math.log(tTot.toDouble + buckets)
    (0 until buckets).map { b =>
      val l = math.log(tc(b) + 1.0) - math.log(rc(b) + 1.0) + c0
      math.floor(l * 1048576.0) / 1048576.0 // 2^-20 grid: exact, order-free sums
    }
  }

  /** Score a text column under a fitted λ: the per-row fold
    * `Σ_grams λ[bucket(gram)]` — pure column expression (batch or
    * streaming), λ as a plan literal. */
  def dsirScore(text: Column, lam: Seq[Double]): Column = {
    val lamLit = typedlit(lam)
    aggregate(
      dsirGrams(text),
      lit(0.0),
      (acc, g) => acc + element_at(lamLit, (dsirBucket(g, lam.length) + 1).cast("int"))
    )
  }

  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 4096
  ): DataFrame =
    raw.withColumn("dsir_logw", dsirScore(col(textCol), dsirFit(raw, target, textCol, buckets)))

  /** DSIR selection: the top-`k` raw documents by
    * `dsir_logw + Gumbel(id)` — the paper's Gumbel-top-k trick, which
    * samples k docs WITHOUT replacement with probability ∝ w(x) in one
    * deterministic pass (the noise is a hash of the id:
    * `u = (h60(id) >> 8 + 0.5) / 2^52`, `g = −ln(−ln(u))` — the top 52
    * hash bits scaled by an exact power of two, so u is EXACTLY
    * representable (a double's 53-bit mantissa holds 52-bit + 0.5
    * values losslessly; a raw 60-bit hash would round, and values
    * within ~128 of 2^60 would round u to exactly 1.0 → g = +Inf, an
    * unconditional winner) and strictly inside (0, 1); every engine
    * computes the identical double; no RNG state, invariant to
    * partitioning).
    *
    * 100 TB shape: scoring is [[dsirLogWeights]]'s per-row fold; the
    * selection plans as TakeOrderedAndProject (per-partition k-heaps +
    * driver merge of k·partitions rows) — never a global sort. */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 4096
  ): DataFrame = {
    require(k >= 1, s"dsirSelect: k must be >= 1, got $k")
    val h = graft.operators.Dedup.tokenHash60(col(idCol).cast("string"))
    val u = (shiftright(h, 8).cast("double") + lit(0.5)) / lit(math.pow(2.0, 52))
    val key = col("dsir_logw") + -log(-log(u))
    // dsir_key stays in the output: selections re-sort on it downstream
    // (the post-limit row order is not a contract)
    dsirLogWeights(raw, target, textCol, buckets)
      .withColumn("dsir_key", key)
      .orderBy(desc("dsir_key"), col(idCol))
      .limit(k)
  }

  /** Weighted sample of `k` rows WITHOUT replacement, inclusion
    * probability ∝ `weightCol` — Efraimidis–Spirakis 2006 expressed as
    * Gumbel-top-k (the two are the same algorithm: A-ES ranks by
    * u^(1/w), whose log is Gumbel(ln w) up to monotone transform):
    * top-k by `ln(w) + g(id)` with `g = −ln(−ln(u))`,
    * `u = (h60(id) >> 8 + 0.5) / 2^52`. The noise is a HASH of the
    * id — the top 52 hash bits scaled by an exact power of two, so u is
    * EXACTLY representable (52-bit + 0.5 fits a double's 53-bit
    * mantissa; a raw 60-bit hash would round, and hashes within ~128 of
    * 2^60 would round u to 1.0 → g = +Inf, an unconditional winner
    * regardless of weight) and strictly in (0, 1); every engine
    * computes the identical double; no RNG state, invariant to
    * partitioning and re-runs (the [[dsirSelect]] contract, generalized
    * to any weight: quality scores, token counts, inverse-domain
    * rates).
    *
    * Rows with null or non-positive weight have probability ZERO and
    * are excluded (the A-ES key is undefined there — this is the
    * mathematically correct reading, not a silent drop).
    *
    * 100 TB shape: the key is a pure per-row expression and the
    * selection plans as TakeOrderedAndProject (per-partition k-heaps +
    * a driver merge of k·partitions rows) — never a global sort. The
    * `sample_key` column stays in the output: downstream re-sorts on it
    * (post-limit row order is not a contract). */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val h = graft.operators.Dedup.tokenHash60(col(idCol).cast("string"))
    val u = (shiftright(h, 8).cast("double") + lit(0.5)) / lit(math.pow(2.0, 52))
    val key = log(col(weightCol).cast("double")) + -log(-log(u))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_key", key)
      .orderBy(desc("sample_key"), col(idCol))
      .limit(k)
  }

  /** The highest-quality documents under a global TOKEN BUDGET — the
    * final-selection operator behind quality-pruned training sets
    * ("take the best B tokens", the FineWeb-Edu-style threshold cut).
    * Semantically: walk docs in (`scoreCol` DESC, `idCol` ASC) order and
    * keep every doc whose inclusive running `tokenCol` sum stays within
    * `budget` (tokens are positive, so the running sum is monotone and
    * the kept set is a prefix — docs are never split). Rows with NULL
    * score or NULL/non-positive token counts are excluded.
    *
    * 100 TB shape — NO global sort: one `groupBy(score)` aggregate
    * builds the per-score token histogram (map-side partials; bounded by
    * |distinct scores|, which for grid-valued classifier outputs — the
    * [[graft.operators.TextAnalysis.scoreLinear]] 1/256 contract — is
    * thousands, and is guarded by `maxDistinctScores` with a loud
    * "snap scores to a grid first" error otherwise). The driver scans
    * that histogram for the threshold score; everything STRICTLY above
    * it is kept by a plain filter. The boundary-score LAYER (the one
    * sequential piece) pays a running-sum walk that is itself TWO-LEVEL
    * for numeric ids: the layer is split into `boundaryBuckets` id-range
    * buckets by approx-quantile boundaries (one bounded aggregate, the
    * boundaries ride the plan as literals), a second bounded driver walk
    * over the per-bucket token sums finds the single boundary BUCKET,
    * and only THAT bucket's rows pay an ordered window — no task ever
    * sorts a whole score layer, even when a coarse score grid makes one
    * layer a large corpus fraction. Non-numeric ids keep the
    * single-window layer path (documented trade; snap such ids to a
    * numeric surrogate first at scale).
    *
    * `df` is traversed by several jobs (histogram, filters, layer
    * walk) — when `scoreCol`/`tokenCol` are EXPENSIVE computed
    * expressions (a [[graft.operators.TextAnalysis.scoreLinear]] fold, a
    * tokenizer), each traversal re-evaluates them. Pass
    * `materializeInput = true` to `localCheckpoint` the filtered input
    * once so every pass reads stored rows instead of recomputing the
    * fold (the 100 TB default when the score is not already a stored
    * column; costs one materialization of the surviving rows). */
  def selectByBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokenCol: String,
      budget: Long,
      maxDistinctScores: Int = 100000,
      boundaryBuckets: Int = 1024,
      materializeInput: Boolean = false
  ): DataFrame = {
    require(budget >= 0, s"selectByBudget: budget must be >= 0, got $budget")
    require(maxDistinctScores >= 1, "selectByBudget: maxDistinctScores must be >= 1")
    require(boundaryBuckets >= 1, "selectByBudget: boundaryBuckets must be >= 1")
    val base0 = df.filter(
      col(scoreCol).isNotNull && col(tokenCol).isNotNull && col(tokenCol) > 0
    )
    val base = if (materializeInput) base0.stageCheckpoint() else base0
    val hist = base
      .groupBy(col(scoreCol).as("__sc"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .orderBy(desc("__sc"))
      .limit(maxDistinctScores + 1)
      .collect() // bounded: maxDistinctScores + 1 rows, guarded below
    require(
      hist.length <= maxDistinctScores,
      s"selectByBudget: more than $maxDistinctScores distinct scores — the driver-side " +
        "histogram walk is sized for grid-valued scores (scoreLinear's 1/256 contract); " +
        "snap the score to a grid (e.g. round(score, 6)) or raise maxDistinctScores"
    )
    if (hist.isEmpty) return base
    var cum = 0L
    var i = 0
    while (i < hist.length && cum + hist(i).getLong(1) <= budget) {
      cum += hist(i).getLong(1); i += 1
    }
    if (i >= hist.length) return base // everything fits
    val sStar = hist(i).get(0)
    val remaining = budget - cum
    val above = base.filter(col(scoreCol) > lit(sStar))
    val layerRows = base.filter(col(scoreCol) === lit(sStar))
    val numericId = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val layer =
      if (!numericId || boundaryBuckets == 1) layerPrefix(layerRows, idCol, tokenCol, remaining)
      else {
        // two-level walk: id-range buckets from approx-quantile boundaries
        // (sorted, ride the plan as literals — both jobs below see the
        // SAME bucketing), per-bucket sums walked on the driver, then an
        // ordered window over ONLY the boundary bucket's rows
        val fracs = (1 until boundaryBuckets).map(_.toDouble / boundaryBuckets)
        val bRow = layerRows
          .agg(percentile_approx(col(idCol), typedlit(fracs), lit(10000)).as("__b"))
          .collect()(0)
        val bounds: Seq[Any] =
          if (bRow.isNullAt(0)) Seq.empty else bRow.getAs[collection.Seq[Any]](0).toSeq
        if (bounds.isEmpty) layerPrefix(layerRows, idCol, tokenCol, remaining)
        else {
          val bucketed = layerRows.withColumn("__lb", bucketOf(col(idCol), bounds))
          val perBucket = bucketed
            .groupBy(col("__lb"))
            .agg(sum(col(tokenCol).cast("long")).as("__t"))
            .collect() // bounded: <= boundaryBuckets rows
            .map(r => (r.getInt(0), r.getLong(1)))
            .sortBy(_._1)
          var cumB = 0L
          var j = 0
          while (j < perBucket.length && cumB + perBucket(j)._2 <= remaining) {
            cumB += perBucket(j)._2; j += 1
          }
          if (j >= perBucket.length) bucketed.drop("__lb") // whole layer fits
          else {
            val bStar = perBucket(j)._1
            val fullBuckets = bucketed.filter(col("__lb") < lit(bStar)).drop("__lb")
            val boundaryBucket = layerPrefix(
              bucketed.filter(col("__lb") === lit(bStar)).drop("__lb"),
              idCol,
              tokenCol,
              remaining - cumB
            )
            fullBuckets.unionByName(boundaryBucket)
          }
        }
      }
    above.unionByName(layer)
  }

  /** Inclusive running-sum prefix of `rows` in `idCol` ASC order kept
    * within `limit` tokens — the single-window piece of
    * [[selectByBudget]], applied only to one score layer (legacy path)
    * or one id-range bucket (two-level path). */
  private def layerPrefix(
      rows: DataFrame,
      idCol: String,
      tokenCol: String,
      limit: Long
  ): DataFrame =
    rows
      .withColumn(
        "__cum",
        sum(col(tokenCol).cast("long")).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(idCol))
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow
            )
        )
      )
      .filter(col("__cum") <= lit(limit))
      .drop("__cum")

  /** DoReMi-style domain-mixture OPTIMIZATION (Xie et al., NeurIPS 2023:
    * upweight domains with EXCESS loss; here the Group-DRO-flavored
    * static-loss variant): starting uniform, each of `steps` rounds
    * computes the current mixture's weighted mean loss
    * `m = Σ α_d·L_d / Σ α_d` and applies the linearized
    * multiplicative-weights update `α_d ← α_d · max(0, 1 + η·(L_d − m))`
    * (Arora–Hazan–Kale's (1+ηm) form — no `exp`, whose cross-engine
    * rounding is not reproducible). Domains whose loss sits above the
    * mixture mean gain weight, below lose — iterations interact through
    * the moving mean. Output: one row per domain with `n_docs`,
    * `mean_loss` (raw IEEE quotient of the decimal-exact sum — the x126
    * contract), and the normalized `weight` to feed [[resampleToMix]].
    *
    * Determinism/replay contract (the x121 engine-formula discipline):
    * per-domain mean losses and the evolving α are SNAPPED to the
    * `2^-scaleShift` dyadic grid via `floor(x·2^k)/2^k` (exact: scaling
    * by a power of two is lossless), so both mixture sums are sums of
    * grid values — exact and order-independent — and every remaining op
    * (one division, the update chain) is a correctly-rounded scalar
    * IEEE op an external engine replays bit-for-bit. `η = 2^-etaShift`.
    * The order-independence of the mixture sums is exact only while each
    * `α_d·L_d` product is itself on the grid (roughly `|α·L| < 2^(53 -
    * 2·scaleShift)` — ~2^13 at the default 2^-20 grid; classifier logits
    * are far inside it, raw perplexities may not be); the driver loop
    * therefore ALSO iterates in sorted-group-key order, so the result is
    * deterministic and replayable (ORDER BY the group key in the replay)
    * even when loss magnitudes exceed the exact-sum range.
    *
    * 100 TB shape: ONE corpus pass (groupBy(domain) count + decimal
    * sum, map-side partials); the loop is driver scalar arithmetic over
    * the ≤ `maxGroups`-bounded domain table (loud guard). NULL losses
    * and NULL groups are excluded (documented; a mostly-null domain's
    * mean reflects its scored rows only). */
  /** Multi-epoch curriculum under a token budget — the generalization of
    * the [[curriculumInterleave]] ∘ [[selectByBudget]] first-epoch slice
    * (the x162 composition) to budgets that EXCEED one pass over the
    * corpus, which real token budgets do (Muennighoff et al. 2023: 4+
    * epochs of a constrained corpus are worth near-fresh data). Semantics:
    *
    *   - The corpus is ordered once by [[curriculumInterleave]] and cut
    *     into `tiers` equal position slices (`(pos·tiers) div (N+1)`, the
    *     x162 grid contract) — the easy→hard tier RAMP repeats identically
    *     every epoch.
    *   - Full epochs `0 .. k−1` (k = `budget div totalTokens`, bounded by
    *     `maxEpochs`) carry every doc.
    *   - The final PARTIAL epoch k (if `budget mod totalTokens > 0`) fills
    *     whole earliest tiers first; the boundary tier is cut by the
    *     per-epoch shuffle order (below).
    *   - Within a tier, each epoch reads docs in a fresh DETERMINISTIC
    *     order: `shuffle_key = tokenHash60(id || '#' || epoch)` — the
    *     md5-based convention of [[stratifiedHashSample]]/[[hashSplit]]
    *     (x39/x63), portable to the oracle, no RNG state, invariant to
    *     partitioning. Epoch 0 included: ONE uniform rule (x162's id
    *     tie-break was the single-epoch special case; this operator is
    *     the multi-epoch contract).
    *
    * Output: one row per (doc, epoch) assignment — (`idCol`, `sourceCol`,
    * `tokenCol`, `epoch`, `tier`, `shuffle_key`, `pos`) with `pos` the
    * 1-based position WITHIN the epoch under (tier, shuffle_key, id)
    * order — the exact sequence a trainer consumes.
    *
    * 100 TB shape — NO global sort or single-partition window anywhere:
    * the input chain is localCheckpoint'ed once (the x162/x122
    * materializeInput lesson — this operator takes several bounded
    * actions); (N, T) is ONE 1-row collect; the partial-epoch cut is a
    * two-level driver walk (≤`tiers`-row tier histogram, then ≤1024
    * fixed-range hash-bucket sums — hashes are uniform by construction,
    * so no quantile job) and only the boundary BUCKET's rows (~layer/1024)
    * pay an ordered window; per-epoch positions are closed-form — a
    * (epoch, tier, bucket) count aggregate, a cumulative window over that
    * ≤epochs·tiers·1024-row frame partitioned by epoch, a fine-grained
    * rank window, and one equi-join back. Requires unique `idCol`. Docs
    * with NULL/non-positive `tokenCol` are excluded (the
    * [[selectByBudget]] convention). */
  def curriculumEpochs(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      difficultyCol: String,
      sourceCol: String,
      budgetTokens: Long,
      tiers: Int = 256,
      maxEpochs: Int = 16,
      maxSources: Int = 1000
  ): DataFrame = {
    require(budgetTokens >= 0, s"curriculumEpochs: budget must be >= 0, got $budgetTokens")
    curriculumEpochs(
      docs, idCol, tokenCol, difficultyCol, sourceCol,
      (_, _) => budgetTokens, tiers, maxEpochs, maxSources)
  }

  /** [[curriculumEpochs]] with the budget given as a FUNCTION of the
    * corpus shape — `budgetOf(nDocs, totalTokens)` — for the standard
    * "budget = f · corpus epochs" call (x165/x169's 2.5 epochs). The
    * operator already aggregates (n, total) from its materialized
    * curriculum chain for the partial-epoch walk; deriving the budget
    * from the same one-row aggregate removes the caller's separate
    * corpus-tokenizing count job (the trainer guard-merge pattern,
    * guide §2/Finding 3 — one less full pass AND one less driver
    * barrier). Docs with NULL/non-positive `tokenCol` are excluded
    * before the aggregate, so `totalTokens` equals the sum the caller
    * would compute over positive token counts. */
  def curriculumEpochs(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      difficultyCol: String,
      sourceCol: String,
      budgetOf: (Long, Long) => Long,
      tiers: Int,
      maxEpochs: Int,
      maxSources: Int
  ): DataFrame = {
    require(tiers >= 1 && tiers <= 65536, s"curriculumEpochs: tiers must be in [1, 65536]")
    require(maxEpochs >= 1 && maxEpochs <= 128, "curriculumEpochs: maxEpochs must be in [1, 128]")
    import org.apache.spark.sql.expressions.Window
    val base = docs.filter(col(tokenCol).isNotNull && col(tokenCol) > 0)
    val cur = curriculumInterleave(base, idCol, difficultyCol, sourceCol, maxSources)
    val withTok = cur
      .join(base.select(col(idCol), col(tokenCol).cast("long").as("__tok")), Seq(idCol))
    // several bounded actions follow — materialize the curriculum chain
    // once so none of them replays the interleave windows (x162's lesson)
    val mat = withTok.stageCheckpoint()
    val head = mat.agg(count(lit(1)).as("n"), sum("__tok").as("t")).collect()(0)
    val n = head.getLong(0)
    val total = if (n == 0L) 0L else head.getLong(1)
    val budgetTokens = budgetOf(n, total)
    require(budgetTokens >= 0, s"curriculumEpochs: budget must be >= 0, got $budgetTokens")
    def shaped(df: DataFrame): DataFrame =
      df.select(
        col(idCol), col(sourceCol), col("__tok").as(tokenCol),
        col("epoch"), col("tier"), col("shuffle_key"), col("pos"))
    if (n == 0L || budgetTokens == 0L)
      return shaped(mat
        .withColumn("epoch", lit(0L)).withColumn("tier", lit(0L))
        .withColumn("shuffle_key", lit(0L)).withColumn("pos", lit(0L))
        .limit(0))
    require(
      budgetTokens / total <= maxEpochs,
      s"curriculumEpochs: budget $budgetTokens spans ${budgetTokens / total} full epochs of " +
        s"$total corpus tokens > maxEpochs=$maxEpochs — every epoch re-emits the corpus; " +
        "raise maxEpochs deliberately if the repetition is intended"
    )
    val kFull = budgetTokens / total
    val rem = budgetTokens - kFull * total
    val tiered = mat.withColumn("tier", expr(s"(pos * $tiers) div ${n + 1L}"))
    def ekOf(epoch: Column): Column =
      graft.operators.Dedup.tokenHash60(
        concat(col(idCol).cast("string"), lit("#"), epoch.cast("string")))
    val bucketWidth = 1125899906842624L // 2^50 -> 1024 order-preserving buckets of the 60-bit hash
    val full =
      if (kFull >= 1L)
        Some(tiered.withColumn("epoch", explode(sequence(lit(0L), lit(kFull - 1L)))))
      else None
    val partial =
      if (rem > 0L) {
        // tier histogram: <= `tiers` rows, the selectByBudget walk
        val perTier = tiered
          .groupBy("tier").agg(sum("__tok").as("__t"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        var cum = 0L; var i = 0
        while (i < perTier.length && cum + perTier(i)._2 <= rem) { cum += perTier(i)._2; i += 1 }
        // rem < total, so some tier always overflows
        val tStar = perTier(i)._1
        val rem2 = rem - cum
        val below = tiered.filter(col("tier") < lit(tStar))
        val layer = tiered
          .filter(col("tier") === lit(tStar))
          .withColumn("__ek", ekOf(lit(kFull)))
          .withColumn("__bk", expr(s"__ek div $bucketWidth"))
        val perBucket = layer
          .groupBy("__bk").agg(sum("__tok").as("__t"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        var cumB = 0L; var j = 0
        while (j < perBucket.length && cumB + perBucket(j)._2 <= rem2) {
          cumB += perBucket(j)._2; j += 1
        }
        val cut =
          if (j >= perBucket.length) layer.drop("__ek", "__bk") // whole layer fits
          else {
            val bStar = perBucket(j)._1
            val boundary = layer
              .filter(col("__bk") === lit(bStar))
              .withColumn(
                "__cum",
                sum(col("__tok")).over(
                  Window.orderBy(col("__ek"), col(idCol))
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .filter(col("__cum") <= lit(rem2 - cumB))
              .drop("__cum")
            layer.filter(col("__bk") < lit(bStar)).unionByName(boundary)
              .drop("__ek", "__bk")
          }
        Some(below.unionByName(cut).withColumn("epoch", lit(kFull)))
      } else None
    val assigned = (full, partial) match {
      case (Some(f), Some(p)) => f.unionByName(p)
      case (Some(f), None)    => f
      case (None, Some(p))    => p
      case (None, None)       => tiered.withColumn("epoch", lit(0L)).limit(0)
    }
    // per-epoch positions, closed-form: cumulative (tier, bucket) offsets
    // per epoch (a window over the tiny aggregate frame) + a fine-grained
    // rank — the bucket prefix is order-preserving in the shuffle key, so
    // offset + rank == row_number over (tier, shuffle_key, id) per epoch.
    // The assignment frame feeds TWO consumers (the offset aggregate and
    // the final rank join) — materialize it once so the partial-epoch
    // boundary window isn't re-evaluated per consumer (the x162 lesson;
    // the frame is the operator's own output size, linear state)
    val keyed = assigned
      .withColumn("shuffle_key", ekOf(col("epoch")))
      .withColumn("__bk", expr(s"shuffle_key div $bucketWidth"))
      .stageCheckpoint()
    val grp = keyed.groupBy("epoch", "tier", "__bk").agg(count(lit(1)).as("__gc"))
    val offW = Window.partitionBy("epoch").orderBy("tier", "__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = grp
      .withColumn("__off", coalesce(sum("__gc").over(offW), lit(0L)))
      .drop("__gc")
    val rnW = Window.partitionBy("epoch", "tier", "__bk").orderBy(col("shuffle_key"), col(idCol))
    shaped(
      keyed
        .join(off, Seq("epoch", "tier", "__bk"))
        .withColumn("pos", col("__off") + row_number().over(rnW)))
  }

  def doremiMix(
      docs: DataFrame,
      groupCol: String,
      lossCol: String,
      steps: Int,
      etaShift: Int = 2,
      scaleShift: Int = 20,
      maxGroups: Int = 100000
  ): DataFrame = {
    require(steps >= 1 && steps <= 128, s"doremiMix: steps must be in [1, 128], got $steps")
    require(etaShift >= 0 && etaShift <= 24, s"doremiMix: etaShift must be in [0, 24]")
    require(scaleShift >= 1 && scaleShift <= 30, s"doremiMix: scaleShift must be in [1, 30]")
    require(maxGroups >= 1, "doremiMix: maxGroups must be >= 1")
    val spark = docs.sparkSession
    val stats = docs
      .filter(col(groupCol).isNotNull && col(lossCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(
        count(lit(1)).as("__n"),
        sum(
          round(col(lossCol).cast("double"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6))
        ).as("__s")
      )
      .limit(maxGroups + 1)
      .collect() // bounded: maxGroups + 1 rows, guarded below
      // DETERMINISTIC iteration order: groupBy-collect order varies with
      // partitioning, and the grid-sum exactness argument below only covers
      // |a·l| within the 2^-scaleShift grid's exact range — sorting by group
      // key (cheap, bounded by maxGroups) makes the loop replayable even
      // when loss magnitudes push the sums past that range
      .sortBy(r => String.valueOf(r.get(0)))
    require(
      stats.length <= maxGroups,
      s"doremiMix: more than $maxGroups distinct $groupCol groups — the driver-side " +
        "mixture loop is sized for domain-level mixtures; raise maxGroups deliberately"
    )
    val scale = math.pow(2.0, scaleShift) // exact power of two
    val eta = math.pow(2.0, -etaShift)
    def snap(x: Double): Double = math.floor(x * scale) / scale
    val d = stats.length
    val groups = stats.map(_.get(0))
    val ns = stats.map(_.getLong(1))
    val means = stats.map(r => r.getDecimal(2).doubleValue() / r.getLong(1))
    val ls = means.map(snap)
    val a = Array.fill(d)(1.0)
    var t = 0
    while (t < steps) {
      var sumA = 0.0
      var sumAL = 0.0
      var i = 0
      while (i < d) { sumA += a(i); sumAL += a(i) * ls(i); i += 1 } // grid sums: exact
      val m = sumAL / sumA
      i = 0
      while (i < d) {
        a(i) = snap(a(i) * math.max(0.0, 1.0 + eta * (ls(i) - m)))
        i += 1
      }
      t += 1
    }
    val totA = a.sum // grid sum: exact
    require(totA > 0, "doremiMix: all domain weights collapsed to zero — lower eta")
    val out = (0 until d).map { i =>
      org.apache.spark.sql.Row(groups(i), ns(i), means(i), a(i) / totA)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          groupCol, docs.schema(groupCol).dataType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "n_docs", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "mean_loss", org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "weight", org.apache.spark.sql.types.DoubleType, nullable = false)
      ))
    )
  }

  /** Sequence-packing index over the MULTI-EPOCH curriculum stream — the
    * [[curriculumEpochs]] ∘ [[graft.operators.TextAnalysis.packSequences]]
    * composition: the budgeted (doc, epoch) stream is ONE concatenated
    * token stream in (epoch, pos) order, sliced into `seqLen`-token
    * context windows. Every assignment row gains `stream_off` (its first
    * token's offset in the global stream), `seq_id` (the window holding
    * that token) and `seq_off` (the offset within it) — the exact
    * (epoch, window) layout a packed dataloader reproduces over the WHOLE
    * training run, not just one epoch. A doc whose tokens spill the
    * window boundary continues into `seq_id + 1` (packSequences'
    * contract), and windows likewise run straight across epoch
    * boundaries: the stream is continuous, a trainer never restarts a
    * context window because an epoch ticked over.
    *
    * Input contract: a [[curriculumEpochs]]-shaped frame — `epoch`,
    * `tier`, `shuffle_key` columns present; epochs `0..k−1` carry the
    * full corpus and only the LAST epoch may be partial — which
    * curriculumEpochs guarantees by construction.
    *
    * 100 TB shape — the per-epoch token prefix is the SAME closed-form
    * family as curriculumEpochs' `pos`, NOT a per-epoch sort (a window
    * partitioned only by `epoch` would funnel the whole corpus through
    * one task per epoch): a (epoch, tier, bucket) token-sum aggregate
    * (≤ epochs·tiers·1024 rows), an exclusive cumulative-offset window
    * over that tiny frame, and a within-bucket running sum ordered by
    * (shuffle_key, id) — the 2^50 bucket prefix of the 60-bit hash is
    * order-preserving, so offset + running sum == the token prefix under
    * (tier, shuffle_key, id) order. The epoch BASE needs no per-epoch
    * aggregate at all: full epochs each carry the whole corpus, so
    * base(e) = e · T₀ with T₀ = epoch-0 tokens (one scalar aggregate —
    * exact for every epoch because an epoch with a different total can
    * only be the last). The input is materialized once (it feeds the
    * offset aggregate and the final join — the x162 lesson). */
  def packEpochs(
      assignments: DataFrame,
      idCol: String,
      tokenCol: String,
      seqLen: Int
  ): DataFrame = {
    require(seqLen > 0, s"packEpochs: seqLen must be positive, got $seqLen")
    Seq("epoch", "tier", "shuffle_key").foreach(c =>
      require(
        assignments.columns.contains(c),
        s"packEpochs: input must be curriculumEpochs-shaped — column '$c' missing"))
    import org.apache.spark.sql.expressions.Window
    val bucketWidth = 1125899906842624L // 2^50: the curriculumEpochs bucket grid
    val keyed = assignments
      .withColumn("__bk", expr(s"shuffle_key div $bucketWidth"))
      .stageCheckpoint()
    val t0Row = keyed.filter(col("epoch") === 0L)
      .agg(sum(col(tokenCol).cast("long"))).collect()(0)
    val t0 = if (t0Row.isNullAt(0)) 0L else t0Row.getLong(0)
    val grp = keyed
      .groupBy("epoch", "tier", "__bk")
      .agg(sum(col(tokenCol).cast("long")).as("__gt"))
    val offW = Window
      .partitionBy("epoch")
      .orderBy("tier", "__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = grp
      .withColumn("__goff", coalesce(sum("__gt").over(offW), lit(0L)))
      .drop("__gt")
    val runW = Window
      .partitionBy("epoch", "tier", "__bk")
      .orderBy(col("shuffle_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .join(broadcast(off), Seq("epoch", "tier", "__bk"))
      .withColumn(
        "stream_off",
        col("epoch") * lit(t0) + col("__goff")
          + sum(col(tokenCol).cast("long")).over(runW) - col(tokenCol).cast("long"))
      .withColumn("seq_id", floor(col("stream_off") / lit(seqLen.toLong)).cast("long"))
      .withColumn("seq_off", pmod(col("stream_off"), lit(seqLen.toLong)))
      .drop("__bk", "__goff")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023: "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a total token budget UNIFORMLY across sources,
    * capping every source at `maxEpochs` passes over its own data and
    * redistributing what the capped sources can't absorb — the
    * epoch-capped alternative to temperature sampling ([[temperatureMix]])
    * that never over-repeats a small source to hit a mixture ratio.
    *
    * The iterative redistribution has a CLOSED FORM (waterfilling): with
    * caps `c₁ ≤ … ≤ c_S` ascending, source `i` is capped iff
    * `cᵢ·(S−i+1) + Σ_{j<i} cⱼ ≤ B` — the predicate is prefix-closed
    * (if `i` caps, so does every smaller cap: `c_{i−1}(S−i+2)+C_{i−2} =
    * c_{i−1}(S−i+1)+C_{i−1} ≤ cᵢ(S−i+1)+C_{i−1} ≤ B`) — and every
    * uncapped source gets the uniform level `(B − Σ_capped c) / (S − m)`.
    * If the budget exceeds ALL caps, every source allocates its cap and
    * the remainder is deliberately left unallocated (UniMax's contract:
    * repetition is bounded; the budget, not the corpus, gives way).
    *
    * Output: one row per source — `n_docs`, `n_tokens`, `cap_tokens`
    * (= n_tokens · maxEpochs), `capped`, `alloc_tokens`, `epochs`
    * (= alloc / n_tokens ≤ maxEpochs). NULL sources / non-positive token
    * counts are excluded (the [[selectByBudget]] convention).
    *
    * 100 TB shape: ONE corpus pass (groupBy(source) count + sum with
    * map-side partials); the waterfill is driver scalar arithmetic over
    * the ≤`maxGroups`-bounded source table (loud guard — the
    * [[doremiMix]] pattern), iterated in sorted (cap, source) order so
    * the result is deterministic and replayable at any partitioning. */
  def unimaxMix(
      docs: DataFrame,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long,
      maxEpochs: Int,
      maxGroups: Int = 100000
  ): DataFrame = {
    require(budgetTokens >= 0, s"unimaxMix: budget must be >= 0, got $budgetTokens")
    require(maxEpochs >= 1 && maxEpochs <= 128, "unimaxMix: maxEpochs must be in [1, 128]")
    require(maxGroups >= 1, "unimaxMix: maxGroups must be >= 1")
    val stats = docs
      .filter(col(sourceCol).isNotNull && col(tokenCol).isNotNull && col(tokenCol) > 0)
      .groupBy(col(sourceCol).as("__s"))
      .agg(count(lit(1)).as("__n"), sum(col(tokenCol).cast("long")).as("__t"))
      .limit(maxGroups + 1)
      .collect() // bounded: maxGroups + 1 rows, guarded in the waterfill
      .map(r => (String.valueOf(r.get(0)), r.get(0), r.getLong(1), r.getLong(2)))
    unimaxWaterfill(
      docs.sparkSession, sourceCol, docs.schema(sourceCol).dataType,
      stats, budgetTokens, maxEpochs, maxGroups)
  }

  /** The shared driver-side waterfill behind [[unimaxMix]] (batch stats)
    * and [[unimaxMixIncremental]] (merged stats index) — both faces route
    * the SAME collected (source, n, t) rows through this closed form, so
    * streamed-prefix allocations equal the one-shot table by
    * construction (and StreamingSpec pins it anyway). */
  private def unimaxWaterfill(
      spark: SparkSession,
      sourceCol: String,
      srcType: org.apache.spark.sql.types.DataType,
      stats0: Array[(String, Any, Long, Long)],
      budgetTokens: Long,
      maxEpochs: Int,
      maxGroups: Int
  ): DataFrame = {
    val stats = stats0.sortBy { case (key, _, _, t) => (t, key) } // ascending caps; key tie-break
    require(
      stats.length <= maxGroups,
      s"unimaxMix: more than $maxGroups distinct $sourceCol groups — the driver-side " +
        "waterfill is sized for source/language-level mixtures; raise maxGroups deliberately"
    )
    stats.foreach { case (_, _, _, t) =>
      require(
        t <= Long.MaxValue / maxEpochs,
        "unimaxMix: n_tokens * maxEpochs overflows int64 — lower maxEpochs")
    }
    val s = stats.length
    val caps = stats.map(_._4 * maxEpochs)
    // Prefix-closed capped predicate: the FIRST failure in ascending-cap
    // order ends capping (every later cap is >= this one against a level
    // that can only have grown, so continuing to test would wrongly cap a
    // later tie — caps [10,10] at B=19 must waterfill to 9.5/9.5, not
    // 9/10). With the break, cum IS the full prefix sum, so the loop is
    // equivalent to the independent per-row predicate the oracle
    // evaluates with window functions.
    var cum = 0L
    val capped = new Array[Boolean](s)
    var m = 0
    var i = 0
    var open = true
    while (i < s && open) {
      // division form of cap·(S−i) ≤ B−cum: cannot overflow int64
      if (caps(i) <= (budgetTokens - cum) / (s - i).toLong) {
        capped(i) = true; cum += caps(i); m += 1; i += 1
      } else open = false
    }
    val level =
      if (m == s) 0.0 else (budgetTokens - cum).toDouble / (s - m).toDouble
    val out: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList((0 until s).map { j =>
        val (_, src, n, t) = stats(j)
        val alloc = if (capped(j)) caps(j).toDouble else level
        org.apache.spark.sql.Row(src, n, t, caps(j), capped(j), alloc, alloc / t.toDouble)
      }: _*)
    spark.createDataFrame(
      out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(sourceCol, srcType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "n_docs", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "n_tokens", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "cap_tokens", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "capped", org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "alloc_tokens", org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "epochs", org.apache.spark.sql.types.DoubleType, nullable = false)
      ))
    )
  }

  /** The allocation snapshot + merged stats index of one streamed batch —
    * see [[unimaxMixIncremental]]. */
  final case class IncrementalUnimax(allocation: DataFrame, statsIndex: DataFrame)

  /** STREAMING face of [[unimaxMix]] (continuous-ingestion allocation —
    * the x110/x123 persisted-index discipline): the corpus-wide state a
    * UniMax allocation needs is exactly the additive per-source
    * `(n_docs, n_tokens)` stats index, so under `foreachBatch` each batch
    * folds its delta into the index and the waterfill re-runs over the
    * merged table — the returned `allocation` is the EXACT [[unimaxMix]]
    * table of everything ingested so far (both faces route the same
    * collected stats through [[unimaxWaterfill]]; StreamingSpec pins
    * every prefix against the one-shot anyway). The caller persists the
    * returned `statsIndex` (columns `sourceCol, n, t`; empty on the first
    * batch) and feeds it back — index size is #sources rows, never
    * corpus-sized. Allocations are NOT monotone across batches (a growing
    * source can newly cap, shrinking everyone else's level): each
    * snapshot is the fair allocation for the corpus AS OF that batch,
    * which is the operator's contract, not a defect.
    *
    * 100 TB shape: per batch ONE map-side-combined aggregate over the
    * batch + a ≤`maxGroups`-row index merge and collect; nothing rescans
    * history. */
  def unimaxMixIncremental(
      batch: DataFrame,
      statsIndex: DataFrame,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long,
      maxEpochs: Int,
      maxGroups: Int = 100000
  ): IncrementalUnimax = {
    require(budgetTokens >= 0, s"unimaxMixIncremental: budget must be >= 0, got $budgetTokens")
    require(
      maxEpochs >= 1 && maxEpochs <= 128, "unimaxMixIncremental: maxEpochs must be in [1, 128]")
    require(maxGroups >= 1, "unimaxMixIncremental: maxGroups must be >= 1")
    val missing = Seq(sourceCol, "n", "t").filterNot(statsIndex.columns.contains)
    require(
      missing.isEmpty,
      s"unimaxMixIncremental: statsIndex lacks ${missing.mkString(", ")} — " +
        s"($sourceCol, n long, t long), empty on the first batch")
    val delta = batch
      .filter(col(sourceCol).isNotNull && col(tokenCol).isNotNull && col(tokenCol) > 0)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"), sum(col(tokenCol).cast("long")).as("t"))
    val merged = statsIndex
      .select(col(sourceCol), col("n").cast("long").as("n"), col("t").cast("long").as("t"))
      .unionByName(delta)
      .groupBy(col(sourceCol))
      .agg(sum("n").as("n"), sum("t").as("t"))
    val stats = merged
      .limit(maxGroups + 1)
      .collect() // bounded: maxGroups + 1 rows, guarded in the waterfill
      .map(r => (String.valueOf(r.get(0)), r.get(0), r.getLong(1), r.getLong(2)))
    val allocation = unimaxWaterfill(
      batch.sparkSession, sourceCol, batch.schema(sourceCol).dataType,
      stats, budgetTokens, maxEpochs, maxGroups)
    IncrementalUnimax(allocation, merged)
  }

  /** Sequence-packing index over an ARBITRARY partitioned stream — the
    * generalization of [[packEpochs]] from the curriculum stream to any
    * frame carrying long-typed stream-partition columns (e.g. the x172
    * anneal schedule's `(phase, epoch)`): the stream is all rows in
    * ascending `partCols` order, within a partition in ascending
    * (`keyCol`, `idCol`) order, concatenated into ONE token stream and
    * sliced into `seqLen`-token context windows. Adds `stream_off` /
    * `seq_id` / `seq_off` ([[packEpochs]]' contract: docs spill across
    * window boundaries, windows run straight across partition
    * boundaries — a trainer never restarts a context window because a
    * phase or epoch ticked over).
    *
    * `keyCol` must be a uniform hash key (the `tokenHash60` convention)
    * — uniformity is what makes the fixed-range bucket prefix exact
    * WITHOUT a quantile job; `(partCols, idCol)` must be unique; rows
    * with NULL/non-positive `tokenCol` are excluded (the
    * [[selectByBudget]] convention). `partCols` must be LongType —
    * stream order is numeric (a string sort orders epoch "10" before
    * "2"), and the long pin keeps the broadcast base table's join
    * types exact.
    *
    * 100 TB shape — no global sort, no single-partition window: token
    * prefixes come from a (partCols, bucket) aggregate (2^50-wide
    * buckets of the 60-bit key are order-preserving), an exclusive
    * cumulative window over that tiny frame partitioned BY partCols,
    * and a within-bucket running sum; partition BASES are a
    * ≤`maxParts`-row collect walked on the driver in numeric order and
    * broadcast back — the [[unimaxSelect]] cut-table pattern, so every
    * window in the plan is hash-partitioned. The input is materialized
    * once (it feeds the aggregates and the final joins). */
  def packStream(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      partCols: Seq[String],
      keyCol: String,
      seqLen: Long,
      maxParts: Int = 4096
  ): DataFrame = {
    require(seqLen >= 1, s"packStream: seqLen must be >= 1, got $seqLen")
    require(partCols.nonEmpty, "packStream: partCols must be non-empty")
    require(maxParts >= 1, "packStream: maxParts must be >= 1")
    val missing = (partCols :+ keyCol :+ idCol :+ tokenCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"packStream: input lacks ${missing.mkString(", ")}")
    partCols.foreach { c =>
      require(
        df.schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"packStream: partition column $c must be LongType — stream order is numeric " +
          "(a string sort orders epoch '10' before '2')")
    }
    require(
      df.schema(keyCol).dataType == org.apache.spark.sql.types.LongType,
      s"packStream: $keyCol must be a LongType uniform hash key (the tokenHash60 " +
        "convention) — the fixed-range bucket prefix is exact only for uniform keys")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val pc = partCols.map(col)
    val bucketWidth = 1125899906842624L // 2^50 -> 1024 order-preserving buckets of the 60-bit hash
    val mat = df
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0)
      .withColumn("__bk", expr(s"`$keyCol` div $bucketWidth"))
      .stageCheckpoint() // feeds the offset aggregate, the base collect, and the final join
    val grp = mat
      .groupBy(pc :+ col("__bk"): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__bt"))
    // partition bases: tiny collect, numeric-order driver walk, broadcast back
    val totals = grp
      .groupBy(pc: _*)
      .agg(sum("__bt").as("__t"))
      .limit(maxParts + 1)
      .collect() // bounded: maxParts + 1 rows, guarded below
    require(
      totals.length <= maxParts,
      s"packStream: more than $maxParts stream partitions — partCols should be " +
        "phase/epoch-grained; raise maxParts deliberately")
    def lexLt(a: Seq[Long], b: Seq[Long]): Boolean =
      a.zip(b).find { case (x, y) => x != y }.exists { case (x, y) => x < y }
    val sorted = totals
      .map(r => (partCols.indices.map(r.getLong).toSeq, r.getLong(partCols.length)))
      .sortWith((a, b) => lexLt(a._1, b._1))
    val bases = sorted.scanLeft(0L)(_ + _._2).init
    val baseRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(sorted.zip(bases).map { case ((ks, _), b) =>
        org.apache.spark.sql.Row.fromSeq(ks :+ b)
      }: _*)
    val baseDf = spark.createDataFrame(
      baseRows,
      org.apache.spark.sql.types.StructType(
        partCols.map(c => org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.LongType, nullable = false)) :+
          org.apache.spark.sql.types.StructField(
            "__base", org.apache.spark.sql.types.LongType, nullable = false)))
    val offW = Window.partitionBy(pc: _*).orderBy("__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = grp
      .withColumn("__boff", coalesce(sum("__bt").over(offW), lit(0L)))
      .drop("__bt")
    val rnW = Window.partitionBy(pc :+ col("__bk"): _*).orderBy(col(keyCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mat
      .join(off, partCols :+ "__bk")
      .join(broadcast(baseDf), partCols)
      .withColumn("__run", sum(col(tokenCol).cast("long")).over(rnW))
      .withColumn(
        "stream_off", col("__base") + col("__boff") + col("__run") - col(tokenCol).cast("long"))
      .withColumn("seq_id", expr(s"stream_off div $seqLen"))
      .withColumn("seq_off", col("stream_off") % lit(seqLen))
      .drop("__bk", "__boff", "__base", "__run")
  }

  /** UniMax MATERIALIZATION — the [[unimaxMix]] allocation applied to the
    * corpus (the x128/x132 optimize→apply pattern): one (doc, epoch)
    * assignment row for every pass a trained-on doc takes under the
    * waterfilled budget. Per source, the fractional allocation becomes an
    * integer token budget (`cap_tokens` exactly for capped sources —
    * never through a double; `floor(level)` for uncapped), which splits
    * into `k = alloc div n_tokens` FULL passes over the source (every doc,
    * epochs `0..k−1`) plus a PARTIAL epoch `k` of `alloc mod n_tokens`
    * tokens — the greedy prefix of the source's docs in the per-epoch
    * deterministic order `tokenHash60(id || '#' || k)` (the
    * [[curriculumEpochs]] reshuffle convention, md5-portable to the
    * oracle). Selected-token maximality holds per source: the next doc in
    * shuffle order would overflow the source's allocation.
    *
    * 100 TB shape: the corpus is materialized once (several bounded
    * actions read it); the waterfill is [[unimaxMix]]'s one pass +
    * driver arithmetic; full epochs are a broadcast join + conditional
    * `sequence` explode (≤ maxEpochs fan-out, no shuffle); the
    * partial-epoch cut NEVER sorts a source globally — a fixed-range
    * bucket walk over the 60-bit hash (≤ sources·1024 tiny rows collected,
    * bounded by `maxGroups`; hashes are uniform by construction, no
    * quantile job) takes whole buckets while they fit, and only each
    * source's BOUNDARY bucket (~1/1024 of the source) pays an ordered
    * window, partitioned by source so boundary cuts run in parallel.
    * NULL sources and NULL/non-positive token counts are excluded (the
    * [[unimaxMix]] convention). */
  def unimaxSelect(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgetTokens: Long,
      maxEpochs: Int,
      maxGroups: Int = 1024
  ): DataFrame = {
    require(budgetTokens >= 0, s"unimaxSelect: budget must be >= 0, got $budgetTokens")
    require(maxEpochs >= 1 && maxEpochs <= 128, "unimaxSelect: maxEpochs must be in [1, 128]")
    require(maxGroups >= 1, "unimaxSelect: maxGroups must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val base = docs
      .filter(col(sourceCol).isNotNull && col(tokenCol).isNotNull && col(tokenCol) > 0)
      .select(col(idCol), col(sourceCol), col(tokenCol).cast("long").as(tokenCol))
      .stageCheckpoint() // feeds the waterfill, the bucket sums, and both branches
    val alloc = unimaxMix(base, sourceCol, tokenCol, budgetTokens, maxEpochs, maxGroups)
      .collect() // bounded: one row per source, <= maxGroups (unimaxMix guards)
    // integer per-source budgets: capped sources take their exact Long cap
    // (never routed through the double), uncapped floor the uniform level
    val plan = alloc.map { r =>
      val t = r.getLong(2)
      val at = if (r.getBoolean(4)) r.getLong(3) else math.floor(r.getDouble(5)).toLong
      (String.valueOf(r.get(0)), r.get(0), at / t, at % t)
    }
    val srcType = docs.schema(sourceCol).dataType
    val ksRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(plan.map { case (_, src, k, rem) =>
        org.apache.spark.sql.Row(src, k, rem)
      }: _*)
    val ks = spark.createDataFrame(
      ksRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(sourceCol, srcType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "__k", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "__rem", org.apache.spark.sql.types.LongType, nullable = false)
      ))
    )
    val joined = base.join(broadcast(ks), Seq(sourceCol))
    def shaped(df: DataFrame): DataFrame =
      df.select(col(idCol), col(sourceCol), col(tokenCol), col("epoch"))
    val full = joined
      .filter(col("__k") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__k") - 1L)))
    val bucketWidth = 1125899906842624L // 2^50 -> 1024 order-preserving buckets of the 60-bit hash
    val pk = joined
      .filter(col("__rem") > 0L)
      .withColumn(
        "__ek",
        graft.operators.Dedup.tokenHash60(
          concat(col(idCol).cast("string"), lit("#"), col("__k").cast("string"))))
      .withColumn("__bk", expr(s"__ek div $bucketWidth"))
    val perBucket = pk
      .groupBy(col(sourceCol).as("__s"), col("__bk"))
      .agg(sum(col(tokenCol)).as("__t"))
      .collect() // bounded: <= maxGroups sources x 1024 buckets
      .map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    // per-source walk: whole buckets while they fit; the boundary bucket
    // always exists because rem < the source's total tokens
    val cutRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(plan.filter(p => p._4 > 0 && perBucket.contains(p._1)).map {
        case (key, src, _, rem) =>
          val buckets = perBucket(key).map(b => (b._2, b._3)).sortBy(_._1)
          var cum = 0L
          var j = 0
          while (j < buckets.length && cum + buckets(j)._2 <= rem) {
            cum += buckets(j)._2; j += 1
          }
          org.apache.spark.sql.Row(src, buckets(j)._1, rem - cum)
      }: _*)
    val cuts = spark.createDataFrame(
      cutRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(sourceCol, srcType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "__bstar", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "__rem2", org.apache.spark.sql.types.LongType, nullable = false)
      ))
    )
    val pkc = pk.join(broadcast(cuts), Seq(sourceCol))
    val below = pkc.filter(col("__bk") < col("__bstar"))
    val boundary = pkc
      .filter(col("__bk") === col("__bstar"))
      .withColumn(
        "__cum",
        sum(col(tokenCol)).over(
          Window.partitionBy(col(sourceCol)).orderBy(col("__ek"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= col("__rem2"))
      .drop("__cum")
    val partial = below.unionByName(boundary).withColumn("epoch", col("__k"))
    shaped(full).unionByName(shaped(partial))
  }

  /** Bucket index of `id` against sorted range `bounds`: the count of
    * boundaries STRICTLY below the id (ties land in the boundary's own
    * bucket) — one higher-order `aggregate` fold over a plan-literal
    * array (compact codegen even at 1024 buckets), so both jobs that use
    * it (per-bucket sums, boundary-bucket filter) see the same
    * deterministic bucketing. */
  private def bucketOf(id: Column, bounds: Seq[Any]): Column =
    aggregate(
      array(bounds.map(lit): _*),
      lit(0),
      (acc, b) => acc + when(id > b, 1).otherwise(0)
    )
}
