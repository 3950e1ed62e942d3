package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Materialize.StageSyntax

/** Composed training-data pipeline: the flagship "clean a web corpus" story
  * built from the individual operators — quality gate, exact dedup, then
  * MinHash-LSH near-duplicate removal (keep the lowest-id representative of
  * every near-dup pair). Each stage is one shuffle-bounded operator; the
  * composition inherits their scale properties. */
object Pipeline {

  /** Returns the cleaned corpus (original columns, survivors only).
    *
    * The deduped intermediate is localCheckpoint-materialized: it feeds the
    * LSH candidate pass, the verification pass, and the final anti-join —
    * without materialization each consumer would re-run the quality scan and
    * the dedup window shuffle. At cluster scale the same role is played by
    * writing the stage to storage between passes; the checkpoint blocks are
    * ContextCleaner-freed once the returned frame is dropped. */
  def cleanCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double,
      nearDupThreshold: Double
  ): DataFrame =
    cleanCorpus(
      docs,
      idCol,
      textCol,
      TextAnalysis.qualityExpr(col(textCol)) >= minQuality,
      nearDupThreshold
    )

  /** [[cleanCorpus]] with a caller-supplied quality PREDICATE — e.g. a
    * learned linear classifier (`TextAnalysis.linearLogit(col(text), w,
    * b) >= 0`), the standard companion to the rule-based gate in curation
    * stacks. Any per-row boolean Column keeps the stage shuffle-free. */
  def cleanCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      quality: org.apache.spark.sql.Column,
      nearDupThreshold: Double
  ): DataFrame = {
    // 1. quality gate — inline predicate, no join-back
    val passed = docs.filter(quality)
    // 2. exact dedup (lowest id per identical text wins)
    // materialize EAGERLY: the near-dup pass references this frame from
    // several subtrees (LSH pipeline, verification sets, final anti-join),
    // some launched as concurrent broadcast-exchange jobs — with a lazy
    // cache they race and each recomputes the quality+window pipeline
    // before any of them has populated it. localCheckpoint(true), not
    // persist+count (the r18 change): same eagerness in ONE job instead
    // of two, and blocks are ContextCleaner-freed when the frame drops —
    // a persist is CacheManager-pinned forever (the nearDuplicates leak
    // rationale, applied here too)
    val deduped = Dedup.exact(passed, Seq(textCol), idCol).stageCheckpoint()
    // 3. near-dup removal: of each (d1 < d2) pair, drop d2
    val pairs = Dedup.nearDuplicates(deduped, idCol, textCol, nearDupThreshold)
    deduped.join(
      pairs.select(col("d2").as(idCol)).distinct(),
      Seq(idCol),
      "left_anti"
    )
  }

  /** The full curation story, end to end: [[cleanCorpus]] (quality gate →
    * exact dedup → near-dup removal) → decontamination against a reference
    * set → domain-mixture resampling to target `shares` → deterministic
    * train/val/test assignment. Six operators composed; every stage is the
    * library call a user would make individually, so the composition
    * inherits each stage's scale contract (no new shuffles beyond the
    * stages' own, no driver materialization beyond resampleToMix's
    * |shares|-bounded collect).
    *
    * Stage ORDER is the semantic contract: the mixture is computed over
    * what SURVIVES cleaning and decontamination (resampling first would
    * let the dedup step distort the mix), and the split comes last so
    * train/val/test fractions hold on the delivered corpus. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      groupCol: String,
      shares: Map[String, Double],
      splits: Seq[(String, Double)],
      minQuality: Double,
      nearDupThreshold: Double
  ): DataFrame =
    curate(
      docs,
      idCol,
      textCol,
      reference,
      groupCol,
      shares,
      splits,
      TextAnalysis.qualityExpr(col(textCol)) >= minQuality,
      nearDupThreshold
    )

  /** [[curate]] with a caller-supplied quality predicate — the learned
    * classifier variant of the curation story (see the [[cleanCorpus]]
    * overload). */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      groupCol: String,
      shares: Map[String, Double],
      splits: Seq[(String, Double)],
      quality: org.apache.spark.sql.Column,
      nearDupThreshold: Double
  ): DataFrame = {
    val cleaned = cleanCorpus(docs, idCol, textCol, quality, nearDupThreshold)
    val decontaminated = Dedup.decontaminate(cleaned, reference, textCol)
    val mixed = Scale.resampleToMix(decontaminated, Seq(idCol), groupCol, shares)
    Scale.hashSplit(mixed, Seq(idCol), splits)
  }

  /** Curation funnel AUDIT — the per-stage survivor counters every
    * production pipeline reports beside its output (drop-rate monitoring;
    * a silent 90% quality-drop regression is invisible from the survivor
    * set alone). One row: `n_total`, `n_quality` (gate passers),
    * `n_after_dedup` (lowest-id survivor per exact text group AMONG
    * passers — stage order matches [[cleanCorpus]]), `n_clean` (after
    * fingerprint decontamination vs `reference`).
    *
    * 100 TB shape: ONE pass computes all flags — a window over the text
    * key ranks passers (same exchange [[Dedup.exact]] needs anyway), the
    * reference fingerprints broadcast, and everything collapses into a
    * single global aggregate. No per-stage re-scan, no driver-side
    * counting loop. */
  def auditFunnel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      minQuality: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.qualityExpr(col(textCol)) >= minQuality
    // passers rank first within each exact-text group, so rk==1 && __q is
    // exactly "lowest-id passer of its group" — Dedup.exact over passers
    val rk = row_number().over(
      Window.partitionBy(col(textCol)).orderBy(q.desc, col(idCol))
    )
    val refFp = broadcast(
      reference.select(TextAnalysis.fingerprint(col(textCol)).as("__fp")).distinct()
        .withColumn("__contam", lit(true))
    )
    docs
      .select(col(idCol), col(textCol), q.as("__q"), rk.as("__rk"))
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(refFp, Seq("__fp"), "left")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("__q") && col("__rk") === 1, 1L).otherwise(0L)).as("n_after_dedup"),
        sum(
          when(col("__q") && col("__rk") === 1 && col("__contam").isNull, 1L).otherwise(0L)
        ).as("n_clean")
      )
  }

  /** Streaming corpus ingest — the curation stages that run FOREVER on an
    * unbounded source: quality gate (stateless) → EXACT dedup on the
    * content fingerprint with state bounded by the watermark (duplicates
    * arriving within `delay` of each other are dropped; older state is
    * evicted — `dropDuplicatesWithinWatermark`, the streaming face of
    * `Dedup.exact`) → deterministic split assignment (stateless). The
    * near-dup/mixture stages are corpus-global by nature and stay in the
    * batch [[curate]]; this is the standard split: dedup-at-ingest
    * streaming, similarity dedup in the periodic batch compaction.
    *
    * Survivor contract: FIRST arrival per fingerprint wins (streaming has
    * no "lowest id later" to wait for). On a BATCH frame the same call
    * degenerates to dropDuplicates on the fingerprint, so one definition
    * serves both paths and the parity spec can compare them.
    *
    * 100 TB shape: per-micro-batch expressions plus one keyed state store
    * whose size is bounded by (fingerprints seen within `delay`), not by
    * corpus history. */
  def curateStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      delay: String,
      quality: org.apache.spark.sql.Column,
      splits: Seq[(String, Double)]
  ): DataFrame = {
    require(!docs.columns.contains("__fp"), "curateStream: input already has a __fp column")
    val keyed = docs.filter(quality).withColumn("__fp", md5(col(textCol)))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(eventTimeCol, delay).dropDuplicatesWithinWatermark("__fp")
      else keyed.dropDuplicates("__fp")
    Scale.hashSplit(deduped.drop("__fp"), Seq(idCol), splits)
  }

  /** One micro-batch of [[curateIncremental]]: the surviving rows (with
    * their split tag) plus the two INDEX DELTAS the caller must append
    * before the next batch — returning them here is what makes the
    * append-survivors loop explicit instead of folklore. */
  final case class IncrementalCuration(
      survivors: DataFrame,
      minhashDelta: DataFrame,
      semDelta: DataFrame
  )

  /** The composed CONTINUOUS curation recipe — every piece existed
    * ([[curateStream]]'s ingest gate, the stream-static domain
    * enforcement, both persisted-index incremental dedups); this is the
    * single entry point a foreachBatch caller wires up:
    *
    *  1. quality gate (stateless per-row predicate);
    *  2. domain enforcement against the nightly `badDomains` SNAPSHOT
    *     ([[TextAnalysis.domainFilterAgainst]] — a stream-static
    *     anti-join);
    *  3. near-dup vs the persisted minhash signature index + within the
    *     batch ([[Dedup.incrementalNearDup]] — history is ONLY its
    *     index, never rescanned);
    *  4. semantic dedup vs the persisted cell index + within the batch
    *     ([[Similarity.incrementalSemDedup]] under the index's FROZEN
    *     `centroids` — rows with NULL/zero-norm vectors take no cell and
    *     pass this stage);
    *  5. deterministic split assignment ([[Scale.hashSplit]]).
    *
    * THE LOOP CONTRACT: after each batch, append `minhashDelta` to the
    * signature index and `semDelta` to the cell index (both deltas are
    * derived from the SURVIVORS — deterministic, so re-deriving equals
    * filtering), then feed the grown indexes to the next call.
    * StreamingSpec pins micro-batched == sequential batch replay on
    * planted dups straddling batch boundaries for BOTH indexes.
    *
    * Stage ORDER is the semantic contract (mirrors [[curate]]): quality
    * and domain gates run first so junk never pays dedup; near-dup
    * before semantic so the cheaper signature join absorbs exact/near
    * copies and only textual survivors pay vector scoring. 100 TB shape:
    * each stage is the library call's own documented shape — no new
    * shuffles, and the per-batch caches inside the incremental stages
    * are released before this returns (leak-regression pinned). */
  def curateIncremental(
      batch: DataFrame,
      minhashIndex: DataFrame,
      semIndex: DataFrame,
      centroids: DataFrame,
      badDomains: DataFrame,
      idCol: String,
      textCol: String,
      urlCol: String,
      vecCol: String,
      quality: org.apache.spark.sql.Column,
      splits: Seq[(String, Double)],
      bands: Int = 4,
      rowsPerBand: Int = 2,
      minEstJaccard: Double = 0.5,
      semThreshold: Double = 0.95
  ): IncrementalCuration = {
    val gated = TextAnalysis.domainFilterAgainst(batch.filter(quality), urlCol, badDomains)
    val textSurvivors = Dedup.incrementalNearDup(
      gated, minhashIndex, idCol, textCol, bands, rowsPerBand, minEstJaccard)
    val survivors = Similarity.incrementalSemDedup(
      textSurvivors, semIndex, centroids, idCol, vecCol, semThreshold)
    IncrementalCuration(
      survivors = Scale.hashSplit(survivors, Seq(idCol), splits),
      minhashDelta =
        Dedup.minhashSignatures(survivors, idCol, textCol, bands * rowsPerBand),
      semDelta = Similarity.semIndex(survivors, idCol, vecCol, centroids)
    )
  }

  /** The STREAMING face of the CCNet perplexity filter: keep rows whose
    * cross-entropy under the persisted reference LM is at most
    * `maxCeBits`. [[TextAnalysis.perplexityBuckets]]' terciles are
    * corpus-global — a micro-batch cannot see the corpus — so continuous
    * ingestion applies a FIXED threshold calibrated offline (CCNet as
    * deployed: cutoffs computed once on the reference corpus, applied as
    * constants thereafter; re-derive them periodically from the batch
    * tercile query when the corpus drifts). The scorers are pure
    * functions of the STATIC model artifact, so this gate is stateless
    * per batch and streamed == batch parity is exact (the spec pins the
    * full lmGate → [[curateIncremental]] composition on planted dups and
    * tail-perplexity docs straddling micro-batches).
    *
    * `smoothing` follows [[TextAnalysis.perplexityBuckets]]: `"kn"` (the
    * quality standard, default here because the threshold is calibrated
    * on KN terciles) or `"addone"`. Keyed mode (`keyCols` — per-language
    * thresholds make cross-language ce comparable) drops rows whose key
    * has no model, the scorer's documented contract.
    *
    * 100 TB shape: the scorer's own (token explode + model-keyed joins +
    * per-doc sum) plus one id semi-join back to the batch — nothing new. */
  /** The publishable per-source corpus DATASHEET (VERDICT r17 Next #6) —
    * the report card a lab ships beside a released training corpus
    * (Gebru et al. 2021 "Datasheets for Datasets", aggregated to source
    * granularity): docs, tokens, language mix (count + dominant
    * language), quality-gate share ([[TextAnalysis.qualityExpr]] ≥
    * `minQuality`), contamination exposure (docs sharing any `contamN`-
    * gram with an eval suite — [[Dedup.contaminationReport]]'s machinery)
    * and the n-gram novelty micro-average ([[Dedup.ngramNovelty]]'s
    * integer sums — exact, aggregation-order independent), one row per
    * source.
    *
    * ONE corpus read (the audit surfaces exist piecemeal as x126 / x163 /
    * x155 / x157 / x92 — this composes them WITHOUT per-metric re-scans):
    * the column-pruned per-doc frame is materialized once (the
    * x122/x162 materializeInput pattern) and all three derived streams —
    * the per-doc metric projection, novelty's shingle-df aggregate+join,
    * the contamination gram join — read STORED rows; the source is
    * scanned exactly once per call. At deployment scale pass an already-
    * stored projection and the checkpoint is the only extra copy
    * (linear, column-pruned).
    *
    * Scale shapes are the fragments' own: novelty is one shingle-df
    * aggregate + join back (linear in shingle occurrences); contamination
    * broadcasts the suites' gram hashes and its shuffle is bounded by HIT
    * volume; everything else is a two-level (source, lang) → source
    * re-aggregation. The dominant language is `max(struct(docs, lang))`
    * — deterministic ties (largest count, then lexicographically last
    * lang), the min-struct-winner convention. */
  def corpusDatasheet(
      docs: DataFrame,
      evalSuites: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      suiteCol: String,
      minQuality: Double = 0.6,
      noveltyN: Int = 3,
      contamN: Int = 13
  ): DataFrame = {
    // NOTE (r19 measured dead end, like r18's widenMaterialized): widening
    // a narrow scan input before this checkpoint (the Tables.tw condition,
    // scan-shape-guarded because `.rdd` under AQE executes a shuffling
    // plan's intermediate stages — measured +3.7 s on x167's scrubbed
    // card) parallelized the three consumer stages per the profiler but
    // left WALL TIME flat at every tested point: the novelty/contamination/
    // per-doc streams already run as concurrent jobs, which overlaps the
    // narrow stages across cores, and at real scale the input splits on
    // its own. Reverted; one narrow checkpoint read by concurrent jobs is
    // the measured optimum here.
    val base = docs
      .select(col(idCol), col(sourceCol), col(langCol), col(textCol))
      .stageCheckpoint()
    val nov = Dedup
      .ngramNovelty(base, idCol, textCol, noveltyN)
      .select(col(idCol), col("n_shingles"), col("novel_shingles"))
    val contam = Dedup
      .contaminationReport(base, evalSuites, idCol, textCol, suiteCol, contamN)
      .select(col(idCol))
      .distinct()
      .withColumn("__contam", lit(true))
    val perDoc = base
      .select(
        col(idCol),
        col(sourceCol),
        col(langCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__nt"),
        (TextAnalysis.qualityExpr(col(textCol)) >= minQuality).as("__q")
      )
      .join(nov, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
    val perLang = perDoc
      .groupBy(col(sourceCol), col(langCol))
      .agg(
        count(lit(1)).as("__docs"),
        sum("__nt").as("__toks"),
        sum(when(col("__q"), 1L).otherwise(0L)).as("__nq"),
        sum(when(col("__contam"), 1L).otherwise(0L)).as("__nc"),
        sum(coalesce(col("n_shingles"), lit(0L))).as("__sh"),
        sum(coalesce(col("novel_shingles"), lit(0L))).as("__nvl")
      )
    perLang
      .groupBy(col(sourceCol))
      .agg(
        sum("__docs").as("n_docs"),
        sum("__toks").as("n_tokens"),
        count(lit(1)).as("n_langs"),
        max(struct(col("__docs").as("d"), col(langCol).as("l")))
          .getField("l").as("top_lang"),
        sum("__nq").as("n_quality"),
        round(sum("__nq").cast("double") / sum("__docs").cast("double"), 6)
          .as("quality_share"),
        sum("__nc").as("n_contaminated"),
        when(
          sum("__sh") > 0L,
          round(sum("__nvl").cast("double") / sum("__sh").cast("double"), 6)
        ).as("novelty_micro")
      )
  }

  /** State + current card of the STREAMING datasheet (see
    * [[corpusDatasheetIncremental]]): callers persist/localCheckpoint the
    * two index frames between batches, the card is the report over
    * everything ingested so far. */
  final case class IncrementalDatasheet(
      card: DataFrame,
      dfIndex: DataFrame,
      statsIndex: DataFrame
  )

  /** The STREAMING face of [[corpusDatasheet]] — a per-source report card
    * over EVERYTHING ingested so far, maintained incrementally. Every
    * column except novelty is additive per (source, lang) and folds into
    * `statsIndex`; novelty is the one metric that is NOT stateless per
    * batch (a shingle novel today stops being novel when a later doc
    * reuses it — the df is corpus-global and RETROACTIVE), so the state
    * carries a shingle document-frequency index `dfIndex(s, df, owner)`
    * where `owner` is the source of the single containing doc while
    * `df == 1` (and NULL once a second doc shares the shingle — the
    * shingle can never become novel again, so the owner is never needed
    * back). Per-source novel counts then read straight off the index:
    * `df == 1` rows grouped by owner. Summing stats and merging df over
    * ANY batch decomposition yields byte-identical cards to the one-shot
    * [[corpusDatasheet]] over the union — the StreamingSpec parity, with
    * novelty-flipping shingles straddling micro-batches.
    *
    * The index keys on the shingle STRING — [[Dedup.ngramNovelty]]'s own
    * representation, so parity with the batch card is exact (a 60-bit
    * hash key would admit cross-shingle collisions; at deployment scale
    * swap in the hash and accept the ~2^-60 per-pair error, documented
    * trade).
    *
    * 100 TB shape: the batch pays its own datasheet shapes (one read,
    * checkpointed); the df merge is one shingle-keyed aggregate over
    * (index ∪ batch-df) — the same additive-merge class as
    * [[TextAnalysis.mergeBigramLm]]'s count tables; stats merge is
    * (source, lang)-sized. The card derives from the two indexes alone —
    * no re-scan of ingested batches, ever. */
  def corpusDatasheetIncremental(
      batch: DataFrame,
      dfIndex: DataFrame,
      statsIndex: DataFrame,
      evalSuites: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      suiteCol: String,
      minQuality: Double = 0.6,
      noveltyN: Int = 3,
      contamN: Int = 13
  ): IncrementalDatasheet = {
    val dfMissing = Seq("s", "df", "owner").filterNot(dfIndex.columns.contains)
    require(
      dfMissing.isEmpty,
      s"corpusDatasheetIncremental: dfIndex lacks ${dfMissing.mkString(", ")} — " +
        "(s string, df long, owner string), empty on the first batch")
    val stMissing =
      Seq(sourceCol, langCol, "docs", "toks", "nq", "nc", "nsh").filterNot(statsIndex.columns.contains)
    require(
      stMissing.isEmpty,
      s"corpusDatasheetIncremental: statsIndex lacks ${stMissing.mkString(", ")}")
    val base = batch
      .select(col(idCol), col(sourceCol), col(langCol), col(textCol))
      .stageCheckpoint()
    // batch shingle df + single-doc owner (source of the one containing doc)
    val sh = Dedup
      .shingleRows(base, idCol, textCol, noveltyN)
      .join(base.select(col(idCol), col(sourceCol)), Seq(idCol))
    val batchDf = sh
      .groupBy(col("s"))
      .agg(
        count(lit(1)).as("df"),
        when(count(lit(1)) === 1L, max(col(sourceCol))).otherwise(lit(null)).as("owner"))
    // merge: dfs add; a merged df of 1 has exactly one non-null owner side
    val mergedDf = dfIndex
      .unionByName(batchDf)
      .groupBy(col("s"))
      .agg(
        sum("df").as("df"),
        when(sum("df") === 1L, max("owner")).otherwise(lit(null)).as("owner"))
    val contam = Dedup
      .contaminationReport(base, evalSuites, idCol, textCol, suiteCol, contamN)
      .select(col(idCol))
      .distinct()
      .withColumn("__contam", lit(true))
    val perDoc = base
      .select(
        col(idCol),
        col(sourceCol),
        col(langCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__nt"),
        (TextAnalysis.qualityExpr(col(textCol)) >= minQuality).as("__q"))
      .join(sh.groupBy(col(idCol)).agg(count(lit(1)).as("__nsh")), Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
    val statsDelta = perDoc
      .groupBy(col(sourceCol), col(langCol))
      .agg(
        count(lit(1)).as("docs"),
        sum("__nt").as("toks"),
        sum(when(col("__q"), 1L).otherwise(0L)).as("nq"),
        sum(when(col("__contam"), 1L).otherwise(0L)).as("nc"),
        sum(coalesce(col("__nsh"), lit(0L))).as("nsh"))
    val mergedStats = statsIndex
      .unionByName(statsDelta)
      .groupBy(col(sourceCol), col(langCol))
      .agg(
        sum("docs").as("docs"), sum("toks").as("toks"), sum("nq").as("nq"),
        sum("nc").as("nc"), sum("nsh").as("nsh"))
    // the card, from the two indexes alone — the batch card's exact columns
    val novel = mergedDf
      .filter(col("df") === 1L)
      .groupBy(col("owner").as(sourceCol))
      .agg(count(lit(1)).as("__novel"))
    val card = mergedStats
      .groupBy(col(sourceCol))
      .agg(
        sum("docs").as("n_docs"),
        sum("toks").as("n_tokens"),
        count(lit(1)).as("n_langs"),
        max(struct(col("docs").as("d"), col(langCol).as("l")))
          .getField("l").as("top_lang"),
        sum("nq").as("n_quality"),
        round(sum("nq").cast("double") / sum("docs").cast("double"), 6).as("quality_share"),
        sum("nc").as("n_contaminated"),
        sum("nsh").as("__sh"))
      .join(novel, Seq(sourceCol), "left")
      .withColumn(
        "novelty_micro",
        when(
          col("__sh") > 0L,
          round(coalesce(col("__novel"), lit(0L)).cast("double") / col("__sh").cast("double"), 6)))
      .drop("__sh", "__novel")
    IncrementalDatasheet(card, mergedDf, mergedStats)
  }

  def lmGate(
      batch: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      maxCeBits: Double,
      keyCols: Seq[String] = Nil,
      smoothing: String = "kn"
  ): DataFrame = {
    val scored = smoothing match {
      case "kn" =>
        TextAnalysis.scoreKneserNey(batch, model, idCol, textCol, keyCols = keyCols)
      case "addone" => TextAnalysis.perplexityScore(batch, model, idCol, textCol, keyCols)
      case other =>
        throw new IllegalArgumentException(
          s"lmGate: smoothing must be 'addone' or 'kn', got '$other'")
    }
    batch.join(
      scored.filter(col("ce_bits") <= maxCeBits).select(col(idCol)),
      Seq(idCol),
      "left_semi"
    )
  }
}
