package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical plan-contract gate (VERDICT r17 Next #4): the prose
  * contracts in [[graft.tools.DumpPlans]] promoted to executable shape
  * predicates over the EXECUTED (AQE-final) physical plan, so a plan
  * regression — a lost pushdown, a new cartesian, a corpus-sized global
  * sort sneaking in — fails CI instead of waiting for a judge's eyeball
  * over docs/PLANS.md.
  *
  * Only size-INDEPENDENT properties are asserted (AQE legitimately swaps
  * join strategies with input size):
  *
  *   - `CartesianProduct` is forbidden in every plan, always.
  *   - Required named operators (TakeOrderedAndProject, LocalTableScan, a
  *     codegen expression's pretty name).
  *   - A per-query budget of DANGEROUS global sorts — a Sort whose input
  *     is an `Exchange SinglePartition` (the shape of an unpartitioned
  *     window or ORDER BY funneling rows through one task). The walk is
  *     STRUCTURAL, not textual, because benign 1-row scalar aggregates
  *     also exchange SinglePartition (a handful of partial rows) and must
  *     not trip the gate; only a Sort/Window consumer makes the shape a
  *     scale hazard. Queries whose documented design includes a
  *     bounded-frame global window (x153's ≤nBuckets aggregate, x165's
  *     boundary bucket) get an explicit budget of 1.
  *   - A budget of hash exchanges where the contract is "no shuffle". */
class PlanContractsSpec extends AnyFunSuite with SparkTester {

  /** AQE-final plan after execution. */
  private def finalPhysical(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node in the tree, EXPANDING AQE stage leaves: QueryStageExec
    * (shuffle, broadcast, and Spark 4's ResultQueryStage) are LEAF nodes
    * whose subtree hangs off `.plan`, so a naive `plan.collect` sees none
    * of the executed operators — the meta-test below pins that this
    * traversal actually reaches them. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => p +: allNodes(q.plan)
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** Sorts fed by a SinglePartition exchange — every global window /
    * unpartitioned ORDER BY materializes as exactly this pair. Wrappers
    * (query stages, AQE reads, reused exchanges, nested sorts) are
    * unwrapped. */
  private def dangerousGlobalSorts(plan: SparkPlan): Int = {
    def unwrap(n: SparkPlan): SparkPlan = n match {
      case s: SortExec => unwrap(s.child)
      case q: ShuffleQueryStageExec => unwrap(q.plan)
      case a: AQEShuffleReadExec => unwrap(a.child)
      case r: ReusedExchangeExec => unwrap(r.child)
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
      case other => other
    }
    def isSP(n: SparkPlan): Boolean = unwrap(n) match {
      case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
      case _ => false
    }
    allNodes(plan).count { case s: SortExec => isSP(s.child); case _ => false }
  }

  private def hashExchanges(plan: SparkPlan): Int =
    allNodes(plan).count {
      case e: ShuffleExchangeExec =>
        e.outputPartitioning != SinglePartition &&
          e.outputPartitioning.getClass.getSimpleName.startsWith("HashPartitioning")
      case _ => false
    }

  /** Violation -> IllegalStateException (so the meta-test below can prove
    * the checker actually fires). */
  private def checkContract(
      name: String,
      plan: SparkPlan,
      required: Seq[String] = Nil,
      forbidden: Seq[String] = Nil,
      maxGlobalSorts: Int = 0,
      maxHashExchanges: Int = Int.MaxValue
  ): Unit = {
    val txt = plan.toString
    def fail(msg: String) =
      throw new IllegalStateException(s"plan contract [$name] violated: $msg\n$txt")
    // global: a cartesian product is never acceptable in this corpus
    if (txt.contains("CartesianProduct")) fail("CartesianProduct in plan")
    required.foreach(r => if (!txt.contains(r)) fail(s"required operator '$r' missing"))
    forbidden.foreach(f => if (txt.contains(f)) fail(s"forbidden operator '$f' present"))
    val gs = dangerousGlobalSorts(plan)
    if (gs > maxGlobalSorts)
      fail(s"$gs Sort-over-SinglePartition exchanges (allowed $maxGlobalSorts)")
    val he = hashExchanges(plan)
    if (he > maxHashExchanges)
      fail(s"$he hash exchanges (allowed $maxHashExchanges)")
  }

  private def planOf(name: String): SparkPlan =
    finalPhysical(SparkEntry.queries(name)(spark, sfTiny))

  test("checker meta-test: deliberately broken contracts fail") {
    // a real cartesian: force it by disabling broadcast thresholds
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val cart =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        finalPhysical(
          spark.range(3).crossJoin(spark.range(3).toDF("id2")))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert(cart.toString.contains("CartesianProduct"), cart.toString)
    intercept[IllegalStateException] { checkContract("meta-cart", cart) }
    // a real global sort over a SinglePartition exchange (unpartitioned window)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gw = finalPhysical(
      spark.range(100).toDF("id")
        .withColumn("rn", row_number().over(Window.orderBy("id"))))
    assert(dangerousGlobalSorts(gw) == 1, gw.toString)
    intercept[IllegalStateException] { checkContract("meta-sort", gw) }
    checkContract("meta-sort-allowed", gw, maxGlobalSorts = 1)
    // a benign 1-row scalar aggregate must NOT count as dangerous
    val agg = finalPhysical(spark.range(100).agg(sum("id")))
    assert(dangerousGlobalSorts(agg) == 0, agg.toString)
    checkContract("meta-agg", agg)
    // and a missing required operator fires
    intercept[IllegalStateException] {
      checkContract("meta-req", agg, required = Seq("TakeOrderedAndProject"))
    }
  }

  test("q02_filter: predicates reach the parquet scan") {
    val p = planOf("q02_filter")
    checkContract("q02", p)
    val txt = p.toString
    assert(txt.contains("PushedFilters: [") && !txt.contains("PushedFilters: []"), txt)
  }

  test("q07_join3: dimension joins broadcast, no cartesian") {
    checkContract("q07", planOf("q07_join3"), required = Seq("BroadcastHashJoin"))
  }

  test("q09_tpch1: one partial->final aggregate exchange") {
    checkContract("q09", planOf("q09_tpch1"),
      required = Seq("HashAggregate"), maxHashExchanges = 1)
  }

  test("q18_topk: TakeOrderedAndProject caps the sort") {
    checkContract("q18", planOf("q18_topk"), required = Seq("TakeOrderedAndProject"))
  }

  test("q39_zarr_agg_pushdown: pushed aggregate = LocalTableScan, zero data operators") {
    checkContract("q39", planOf("q39_zarr_agg_pushdown"),
      required = Seq("LocalTableScan"), forbidden = Seq("BatchScan"),
      maxHashExchanges = 0)
  }

  test("x51_repetition: per-row fold, corpus never shuffles") {
    checkContract("x51", planOf("x51_repetition"), maxHashExchanges = 0)
  }

  test("x57_decontam_bloom: might_contain prunes before any join") {
    checkContract("x57", planOf("x57_decontam_bloom"), required = Seq("might_contain"))
  }

  test("x88_quality_score: literal-weights fold, no exchange but the verification sort") {
    checkContract("x88", planOf("x88_quality_score"), maxHashExchanges = 0)
  }

  test("x90_bpe_budget: codegen bpe_count over the scan, no shuffle") {
    checkContract("x90", planOf("x90_bpe_budget"),
      required = Seq("bpecount"), maxHashExchanges = 0)
  }

  test("x91_decon_ngram: reference grams broadcast, corpus dies map-side") {
    checkContract("x91", planOf("x91_decon_ngram"), required = Seq("BroadcastHashJoin"))
  }

  test("x93_chunk_docs: Generate fan-out in codegen, no shuffle") {
    checkContract("x93", planOf("x93_chunk_docs"),
      required = Seq("Generate"), maxHashExchanges = 0)
  }

  test("x102_dsir_select: literal-lambda fold + TakeOrderedAndProject, no shuffle") {
    checkContract("x102", planOf("x102_dsir_select"),
      required = Seq("TakeOrderedAndProject"), maxHashExchanges = 0)
  }

  test("x106_keyword_tag: automaton rides the plan, no term-table join") {
    checkContract("x106", planOf("x106_keyword_tag"),
      required = Seq("keywordmatches", "Generate"), maxHashExchanges = 0)
  }

  test("x129_mrl_rerank: prefix scoring over a broadcast nested-loop") {
    checkContract("x129", planOf("x129_mrl_rerank"),
      required = Seq("BroadcastNestedLoopJoin"))
  }

  test("x150_excess_ppl: top-k cut is a heap, never a global sort") {
    checkContract("x150", planOf("x150_excess_ppl"),
      required = Seq("TakeOrderedAndProject"))
  }

  test("x152_curriculum: no global sort anywhere — the closed form earns its keep") {
    checkContract("x152", planOf("x152_curriculum"))
  }

  test("x153_vocab_growth: the only global window runs on the nBuckets-row aggregate") {
    checkContract("x153", planOf("x153_vocab_growth"), maxGlobalSorts = 1)
  }

  test("x03_minhash_lsh: signatures via the typed aggregate, never a cross join") {
    checkContract("x03", planOf("x03_minhash_lsh"), required = Seq("minhash_sig"))
  }

  test("x34_ivf_topk: packed-long max aggregate, no window over the corpus") {
    checkContract("x34", planOf("x34_ivf_topk"), forbidden = Seq("Window"))
  }

  test("x36_range_join: bucket-exploded equi-join, never a nested loop over the cross product") {
    checkContract("x36", planOf("x36_range_join"),
      forbidden = Seq("BroadcastNestedLoopJoin"))
  }

  test("x44_topk_per_key: bounded heap aggregate, no row_number window") {
    checkContract("x44", planOf("x44_topk_per_key"),
      required = Seq("top_k_structs"), forbidden = Seq("Window"))
  }

  test("x74_inverted_index: k-bounded postings heap, no row_number window") {
    checkContract("x74", planOf("x74_inverted_index"),
      required = Seq("top_k_structs"), forbidden = Seq("Window"))
  }

  test("x111_semdedup: no cartesian, no global sort — cells bound the pair volume") {
    // the centroid-assignment BNLJ broadcasts the model-bounded centroid
    // frame by design; the forbidden shape is an unbounded cross product
    checkContract("x111", planOf("x111_semdedup"))
  }

  test("x115_heavy_hitters: the confirm pass is one aggregate, no window") {
    // the mg_summary pass is a build-time job (one bounded collect); the
    // returned frame is the exact-count confirm pass
    checkContract("x115", planOf("x115_heavy_hitters"),
      required = Seq("HashAggregate"), forbidden = Seq("Window"))
  }

  test("x119_domain_filter: bad domains broadcast into a left-anti hash join") {
    checkContract("x119", planOf("x119_domain_filter"),
      required = Seq("BroadcastHashJoin"))
  }

  test("x135_perplexity: codegen fixed_log2 scoring, no window, no global sort") {
    checkContract("x135", planOf("x135_perplexity"),
      required = Seq("fixedpointlog2"), forbidden = Seq("Window"))
  }

  test("x141_kneser_ney: the 128-bit decimal log rides codegen, no window") {
    checkContract("x141", planOf("x141_kneser_ney"),
      required = Seq("fixedpointlog2"), forbidden = Seq("Window"))
  }

  test("x166_datasheet: one corpus read — the final plan scans the checkpoint, not parquet") {
    val p = planOf("x166_datasheet")
    checkContract("x166", p)
    // the per-doc frame is materialized once; every metric stream reads
    // stored rows, so the documents parquet appears in NO final operator
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x167_datasheet_diff: both cards read their checkpoints — no parquet in the final plan") {
    val p = planOf("x167_datasheet_diff")
    checkContract("x167", p)
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x168_source_overlap: no cartesian, no window, no global sort after signatures") {
    checkContract("x168", planOf("x168_source_overlap"), forbidden = Seq("Window"))
  }

  test("x165_epoch_budget: only the boundary-bucket prefix pays a global window") {
    // the boundary prefix sort runs inside the operator's checkpoint job
    // (bounded to one hash bucket's rows); the FINAL plan — the one that
    // scales with assignments — must have no global sort at all
    checkContract("x165", planOf("x165_epoch_budget"))
  }

  test("x169_epoch_pack: stream offsets are closed-form — no global sort, no parquet rescan") {
    // packEpochs' token prefix must come from the (epoch, tier, bucket)
    // aggregate + within-bucket windows (hash-partitioned), NEVER a
    // window partitioned only by epoch (that funnels the corpus through
    // one task per epoch); the final plan reads the operator's checkpoint
    val p = planOf("x169_epoch_pack")
    checkContract("x169", p)
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x170_unimax: waterfill resolves driver-side — local relation, no scan, no exchange") {
    // the ONE corpus pass happens inside unimaxMix's bounded collect;
    // the returned per-source table is a LocalRelation, so the final
    // plan must touch neither parquet nor an exchange of any kind
    val p = planOf("x170_unimax")
    checkContract("x170", p, required = Seq("LocalTableScan"), maxHashExchanges = 0)
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x171_unimax_select: plan tables broadcast, boundary window partitioned by source") {
    // full epochs = broadcast join + sequence explode; the partial cut's
    // only window is partitioned BY SOURCE over one bucket's rows — a
    // SinglePartition sort anywhere means the per-source walk regressed
    // to a global one; the corpus feeds from the operator's checkpoint
    val p = planOf("x171_unimax_select")
    checkContract("x171", p, required = Seq("BroadcastHashJoin"))
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x172_anneal: both phase selections keep the x171 shape — no cartesian, no global sort") {
    // the union of two unimaxSelect schedules must not introduce any
    // SinglePartition sort (each phase's boundary window stays
    // source-partitioned) and feeds from the phases' checkpoints
    val p = planOf("x172_anneal")
    checkContract("x172", p, required = Seq("BroadcastHashJoin"))
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x173_anneal_pack: stream offsets closed-form — every window hash-partitioned, bases broadcast") {
    // packStream must never sort the stream globally: the (phase, epoch)
    // partition bases ride a broadcast LocalRelation and the running
    // sums are (phase, epoch[, bucket])-partitioned windows; the corpus
    // feeds from the schedule's checkpoints
    val p = planOf("x173_anneal_pack")
    checkContract("x173", p, required = Seq("BroadcastHashJoin"))
    assert(!p.toString.contains("Scan parquet"), p.toString)
  }

  test("x174_margin_mine: broadcast pair generation, bounded heaps, no window") {
    // both similarity matrices broadcast the bounded query side (BNLJ
    // BuildRight inside codegen); the top-4 cut rides the bounded
    // topKPerKey heap (numeric cid path), so no Window and no global
    // sort anywhere; margin scoring is equi-joins over k-bounded frames
    val p = planOf("x174_margin_mine")
    checkContract("x174", p,
      required = Seq("BroadcastNestedLoopJoin"), forbidden = Seq("Window"))
  }

  test("x175_margin_ivf: cell-join funnel — packed argmax assignment, cell-local heaps, no window") {
    // the scale path must keep ivfTopK's shapes: centroid assignment is
    // a broadcast + packed-long max HashAggregate (never a per-vector
    // window), candidates come from the cell equi-join, and the top-4
    // cut rides the cell-local bounded heap; margin scoring adds only
    // equi-joins and decimal aggregates
    val p = planOf("x175_margin_ivf")
    checkContract("x175", p,
      required = Seq("BroadcastNestedLoopJoin"), forbidden = Seq("Window"))
  }
}
