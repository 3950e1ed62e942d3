package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Materialize.StageSyntax

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-duplicate hits into duplicate CLUSTERS (keep one doc per
  * component, not per pair: pair-wise removal over-deletes on transitive
  * chains A~B~C).
  *
  * Min-label propagation as iterative DataFrame joins: every node starts
  * labeled with itself; each round takes the min of its own and its
  * neighbors' labels; fixpoint = component minimum. Each round is one
  * shuffle-bounded join + aggregate. Rounds needed = component diameter —
  * tiny for dedup clusters (dup groups are near cliques).
  *
  * Large-diameter escape hatch: if min-label hasn't converged after
  * `starAfter` rounds, the remaining budget switches to large-star /
  * small-star alternation (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) on the QUOTIENT graph the min-label
  * rounds already contracted — O(log n) alternations even for a
  * pathological chain (e.g. boilerplate spanning thousands of docs in a
  * line), where pure min-label needs diameter rounds.
  *
  * Every round's state is locally checkpointed (`localCheckpoint(true)`):
  * each round references the previous frame in TWO subtrees, so carrying
  * logical plans across rounds grows the plan tree 2^rounds — at 15+ rounds
  * that is itself the failure mode (analysis time, then stack overflow on
  * plan traversal). Checkpointing pins each round to O(1) plan depth; the
  * ContextCleaner frees a round's blocks when the next round drops the
  * reference. The tradeoff: an iteration cannot recompute lost executor
  * blocks mid-flight (the operator restarts instead) — the right trade for
  * an iterative algorithm whose lineage replay would be the whole iteration
  * anyway.
  */
object Graph {

  /** @return (node, label) — label is the minimum node id in the component.
    *         Only nodes present in `edges` appear (singletons are trivially
    *         their own component; union them in if needed).
    * @param maxIter TOTAL round budget (min-label rounds + star
    *        alternations); exceeding it throws rather than silently
    *        splitting clusters. The default comfortably covers any real
    *        graph: 10 min-label rounds contract by ~11x, then 20 star
    *        alternations (each ~halves the remaining diameter, plus one
    *        round to detect the fixpoint) reach diameters in the millions.
    * @param starAfter min-label rounds to run before switching to
    *        large-star/small-star alternation (the common near-clique case
    *        converges well before this; only pathological diameters pay the
    *        alternation's extra per-round join).
    * @param materialize true (default): the result is localCheckpoint'ed —
    *        no session-lifetime cache entry, freed when the caller drops
    *        the frame. false: returns a persisted frame the caller owns —
    *        `.unpersist()` ON THE RETURNED FRAME frees the cache entry (the
    *        returned plan is the persisted plan itself). Note lineage is
    *        truncated at round boundaries either way (see object doc). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30,
      materialize: Boolean = true,
      starAfter: Int = 10
  ): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the edge cache EAGERLY: the first round references sym in
    // several subtrees of one job, and a lazily-filling cache lets those
    // subtrees each recompute the (possibly expensive) upstream pair
    // pipeline before any of them has populated it
    sym.count()
    var labels = sym
      .select(col("a").as("node"))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .stageCheckpoint()
    // label every round's job so the Spark UI / listeners can attribute
    // per-round shuffle volume (iteration count vs per-round skew are the
    // two distinct scale failure modes of iterative CC — telemetry must
    // separate them; see Spike cc-telemetry)
    val sc = edges.sparkSession.sparkContext
    var converged = false
    var i = 0
    while (!converged && i < math.min(starAfter, maxIter)) {
      sc.setJobDescription(s"cc round $i minlabel")
      // one aggregation yields BOTH the new label and the old one (tagged
      // union), so the convergence check shares the round's single job
      // instead of running a second join
      val own = labels.select(col("node"), col("label"), lit(true).as("own"))
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("label"), lit(false).as("own"))
      val stepped = own
        .union(viaNeighbor)
        .groupBy("node")
        .agg(
          min("label").as("label"),
          min(when(col("own"), col("label"))).as("prev")
        )
        .stageCheckpoint()
      val changed = stepped.filter(col("label") =!= col("prev")).limit(1).count()
      labels = stepped.select("node", "label")
      converged = changed == 0
      i += 1
    }
    sc.setJobDescription(null)
    if (converged) sym.unpersist()
    else {
      if (i >= maxIter) {
        sym.unpersist()
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — the round budget was " +
            s"exhausted before the large-star/small-star fallback could run. Returning partial " +
            s"labels would silently split true clusters; raise maxIter (> starAfter=$starAfter " +
            s"leaves budget for the O(log n) star alternation)."
        )
      }
      // ---------------- large-star / small-star fallback ----------------
      // Operate on the QUOTIENT graph over current labels: min-label already
      // collapsed everything within `starAfter` hops, so vertices here are
      // label values and the edge set only keeps cross-label adjacency.
      val la = labels.select(col("node").as("a"), col("label").as("la"))
      val lb = labels.select(col("node").as("b"), col("label").as("lb"))
      var e = sym
        .join(la, "a")
        .join(lb, "b")
        .select(least(col("la"), col("lb")).as("mn"), greatest(col("la"), col("lb")).as("mx"))
        .filter(col("mn") =!= col("mx"))
        .distinct()
        .stageCheckpoint()
      var eCount = e.count()
      sym.unpersist()
      var starConverged = eCount == 0L
      while (!starConverged && i < maxIter) {
        sc.setJobDescription(s"cc round $i star")
        // large-star: every edge, seen from its smaller endpoint u, rewires
        // the larger endpoint onto min(neighborhood(u) ∪ {u}) — halves long
        // chains each pass while preserving connectivity
        val nbr = e.select(col("mn").as("u"), col("mx").as("v"))
          .union(e.select(col("mx").as("u"), col("mn").as("v")))
        val mins = nbr
          .groupBy("u")
          .agg(min(col("v")).as("mv"))
          .select(col("u"), least(col("mv"), col("u")).as("m"))
        val large = nbr
          .filter(col("v") > col("u"))
          .join(mins, "u")
          .select(col("m").as("mn"), col("v").as("mx")) // m <= u < v
          .distinct()
          .stageCheckpoint() // eager: two small-star subtrees read it below
        // small-star: every node with smaller neighbors points them (and
        // itself) at their common minimum — flattens into stars
        val toSmaller = large.select(col("mx").as("u"), col("mn").as("v")) // v < u
        val smins = toSmaller.groupBy("u").agg(min(col("v")).as("m")) // m < u
        val stepped = toSmaller
          .join(smins, "u")
          .filter(col("v") =!= col("m"))
          .select(col("m").as("mn"), col("v").as("mx")) // m < v
          .union(smins.select(col("m").as("mn"), col("u").as("mx")))
          .distinct()
          .stageCheckpoint()
        val newCount = stepped.count()
        // exact fixpoint test (not a hash): same cardinality and no edge
        // outside the previous set — one anti-join over two checkpointed sets
        starConverged = newCount == eCount &&
          stepped.join(e, Seq("mn", "mx"), "left_anti").limit(1).count() == 0L
        e = stepped
        eCount = newCount
        i += 1
      }
      sc.setJobDescription(null)
      if (!starConverged)
        throw new IllegalStateException(
          s"connectedComponents star alternation did not converge within maxIter=$maxIter " +
            s"total rounds — raise maxIter (alternations needed ~ log2(component size))."
        )
      // converged star set: every edge is (root, node); compose with the
      // min-label phase's labels (node -> label -> root)
      val starLabels = e
        .groupBy(col("mx").as("qnode"))
        .agg(min(col("mn")).as("qlabel")) // min() is a safety net: stars map each node to one root
      labels = labels
        .join(starLabels, labels("label") === starLabels("qnode"), "left")
        .select(col("node"), coalesce(col("qlabel"), col("label")).as("label"))
    }
    // Hand the result back without leaking a cache entry for the session
    // lifetime: localCheckpoint materializes the labels into executor block
    // storage OWNED BY THE RETURNED PLAN (the ContextCleaner frees it when
    // the caller drops the frame), unlike CacheManager entries, which live
    // until an explicit unpersist. No driver collect — labels can be
    // arbitrarily large. Pass materialize=false to own a persisted frame
    // instead.
    if (materialize) labels.stageCheckpoint()
    else {
      // Persist the PROJECTION the caller receives: unpersist() only drops
      // a cache entry whose plan matches the dataset it's called on, so
      // returning a select() over some persisted round frame would hand the
      // caller a frame whose unpersist is a no-op — a session-lifetime leak
      // per invocation.
      val out = labels.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    }
  }

  /** PageRank over a directed multigraph edge list, fixed iteration count
    * (the batch-analytics form: a known budget of synchronous rounds, not
    * convergence detection — iterations are the caller's contract, so two
    * engines produce bit-comparable ranks). Parallel edges each carry
    * weight: a src with `deg` out-edges sends `rank/deg` along EVERY edge
    * instance. Dangling nodes (no out-edges) redistribute their mass
    * uniformly, so total rank stays 1 every round:
    * `r'(v) = (1-d)/N + d * (Σ_in r(u)/deg(u) + danglingMass/N)`.
    *
    * 100 TB shape: the edge list joins ranks on `src` (one hash exchange,
    * co-partitioned across rounds since the key never changes) and
    * aggregates contributions on `dst` with map-side partials; the
    * dangling mass is a 1-row aggregate broadcast into the update (never a
    * driver-side loop); rank state is one row per node. Each round is
    * eagerly `localCheckpoint`ed — the update references the previous
    * round's frame in two subtrees (contributions + dangling), so carrying
    * lineage would recompute 2^iters subtrees (see object doc for the
    * checkpoint trade). N is a single distinct-count scalar.
    *
    * @return (node, rank) for every node appearing as src or dst. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      damping: Double = 0.85
  ): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"pageRank: damping must be in (0,1), got $damping")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .stageCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).stageCheckpoint()
    val ew = e.join(deg, "src").stageCheckpoint() // (src, dst, deg) — static across rounds
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .stageCheckpoint()
    val n = nodes.count().toDouble
    val degAsNode = deg.withColumnRenamed("src", "node")
    var ranks = nodes.select(col("node"), (lit(1.0) / lit(n)).as("rank")).stageCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      val dang = ranks
        .join(degAsNode, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(
          col("node"),
          ((lit(1.0) - lit(damping)) / lit(n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n))).as("rank")
        )
        .stageCheckpoint()
    }
    ranks
  }
}
