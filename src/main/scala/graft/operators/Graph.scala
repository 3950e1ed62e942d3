package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-duplicate hits into duplicate CLUSTERS (keep one doc per
  * component, not per pair: pair-wise removal over-deletes on transitive
  * chains A~B~C).
  *
  * Min-label propagation as iterative DataFrame joins: every node starts
  * labeled with itself; each round takes the min of its own and its
  * neighbors' labels; fixpoint = component minimum. Each round is one
  * shuffle-bounded join + aggregate, intermediate state is persisted and the
  * previous round released, so the lineage stays flat. Rounds needed =
  * component diameter — tiny for dedup clusters (dup groups are near
  * cliques); the classic large-diameter escape hatch (large-star/small-star)
  * is noted in the Scaladoc rather than implemented because dedup graphs
  * never need it.
  */
object Graph {

  /** @return (node, label) — label is the minimum node id in the component.
    *         Only nodes present in `edges` appear (singletons are trivially
    *         their own component; union them in if needed).
    * @param materialize true (default): the result is localCheckpoint'ed —
    *        no session-lifetime cache entry, freed when the caller drops
    *        the frame; the tradeoff is truncated lineage, so losing an
    *        executor holding checkpoint blocks makes the frame
    *        unrecoverable (fine single-JVM and for consume-soon callers).
    *        false: returns a persisted frame with full lineage — survives
    *        executor loss; the caller owns `.unpersist()` ON THE RETURNED
    *        FRAME (the returned plan is the persisted plan itself, so the
    *        unpersist actually frees the cache entry). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      materialize: Boolean = true
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = labels // the df actually holding this round's cache
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
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
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = stepped.filter(col("label") =!= col("prev")).limit(1).count()
      cached.unpersist()
      cached = stepped
      labels = stepped.select("node", "label")
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    if (!converged) {
      cached.unpersist() // don't leak the round cache on the failure path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — a component has " +
          s"diameter > $maxIter. Returning partial labels would silently split true " +
          s"clusters; raise maxIter (rounds needed = component diameter)."
      )
    }
    // Hand the result back without leaking the final round's cache for the
    // session lifetime: localCheckpoint materializes the labels into
    // executor block storage OWNED BY THE RETURNED PLAN (the ContextCleaner
    // frees it when the caller drops the frame), unlike CacheManager
    // entries, which live until an explicit unpersist. No driver collect —
    // labels can be arbitrarily large. See the `materialize` scaladoc for
    // the lineage tradeoff; pass false to own the cache instead.
    if (materialize) {
      val out = labels.localCheckpoint(true)
      cached.unpersist()
      out
    } else {
      // Persist the PROJECTION the caller receives, not the wider round
      // frame: unpersist() only drops a cache entry whose plan matches the
      // dataset it's called on, so returning `stepped.select(...)` over a
      // persisted `stepped` would hand the caller a frame whose unpersist
      // is a no-op — a session-lifetime leak per invocation.
      val out = labels.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      cached.unpersist()
      out
    }
  }
}
