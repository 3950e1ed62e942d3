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
    *         their own component; union them in if needed). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20
  ): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym
      .select(col("a").as("node"))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("label"))
      val next = labels
        .select("node", "label")
        .union(viaNeighbor)
        .groupBy("node")
        .agg(min("label").as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next
        .as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .limit(1)
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    labels
  }
}
