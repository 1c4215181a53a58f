package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the last mile of
  * deduplication: near-dup PAIRS (MinHash/SimHash/SRP output) become
  * duplicate CLUSTERS, each with a canonical representative
  * (min id), so a corpus keeps exactly one document per cluster.
  *
  * Algorithm: iterative min-label propagation ("hash-to-min"): every
  * vertex starts labeled with its own id; each round every vertex
  * takes the minimum label among itself and its neighbors. Converges
  * in O(diameter) rounds — near-dup clusters are near-cliques around
  * a template (diameter 1–3), so a handful of rounds closes web-scale
  * graphs; pathological long-chain graphs are bounded by `maxIter`
  * and fail loudly rather than return a partial clustering.
  *
  * Scale posture: each round is one keyed shuffle (edges ⋈ labels →
  * min-agg) over the EDGE list — no quadratic surface, no driver-side
  * graph. Lineage is truncated every round with an eager
  * `localCheckpoint` (a production cluster job would use a reliable
  * `checkpoint` dir instead); the convergence probe is a `limit(1)`
  * existence scan over the checkpointed round output, not a full
  * count.
  */
object Clusters {

  /** (id, cluster_id) for every vertex that appears in `edges`;
    * cluster_id = min vertex id in the component. Vertices not in any
    * pair are their own (absent) singleton cluster — callers union
    * them in if needed.
    *
    * @throws IllegalStateException if `maxIter` rounds don't converge
    *         (partial labels are never returned).
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // undirected: propagate along both directions of every pair
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val nbrMin = und
          .join(labels.select(col("id").as("src"), col("comp").as("src_comp")), "src")
          .groupBy(col("dst").as("id"))
          .agg(min(col("src_comp")).as("nbr_comp"))
        // checkpoint the round ONCE, then both the convergence probe and
        // the next round's labels are cheap scans of the materialized rows
        val round = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("comp"),
            least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("new_comp"))
          .localCheckpoint(true)
        converged = round.filter(col("new_comp") < col("comp")).limit(1).isEmpty
        labels = round.select(col("id"), col("new_comp").as("comp"))
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
      labels
    } finally und.unpersist()
  }

  /** Cluster membership with sizes and the canonical flag: one row per
    * vertex in `pairs`, `is_canonical` marking the document a dedup
    * pass would keep (min id of its cluster).
    */
  def dupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
    val sizes = comp.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }
}
