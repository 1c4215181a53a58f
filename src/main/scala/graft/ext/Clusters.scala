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
  * min-agg) over the EDGE list — no quadratic surface, no unbounded
  * driver-side graph. Rounds materialize in PAIRS (one eager
  * `localCheckpoint` per two propagation rounds — a production
  * cluster job would use a reliable `checkpoint` dir instead), and
  * convergence is one `limit(1)` edge-agreement probe per
  * materialization, so the dominant clique-shaped inputs pay a
  * single checkpoint + probe.
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
      def propagate(l: DataFrame): DataFrame = {
        val nbrMin = und
          .join(l.select(col("id").as("src"), col("comp").as("src_comp")), "src")
          .groupBy(col("dst").as("id"))
          .agg(min(col("src_comp")).as("nbr_comp"))
        l.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      }
      // TWO propagation rounds per materialization, convergence read
      // off ONE edge-agreement probe (labels are per-component
      // constant iff every edge's endpoints agree — and the constant
      // is the min id, since labels only ever carry component-member
      // ids and the min member's label is bounded by its own id).
      // Near-dup clusters are clique-shaped (diameter 1-2), so the
      // common case pays exactly one checkpoint + one probe action —
      // the per-round checkpoint/probe pair was the dominant
      // scheduler cost of every dedup stream trigger (q139: 86 of
      // ~200 per-run jobs sat in this loop).
      var labels = und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        labels = propagate(propagate(labels)).localCheckpoint(true)
        iter += 2
        converged = und
          .join(labels.select(col("id").as("src"), col("comp").as("cs")), "src")
          .join(labels.select(col("id").as("dst"), col("comp").as("cd")), "dst")
          .filter(col("cs") =!= col("cd")).limit(1).isEmpty
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
      labels
    } finally und.unpersist()
  }

  /** Two-phase alternating-star connected components (Kiveris et al.
    * 2014, "Connected Components in MapReduce and Beyond", alg. 2):
    * alternate
    *
    *  - **large-star**: for every node u, connect every strictly
    *    LARGER neighbor to m = min(N(u) ∪ {u});
    *  - **small-star**: orient each edge toward its larger endpoint,
    *    then for every node u connect every smaller neighbor (and u)
    *    to m = min of the smaller neighborhood;
    *
    * until the edge set is a fixed point, at which point every edge
    * points directly at its component's minimum id. Converges in
    * O(log n) rounds on ANY graph shape — the lever over min-label
    * propagation's O(diameter) for long-chain graphs — while each
    * round stays one keyed shuffle over the edge list.
    *
    * Convergence probe: cheap per-round invariants (edge count + sum
    * of endpoints) confirmed by an exact `exceptAll` only when they
    * match — the expensive check runs once, at the true fixed point.
    * Labels come out identical to [[connectedComponents]] (min id per
    * component); `ClustersSpec` pins equality on chain/clique/random
    * graphs.
    */
  def connectedComponentsStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // vertex universe BEFORE star contraction drops isolated self-pairs
    val verts = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)

    def largeStar(e: DataFrame): DataFrame = {
      val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = und.groupBy("src")
        .agg(least(min(col("dst")), col("src")).as("m"))
      und.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val mins = or.groupBy("src").agg(min(col("dst")).as("m"))
      or.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    var e = smallStar(largeStar(e0)).localCheckpoint(true)
    var stats = e.agg(count(lit(1)), sum(col("src") + col("dst"))).head()
    var converged = false
    var iter = 1 // the seed round above counts
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextStats = next.agg(count(lit(1)), sum(col("src") + col("dst"))).head()
      // exact fixed-point check only when the cheap invariants agree —
      // exceptAll is a shuffle, so it should run once, not every round
      converged = nextStats == stats && next.exceptAll(e).limit(1).isEmpty
      e = next; stats = nextStats
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // defensive star-ness assertion (one scan, post-loop only): at the
    // paper's fixed point no root has an outgoing edge, so dst values
    // never reappear as src. A violation means the fixed point was not
    // a star forest — fail loudly rather than emit partial labels.
    if (!e.select(col("dst")).intersect(e.select(col("src"))).limit(1).isEmpty)
      throw new IllegalStateException(
        "connectedComponentsStar fixed point is not a star forest")
    // at the fixed point every edge is (v, componentMin); the min vertex
    // itself appears only on the dst side
    verts.join(e.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("dst"), col("id")).as("comp"))
  }

  /** Cluster membership with sizes and the canonical flag: one row per
    * vertex in `pairs`, `is_canonical` marking the document a dedup
    * pass would keep (min id of its cluster).
    *
    * Uses min-label PROPAGATION, not the star contraction, by
    * MEASUREMENT: near-dup clusters are clique-shaped (diameter 1-2),
    * where propagation converges in 2-3 rounds of ONE keyed shuffle
    * each while alternating-star pays ~4 shuffles per round plus the
    * fixed-point checks — a uniform ~2× regression across every
    * consumer when star was the default (bench r11: q88b 2.1→4.0 s,
    * q225 5.1→8.1, q201 4.8→7.9; reverted). Callers with
    * unknown-diameter graphs (long chains) should call
    * [[connectedComponentsStar]] directly — its O(log n) bound is the
    * guarantee propagation lacks, and q51 keeps it oracle-verified.
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

  /** The ids a min-id-per-cluster dedup DROPS (every cluster member
    * except its min) — the only thing a keep-first pass consumes.
    * Small pair sets (the overwhelmingly common shape: verified
    * near-dup pairs are sparse) close on the DRIVER with a union-find
    * under `driverPairCap`; above the cap the distributed
    * [[dupClusters]] closure takes over, so the fast path never
    * bounds correctness. One Spark action versus the propagation
    * loop's per-round checkpoint/probe cascade — the in-batch
    * clustering of every streaming dedup trigger was ~40 scheduler-
    * bound jobs of which the actual union-find work was microseconds.
    */
  def dupDropIds(pairs: DataFrame, srcCol: String, dstCol: String,
      driverPairCap: Int = 100000): DataFrame = {
    val spark = pairs.sparkSession
    // null-cast pairs (null input id, or a non-numeric id the cast
    // nulls out) are dropped HERE so both paths agree: the distributed
    // dupClusters fallback drops them in its joins, while Row.getLong
    // on the driver path would unbox null to 0 and silently merge such
    // pairs into a phantom vertex 0
    val head = pairs
      .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .limit(driverPairCap + 1).collect()
    if (head.length > driverPairCap)
      dupClusters(pairs, srcCol, dstCol)
        .filter(!col("is_canonical")).select(col("doc_id"))
    else {
      // union-find with min-id roots: attaching the larger root under
      // the smaller keeps every root the min of its cluster, so the
      // drop set is exactly {v | find(v) != v}
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      head.foreach { row =>
        val ra = find(row.getLong(0)); val rb = find(row.getLong(1))
        if (ra < rb) parent(rb) = ra
        else if (rb < ra) parent(ra) = rb
      }
      val verts = head.iterator
        .flatMap(r => Iterator(r.getLong(0), r.getLong(1))).toSet
      val drops = verts.iterator.filter(v => find(v) != v).toSeq.sorted
      spark.createDataset(drops)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("doc_id")
    }
  }
}
