package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an undirected pair list (Page et al.
  * 1999), in the repo's bit-reproducible iterative-algorithm
  * discipline (the q119 BPE / q126 classifier pattern): every rank
  * lives in scaled-integer space (pr × 1e9, a long) and every update
  * is integer arithmetic —
  *
  *   base      = ((dampDen − dampNum) · scale) div (dampDen · N)
  *   contrib_u = (dampNum · pr_u) div (dampDen · deg_u)   per edge
  *   pr'_v     = base + Σ contrib_u                        (long sum)
  *
  * Long sums are exactly commutative/associative, integer division is
  * deterministic, so the whole run is partition-order-free and an
  * external SQL engine replays it bit-for-bit (floor-division mass
  * leak is deterministic and identical on both sides). Dangling-node
  * mass is not redistributed (the graph here is undirected, so every
  * node with an edge has out-degree ≥ 1; isolated nodes are excluded
  * by construction).
  *
  * The curation use is cluster-representative selection: within a
  * near-dup cluster, the doc most connected to its duplicates is the
  * natural canonical pick — a centrality upgrade over the min-id rule
  * ([[Clusters.dupClusters]]), composed in q133.
  *
  * Scale: per iteration, one keyed shuffle of the edge list (join on
  * src) and one keyed aggregation (group by dst) — textbook
  * distributed PR; the rank frame persists each round and releases
  * its predecessor so lineage never deepens. Driver traffic is ONE
  * node-count scalar for the whole run.
  */
object Graph {

  /** PageRank over `pairs` (each row one undirected edge). Returns
    * (id, deg, pr_scaled) for every node with ≥ 1 edge.
    */
  def pageRankScaled(
      pairs: DataFrame, srcCol: String, dstCol: String, iters: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame =
    pageRankScaledWithHandle(
      pairs, srcCol, dstCol, iters, scale, dampNum, dampDen)._1

  /** [[pageRankScaled]] plus a [[CacheHandle]] over the final rank
    * frame — each round is eagerly `localCheckpoint`ed (materialized
    * AND lineage-truncated), so downstream actions never re-run the
    * T-deep loop; the caller releases the final frame once the
    * results are consumed (the minhashNearDupPairsWithHandle
    * contract).
    */
  def pageRankScaledWithHandle(
      pairs: DataFrame, srcCol: String, dstCol: String, iters: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): (DataFrame, CacheHandle) = {
    require(iters >= 0, "iters must be >= 0")
    require(dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .repartition(col("src")) // reused by deg and every round's join
      .persist()
    try {
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val n = deg.count() // bounded driver scalar: graph-node count
      if (n == 0) {
        return (edges.select(col("src").as("id"), lit(0L).as("deg"),
          lit(0L).as("pr_scaled")), new CacheHandle(Seq.empty))
      }
      val base = (dampDen - dampNum) * scale / (dampDen * n)
      // localCheckpoint per round, not persist: persist caches the data
      // but the logical plan still deepens one join layer per round and
      // Catalyst's re-analysis of that DAG grows geometrically (the
      // labelPropagation measurement: 0.5 → 6.8 s/round on 512 edges)
      var r = deg.select(col("src").as("id"), col("deg"))
        .withColumn("pr_scaled", lit(scale / n)).localCheckpoint(true)
      var it = 0
      while (it < iters) {
        val contrib = edges
          .join(r.select(col("id"), col("deg"), col("pr_scaled")),
            col("src") === col("id"))
          .select(col("dst"),
            expr(s"($dampNum * pr_scaled) div ($dampDen * deg)").as("m"))
          .groupBy(col("dst")).agg(sum(col("m")).as("m"))
        val r2 = r.select(col("id"), col("deg"))
          .join(contrib, col("id") === col("dst"), "left")
          .select(col("id"), col("deg"),
            (lit(base) + coalesce(col("m"), lit(0L))).as("pr_scaled"))
          .localCheckpoint(true) // materialize + truncate the lineage
        r.unpersist()
        r = r2
        it += 1
      }
      (r.select(col("id"), col("deg"), col("pr_scaled")),
        new CacheHandle(Seq(r)))
    } finally { edges.unpersist(); () }
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected pair list — the dup-cluster COHESION audit: a
    * near-dup cluster whose members have coefficient ≈ 1 is
    * clique-shaped (every member duplicates every other — safe to
    * collapse to one canonical doc), while low coefficients expose
    * chains of borderline pairs that transitive closure glued into
    * one cluster (the classic min-hash over-merge). Complements
    * [[pageRankScaled]]'s representative pick with a merge-confidence
    * signal.
    *
    * Enumeration is the canonical distributed shape: canonicalize
    * edges to a < b, join oriented two-paths (a<b<c) on the middle
    * vertex, close with a left-semi join on (a, c) — every triangle
    * counted exactly once, two keyed shuffles, no driver state.
    * Everything through the counts is exact integer arithmetic; the
    * coefficient 2T/(deg·(deg−1)) is one rounded division per node.
    */
  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * undirected pair list: every node starts labeled with its own id;
    * each round it adopts the most frequent label among its neighbors
    * AND itself (the self-vote keeps isolated pairs from oscillating
    * forever), ties to the SMALLEST label — fully deterministic, so
    * the run replays as
    * unrolled SQL rounds (the q119 discipline; the usual random
    * tie-break is what makes textbook LPA irreproducible, and the min
    * rule is the repo's standard canonical pick). Communities are a
    * finer grain than connected components ([[Clusters.dupClusters]]):
    * a chain of borderline near-dup pairs that closure glues into one
    * cluster splits into locally-dense communities here — the
    * over-merge diagnostic as a PARTITION, where [[triangleStats]]
    * scores it per node and [[kCore]] excises it.
    *
    * Per round: one keyed join (edges ⋈ labels on the source — the
    * EDGE side is persisted pre-hashed on `src`, so only the small
    * label frame shuffles) and one (node, label) count whose per-node
    * argmax is a second AGGREGATION (`min(struct(−c, lbl))` —
    * lexicographic min is "largest count, then smallest label"), not
    * a window: both aggregations partial-combine map-side, where the
    * former `row_number` window forced a full repartition + sort of
    * the vote table per round. Each round's label frame is
    * `localCheckpoint`ed (the [[Clusters]] discipline): persist alone
    * caches the DATA but leaves the logical plan growing one
    * join-aggregate layer per round, and Catalyst's re-analysis of
    * that deepening DAG grows geometrically — measured on a 512-edge
    * graph, rounds cost 0.5 → 0.7 → 2.2 → 6.8 s under persist and
    * flat once checkpointed. No driver traffic. Exactly `iters`
    * rounds, no early exit — the replay contract is "the same R
    * rounds on both sides".
    *
    * Returns (id, community, community_size) for every node with an
    * edge.
    */
  def labelPropagation(
      pairs: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .repartition(col("src")) // every round's join reuses this hashing
      .persist()
    try {
      var lab = edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint(true)
      var it = 0
      while (it < iters) {
        val votes = edges.join(lab, col("src") === col("id"))
          .select(col("dst"), col("lbl"))
          .unionByName(lab.select(col("id").as("dst"), col("lbl")))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        val lab2 = votes
          .groupBy(col("dst"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
          .select(col("dst").as("id"), col("m.l").as("lbl"))
          .localCheckpoint(true) // materialize + truncate the round's lineage
        lab.unpersist()
        lab = lab2
        it += 1
      }
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("community"))
      val out = lab.select(col("id"), col("lbl").as("community"))
        .withColumn("community_size", count(lit(1)).over(w))
      val snap = out.localCheckpoint(true)
      lab.unpersist()
      snap
    } finally { edges.unpersist(); () }
  }

  /** Newman modularity of a community assignment over an undirected
    * pair list — the number that says whether a partition (LPA,
    * connected components, any clustering) actually captures the
    * graph's dense groups: Q = Σ_c [e_c/m − (d_c/2m)²], computed here
    * as the EXACT integer term (4·m·e_c − d_c²)·scale div (4·m²) per
    * community (truncating division, replayable in SQL). A partition
    * that glues bridge-connected groups together scores strictly
    * lower than one that splits them — the quantitative form of the
    * over-merge diagnostic ([[triangleStats]] scores nodes,
    * [[kCore]] excises, this grades the PARTITION).
    *
    * Shape: one canonical-edge distinct (persisted — it feeds the
    * within-community count, the degree sum, and the edge total),
    * then community-keyed joins/aggregations; the 1-row edge count
    * broadcasts. The numerator runs in DECIMAL(38,0) (the
    * tClosenessClasses discipline): 4·m²·scale stays inside 38
    * digits to ~10¹⁵ edges at scale 10⁶ — long arithmetic would wrap
    * silently past ~1.5·10⁶ edges. The quotient is a BIGINT.
    *
    * Returns (community, n_nodes, e_in, deg_sum, q_term_scaled).
    */
  def modularityScaled(
      pairs: DataFrame, srcCol: String, dstCol: String,
      membership: DataFrame, idCol: String, communityCol: String,
      scale: Long = 1000000L): DataFrame = {
    val mem = membership.select(col(idCol).as("__id"),
      col(communityCol).as("__c"))
    val e = pairs.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct().persist()
    try {
      val mRow = e.agg(count(lit(1)).as("__m"))
      val within = e
        .join(mem.select(col("__id").as("a"), col("__c").as("ca")), Seq("a"))
        .join(mem.select(col("__id").as("b"), col("__c").as("cb")), Seq("b"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community"))
        .agg(count(lit(1)).as("e_in"))
      val degSum = e.select(col("a").as("__id"))
        .unionByName(e.select(col("b").as("__id")))
        .join(mem, Seq("__id"))
        .groupBy(col("__c").as("community"))
        .agg(count(lit(1)).as("deg_sum"), countDistinct(col("__id")).as("n_nodes"))
      val out = degSum.join(within, Seq("community"), "left_outer")
        .select(col("community"), col("n_nodes"), col("deg_sum"),
          coalesce(col("e_in"), lit(0L)).as("e_in"))
        .crossJoin(broadcast(mRow))
        .withColumn("q_term_scaled",
          expr(s"(CAST(4 AS DECIMAL(38,0)) * __m * e_in" +
            s" - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum) * $scale" +
            s" div (CAST(4 AS DECIMAL(38,0)) * __m * __m)"))
        .select(col("community"), col("n_nodes"), col("e_in"),
          col("deg_sum"), col("q_term_scaled"))
      out.localCheckpoint(true)
    } finally { e.unpersist(); () }
  }

  /** k-core of an undirected pair list: the maximal subgraph in which
    * every node keeps degree ≥ k, by iterative peeling (Seidman 1983)
    * — remove all nodes of degree < k, recompute degrees, repeat. On
    * the near-dup graph the 2-core strips the pendant chains that
    * transitive closure glued onto dense duplicate groups (the
    * [[triangleStats]] over-merge signal, as a subgraph instead of a
    * per-node score), leaving only nodes held by at least two
    * independent duplicate relations.
    *
    * The operator is defined as an R-round peel (`maxRounds`): each
    * round is one keyed degree aggregation + two left-semi joins, with
    * an early exit as soon as a round removes nothing — peeling is
    * idempotent at the fixpoint, so the early-exited result equals the
    * full R-round result by construction, and an external engine
    * replays the SAME R rounds as unrolled SQL (the q119 discipline).
    * `converged` in the output records whether the fixpoint was
    * reached within R rounds (callers requiring the true k-core check
    * it). Each round persists its edge frame and releases the
    * predecessor, so lineage never deepens; driver traffic is one
    * edge-count scalar per round (the pageRank pattern).
    *
    * Returns (id, deg, converged): surviving nodes with their degree
    * inside the core.
    */
  def kCore(
      pairs: DataFrame, srcCol: String, dstCol: String, k: Long,
      maxRounds: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = pairs.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct().persist()
    var nEdges = e.count()
    var round = 0
    var stable = false
    while (round < maxRounds && !stable && nEdges > 0) {
      val keep = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("id"))
      val e2 = e
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        // checkpoint, not persist: truncate the per-round join lineage
        // (the labelPropagation geometric-planning measurement)
        .localCheckpoint(true)
      val n2 = e2.count() // bounded driver scalar per round
      stable = n2 == nEdges
      e.unpersist()
      e = e2
      nEdges = n2
      round += 1
    }
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // converged is a property of the RESULT, not of the loop ("no
    // surviving node is under-degree") — the definition an external
    // replay of the same R rounds computes identically, including the
    // edge case where the fixpoint lands exactly on round R without
    // the early-exit round observing it. Core-sized snapshot first,
    // then one bounded existence probe.
    val snap = deg.localCheckpoint(true)
    e.unpersist()
    val anyUnder = snap.filter(col("deg") < k).limit(1).count() > 0
    snap.withColumn("converged", lit(!anyUnder))
  }

  def triangleStats(
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // persist the canonical edge frame: it feeds FOUR consumers (three
    // triangle-join legs + the degree count) and its lineage is often
    // expensive (LSH pair generation) — without the persist each
    // consumer re-derives it from scratch
    val e = pairs.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct().persist()
    try {
      val tri = e.select(col("a"), col("b"))
        .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
        .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      val perNode = tri.select(col("a").as("id"))
        .unionByName(tri.select(col("b").as("id")))
        .unionByName(tri.select(col("c").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
      val deg = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val out = deg.join(perNode, Seq("id"), "left_outer")
        .select(col("id"), col("deg"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("clustering_coeff",
          when(col("deg") >= 2,
            round(lit(2.0) * col("triangles")
              / (col("deg") * (col("deg") - 1)), 6))
            .otherwise(lit(0.0)))
      // node-sized snapshot materializes while e is still cached
      out.localCheckpoint(true)
    } finally { e.unpersist(); () }
  }
}
