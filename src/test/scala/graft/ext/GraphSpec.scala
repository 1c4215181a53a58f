package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def path3 = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("pageRankScaled: hand-computed exact longs on the 3-node path") {
    // N=3, r0 = 10^9 div 3 = 333333333, base = 15·10^9 div 300 = 50000000
    // endpoint → middle: (85·333333333) div 100 = 283333333
    // middle → endpoint: (85·333333333) div 200 = 141666666
    val r = Graph.pageRankScaled(path3, "id_a", "id_b", iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((1L, 50000000L + 141666666L)))
    assert(r(3L) == ((1L, 50000000L + 141666666L)))
    assert(r(2L) == ((2L, 50000000L + 283333333L + 283333333L)))
  }

  test("centrality orders the hub above the spokes and is deterministic") {
    // star: 4 spokes around node 0 plus one detached pair
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (8L, 9L))
      .toDF("id_a", "id_b")
    val r1 = Graph.pageRankScaled(star, "id_a", "id_b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert((1L to 4L).forall(s => r1(0L) > r1(s)), r1.toString)
    assert(r1(8L) == r1(9L))
    val r2 = Graph.pageRankScaled(star.repartition(5), "id_a", "id_b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r1 == r2)
  }

  test("zero iterations returns the uniform init; empty graph returns no rows") {
    val r = Graph.pageRankScaled(path3, "id_a", "id_b", iters = 0)
      .collect().map(_.getLong(2)).toSet
    assert(r == Set(333333333L))
    val empty = path3.filter($"id_a" < 0)
    assert(Graph.pageRankScaled(empty, "id_a", "id_b", iters = 2).isEmpty)
  }

  test("labelPropagation: bridge-joined triangles split into two communities") {
    // two triangles joined by one bridge edge 3–4: recursive closure
    // (dupClusters) merges everything; LPA keeps the dense groups apart
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Graph.labelPropagation(g, "id_a", "id_b", iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 3L), (5L, 4L, 3L), (6L, 4L, 3L)))
    // an isolated pair settles on the min id (the self-vote tie-break)
    val pair = Seq((7L, 9L)).toDF("id_a", "id_b")
    val p = Graph.labelPropagation(pair, "id_a", "id_b", iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(p == Seq((7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("modularityScaled: LPA split of bridged triangles beats the closure blob") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    // LPA partition {1,2,3} | {4,5,6}: m=7, each side e_in=3, deg=7
    // → term (4·7·3 − 49)·1e6 div 196 = 178571 each, Q ≈ 0.357
    val lpa = Graph.labelPropagation(g, "id_a", "id_b", iters = 4)
    val split = Graph.modularityScaled(g, "id_a", "id_b", lpa, "id", "community")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(split == Seq((1L, 3L, 3L, 7L, 178571L), (4L, 3L, 3L, 7L, 178571L)))
    // the transitive-closure partition (everything one cluster)
    // scores exactly zero — the quantified over-merge
    val blob = g.select($"id_a".as("id"))
      .unionByName(g.select($"id_b".as("id"))).distinct()
      .withColumn("community", org.apache.spark.sql.functions.lit(1L))
    val q0 = Graph.modularityScaled(g, "id_a", "id_b", blob, "id", "community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(q0 == Seq((1L, 6L, 7L, 14L, 0L)))
  }

  test("kCore: peeling strips chains, keeps the clique, reports convergence") {
    // triangle {1,2,3} with a pendant chain 3–4–5: the 2-core is the
    // triangle alone (4 has deg 2 initially but peeling 5 exposes it)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val r = Graph.kCore(g, "id_a", "id_b", k = 2, maxRounds = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
    // a 4-path has an empty 2-core; a too-small round budget leaves
    // an unconverged remainder and says so
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(Graph.kCore(path, "id_a", "id_b", k = 2).isEmpty)
    val partial = Graph.kCore(path, "id_a", "id_b", k = 2, maxRounds = 1)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(partial == Seq((2L, 1L, false), (3L, 1L, false)))
  }

  test("triangleStats: one triangle with a tail, hand-checked coefficients") {
    // triangle {1,2,3} plus spoke 3–4; reversed/duplicate edges must
    // canonicalize away
    val g = Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 4L), (2L, 1L))
      .toDF("id_a", "id_b")
    val r = Graph.triangleStats(g, "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333), (4L, 1L, 0L, 0.0)))
  }
}
