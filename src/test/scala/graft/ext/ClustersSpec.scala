package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, triangle, and isolated pair") {
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round),
    // triangle 10-11-12, isolated pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val comp = Clusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain fails loudly when maxIter too low") {
    // min label (1) needs 9 rounds to reach vertex 10
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, "a", "b", maxIter = 3)
    }
    val ok = Clusters.connectedComponents(chain, "a", "b", maxIter = 15)
      .as[(Long, Long)].collect()
    assert(ok.length == 10 && ok.forall(_._2 == 1L))
  }

  test("connectedComponentsStar ≡ propagation on chain/clique/self-loop/random") {
    // adversarial shapes for the alternating-star algorithm: a long
    // chain (propagation's worst case, O(log n) rounds for star), a
    // clique, self-loops, an isolated self-pair, and a seeded random
    // graph — labels must match min-label propagation exactly
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    val shapes = Seq(
      (1L until 40L).map(i => (i, i + 1)),            // chain, diameter 39
      (for { a <- 1L to 8L; b <- 1L to 8L if a < b } yield (a, b)), // clique
      Seq((7L, 7L), (9L, 9L), (7L, 9L)),              // self-loops
      Seq((500L, 500L)),                               // isolated self-pair
      random)
    shapes.foreach { es =>
      val edges = es.toDF("a", "b")
      val star = Clusters.connectedComponentsStar(edges, "a", "b", maxIter = 40)
        .as[(Long, Long)].collect().toMap
      val prop = Clusters.connectedComponents(edges, "a", "b", maxIter = 60)
        .as[(Long, Long)].collect().toMap
      assert(star == prop, s"mismatch on shape with ${es.size} edges")
    }
  }

  test("connectedComponentsStar: long chain converges in O(log n) rounds") {
    // diameter 63 — propagation would need >60 rounds; star needs few
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val r = Clusters.connectedComponentsStar(chain, "a", "b", maxIter = 12)
      .as[(Long, Long)].collect()
    assert(r.length == 64 && r.forall(_._2 == 1L))
  }

  test("dupClusters: sizes and canonical flags") {
    val pairs = Seq((5L, 3L), (5L, 9L), (100L, 101L)).toDF("id_a", "id_b")
    val r = Clusters.dupClusters(pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(r.toSeq == Seq(
      (3L, 3L, 3L, true), (5L, 3L, 3L, false), (9L, 3L, 3L, false),
      (100L, 100L, 2L, true), (101L, 100L, 2L, false)))
  }
  test("dupDropIds: driver union-find equals dupClusters on both sides of the cap") {
    import org.apache.spark.sql.functions.col
    // chain + clique + pair + a transitive trap (edges (2,9),(5,9):
    // 5's min reachable is 2 only THROUGH 9)
    val pairs = Seq((1L, 2L), (2L, 9L), (5L, 9L), (20L, 21L), (21L, 22L),
      (20L, 22L), (30L, 31L)).toDF("id_a", "id_b")
    val want = Clusters.dupClusters(pairs, "id_a", "id_b")
      .filter(!col("is_canonical")).select(col("doc_id"))
      .as[Long].collect().sorted.toSeq
    val fast = Clusters.dupDropIds(pairs, "id_a", "id_b")
      .as[Long].collect().sorted.toSeq
    assert(fast == want)
    assert(fast == Seq(2L, 5L, 9L, 21L, 22L, 31L))
    // cap of 2 forces the distributed fallback: identical answer
    val slow = Clusters.dupDropIds(pairs, "id_a", "id_b", driverPairCap = 2)
      .as[Long].collect().sorted.toSeq
    assert(slow == want)
    // empty pairs → empty drops on the fast path
    assert(Clusters.dupDropIds(pairs.limit(0), "id_a", "id_b").isEmpty)
  }

  test("dupDropIds: null ids dropped identically on both paths") {
    // (null,7) casts to a null pair: the driver path must not unbox it
    // to a phantom vertex 0 (Row.getLong(null) == 0) — both paths must
    // agree it contributes nothing (a non-castable id throws under ANSI
    // on both paths, so those already agree)
    val dirty = Seq(
      (Option("1"), Option("2")), (None, Option("7")),
      (Option("8"), None), (Option("30"), Option("31")))
      .toDF("id_a", "id_b")
    val fast = Clusters.dupDropIds(dirty, "id_a", "id_b")
      .as[Long].collect().sorted.toSeq
    val slow = Clusters.dupDropIds(dirty, "id_a", "id_b", driverPairCap = 1)
      .as[Long].collect().sorted.toSeq
    assert(fast == Seq(2L, 31L))
    assert(slow == fast)
  }
}
