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

  test("dupClusters: sizes and canonical flags") {
    val pairs = Seq((5L, 3L), (5L, 9L), (100L, 101L)).toDF("id_a", "id_b")
    val r = Clusters.dupClusters(pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(r.toSeq == Seq(
      (3L, 3L, 3L, true), (5L, 3L, 3L, false), (9L, 3L, 3L, false),
      (100L, 100L, 2L, true), (101L, 100L, 2L, false)))
  }
}
