package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq.tabulate(400) { i =>
    // 'hot' owns 85% of rows — the skew the salt exists to spread
    (i.toLong, if (i % 20 < 17) "hot" else s"cold${i % 3}", i * 1.5)
  }.toDF("row_id", "key", "v")

  private val dim = Seq(
    ("hot", 10), ("cold0", 20), ("cold1", 30), ("cold2", 40)
  ).toDF("key", "w")

  test("salted join equals the plain join exactly") {
    val plain = fact.join(dim, Seq("key"))
      .select("row_id", "key", "v", "w")
      .as[(Long, String, Double, Int)].collect().toSet
    val salted = SkewJoin.salted(fact, dim, Seq("key"), col("row_id"), buckets = 8)
      .select("row_id", "key", "v", "w")
      .as[(Long, String, Double, Int)].collect().toSet
    assert(salted == plain)
    // no duplicates: each fact row meets its dim row at exactly one salt
    assert(SkewJoin.salted(fact, dim, Seq("key"), col("row_id"), 8).count()
      == plain.size)
  }

  test("buckets=1 degenerates to the plain join; salt column never leaks") {
    val r = SkewJoin.salted(fact, dim, Seq("key"), col("row_id"), buckets = 1)
    assert(r.count() == fact.join(dim, Seq("key")).count())
    assert(!r.columns.contains("__salt"))
  }

  test("hinted sort-merge plan joins on the salt sub-key") {
    val q = SkewJoin.salted(fact, dim.hint("merge"), Seq("key"), col("row_id"), 8)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    assert(plan.contains("__salt"), plan.take(800))
  }

  test("inputs already carrying __salt are refused, not clobbered") {
    val tainted = fact.withColumn("__salt", lit(7))
    val e = intercept[IllegalArgumentException] {
      SkewJoin.salted(tainted, dim, Seq("key"), col("row_id"), 8)
    }
    assert(e.getMessage.contains("__salt"))
    intercept[IllegalArgumentException] {
      SkewJoin.salted(fact, dim.withColumn("__salt", lit(0)), Seq("key"), col("row_id"), 8)
    }
  }

  test("fact rows of one hot key spread across every salt bucket") {
    val salts = fact.filter(col("key") === "hot")
      .withColumn("__salt", pmod(col("row_id"), lit(8)).cast("int"))
      .select("__salt").distinct().as[Int].collect().toSet
    assert(salts == (0 until 8).toSet)
  }

  test("decide measures suggested salts: hot fixture salts, uniform stays plain") {
    // hot: 340/400 rows on one of 4 keys → suggested = ceil(340*4/400) = 4
    // ... with threshold 3 that salts; with the default 4 it does not —
    // pin both sides of the threshold
    assert(SkewJoin.decide(fact, Seq("key"), threshold = 3, maxBuckets = 32) == 4)
    assert(SkewJoin.decide(fact, Seq("key"), threshold = 4, maxBuckets = 32) == 0)
    // cap applies
    assert(SkewJoin.decide(fact, Seq("key"), threshold = 3, maxBuckets = 2) == 2)
    // uniform keys → ceil(max*n/total) = 1 → plain at any threshold
    val uni = Seq.tabulate(400)(i => (i.toLong, s"k${i % 4}", 1.0))
      .toDF("row_id", "key", "v")
    assert(SkewJoin.decide(uni, Seq("key"), threshold = 1, maxBuckets = 32) == 0)
    // empty fact → plain, not a crash
    assert(SkewJoin.decide(fact.limit(0), Seq("key")) == 0)
  }

  test("auto equals the plain join on both sides of the decision") {
    val plain = fact.join(dim, Seq("key"))
      .select("row_id", "key", "v", "w")
      .as[(Long, String, Double, Int)].collect().toSet
    // skewed: auto dispatches to salted (threshold 3 → 4 buckets)
    val hot = SkewJoin.auto(fact, dim, Seq("key"), col("row_id"),
      threshold = 3, maxBuckets = 32)
    assert(hot.select("row_id", "key", "v", "w")
      .as[(Long, String, Double, Int)].collect().toSet == plain)
    assert(hot.queryExecution.executedPlan.toString.contains("__salt"),
      "hot leg must take the salted path")
    // near-uniform: auto dispatches to the plain join, no salt anywhere
    val cold = SkewJoin.auto(fact, dim, Seq("key"), col("row_id"),
      threshold = 8, maxBuckets = 32)
    assert(cold.select("row_id", "key", "v", "w")
      .as[(Long, String, Double, Int)].collect().toSet == plain)
    assert(!cold.queryExecution.executedPlan.toString.contains("__salt"),
      "uniform leg must take the plain path")
  }
}
