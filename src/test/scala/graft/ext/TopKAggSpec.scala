package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("v"))
      .as[(Int, Int, Long, Double)].collect().toSet
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topKAgg(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id"), col("e.val"))
      .as[(Int, Int, Long, Double)].collect().toSet

  test("agrees with the ranking window on pseudo-random data, any partitioning") {
    // deterministic pseudo-random values (no RNG): id-derived hash noise
    val df = (1L to 2000L).toDF("id")
      .withColumn("g", (col("id") % 7).cast("int"))
      .withColumn("v", (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000).cast("double"))
    val expected = windowTopK(df, 5)
    assert(aggTopK(df, 5) == expected)
    // partial buffers merge across many partitions to the same answer
    assert(aggTopK(df.repartition(13), 5) == expected)
  }

  test("ties rank the smaller id first; short groups return all rows") {
    val df = Seq(
      (1, 10.0, 5L), (1, 10.0, 3L), (1, 10.0, 9L), (1, 4.0, 1L),
      (2, 1.0, 42L)
    ).toDF("g", "v", "id")
    val got = aggTopK(df, 2)
    assert(got == Set((1, 1, 3L, 10.0), (1, 2, 5L, 10.0), (2, 1, 42L, 1.0)))
  }

  test("NaN orders like Spark's window (greater than everything)") {
    val df = Seq(
      (1, Double.NaN, 7L), (1, 5.0, 1L), (1, 3.0, 2L), (1, Double.NaN, 4L)
    ).toDF("g", "v", "id")
    // compare (g, rank, id) — NaN defeats tuple equality on the value
    val expected = windowTopK(df, 2).map(t => (t._1, t._2, t._3))
    val got = aggTopK(df, 2)
    assert(got.map(t => (t._1, t._2, t._3)) == expected)
    // both NaNs outrank 5.0; among NaNs the smaller id wins
    assert(got.map(t => (t._2, t._3)).toMap == Map(1 -> 4L, 2 -> 7L))
  }

  test("nulls are skipped, not ranked") {
    val df = Seq[(Int, Option[Double], Long)](
      (1, Some(5.0), 1L), (1, None, 2L), (1, Some(3.0), 3L)
    ).toDF("g", "v", "id")
    val got = aggTopK(df, 3)
    assert(got == Set((1, 1, 1L, 5.0), (1, 2, 3L, 3.0)))
  }

  test("plan: ObjectHashAggregate with map-side partial aggregation") {
    val df = (1L to 100L).toDF("id")
      .withColumn("g", (col("id") % 3).cast("int"))
      .withColumn("v", col("id").cast("double"))
    val plan = df.groupBy(col("g"))
      .agg(TopKAgg.topKAgg(col("v"), col("id"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_topkagg"), plan.take(800))
  }
}
