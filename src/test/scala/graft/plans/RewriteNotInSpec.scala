package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteNotInSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteNotIn
    try body finally spark.experimental.extraOptimizations = prev
  }

  private val bigList: Seq[Int] = (0 until 40).map(_ * 3)

  test("large NOT IN literal list becomes a left-anti join with equal results") {
    // parquet-backed source — a local Seq would be constant-folded
    // away by ConvertToLocalRelation before the join could appear
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"))
    val pred = !col("l_partkey").isin(bigList.map(_.toLong): _*)
    val naive = df.filter(pred).agg(count(lit(1)), sum("l_orderkey"))
      .as[(Long, Long)].head()
    withRule {
      val rewritten = df.filter(pred)
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("Join LeftAnti"), plan)
      assert(rewritten.agg(count(lit(1)), sum("l_orderkey"))
        .as[(Long, Long)].head() == naive)
    }
  }

  test("NULL semantics are preserved: null attr rows drop, null in list blocks rewrite") {
    val df = Seq(Some(1), None, Some(99)).toDF("v")
    withRule {
      // x NOT IN (...) is NULL for x = NULL → dropped, like the naive filter
      val res = df.filter(!col("v").isin(bigList: _*))
      assert(res.as[Option[Int]].collect().toSet == Set(Some(1), Some(99)).filterNot(o => bigList.contains(o.get)))
      // a NULL literal in the list → NOT IN never true; rule must not fire
      val withNullList = df.filter(!col("v").isin(bigList.map(Integer.valueOf) :+ null: _*))
      val plan = withNullList.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join LeftAnti"), plan)
      assert(withNullList.count() == 0)
    }
  }

  test("small lists stay as literal In filters") {
    val df = Seq(1, 2, 3).toDF("v")
    withRule {
      val small = df.filter(!col("v").isin(1, 2))
      assert(!small.queryExecution.optimizedPlan.toString.contains("Join LeftAnti"))
      assert(small.as[Int].collect().toSeq == Seq(3))
    }
  }
}
