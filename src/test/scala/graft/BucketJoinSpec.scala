package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled tables: a join on the bucket key needs NO
  * exchange on either side. At 100 TB this is the difference between
  * re-shuffling the fact table on every join and never shuffling it —
  * the layout the Silver/Gold tables should ship with for their join
  * keys (SURVEY.md §4.1 partition-layout row, extended to joins).
  */
class BucketJoinSpec extends SparkSpec {

  test("join on the bucket key plans with zero Exchange operators") {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, dir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("orders_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"), Seq("l_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      val plan = joined.queryExecution.executedPlan.toString
      // sort-merge join straight off the bucketed scans; the only
      // exchange allowed is the final single-column aggregation
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), joinPart)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
