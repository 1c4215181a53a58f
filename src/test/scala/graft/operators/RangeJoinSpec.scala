package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("points match intervals inclusively; bucket spans don't duplicate") {
    val intervals = Seq(
      // interval spanning 3 hour-buckets
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00"), "long"),
      // short interval inside one bucket
      (1L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:10:00"), "short"),
      // other key, overlapping times — must not cross-match
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00"), "other")
    ).toDF("user_id", "s_start", "s_end", "tag")
    val points = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // == start (inclusive)
      (11L, 1L, ts("2024-01-01 11:59:59")), // middle bucket of the span
      (12L, 1L, ts("2024-01-01 12:30:00")), // == end (inclusive)
      (13L, 1L, ts("2024-01-01 12:30:01")), // just past end
      (14L, 1L, ts("2024-01-01 15:05:00")), // short interval
      (15L, 3L, ts("2024-01-01 11:00:00")) // key with no intervals
    ).toDF("event_id", "user_id", "ts")
    val out = RangeJoin.pointInInterval(
      points, intervals, "user_id", "ts", "s_start", "s_end")
      .select("event_id", "tag").as[(Long, String)].collect().toSeq
    // each match appears EXACTLY once (no bucket-span duplicates)
    assert(out.sorted == Seq((10L, "long"), (11L, "long"), (12L, "long"),
      (14L, "short")))
  }

  test("plan is a hash join on (key, bucket), not a nested-loop theta join") {
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "s", "e")
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("k", "p")
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
