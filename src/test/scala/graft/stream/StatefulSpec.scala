package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def e(id: Long, t: String, user: Long, v: Double) =
    KeyedEvent(id, Timestamp.valueOf(t), user, v)

  test("rising-edge alerts fire once per surge, state survives batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = Stateful.risingEdgeAlerts(spark, input.toDS().toDF()
      .selectExpr("event_id", "ts", "user_id", "value").as[KeyedEvent], 450.0)
      .writeStream.format("memory").queryName("edge_alerts")
      .outputMode("append").start()
    try {
      // batch 1: user 1 surges (alert), user 2 stays low (none)
      input.addData(e(1, "2024-01-01 10:00:00", 1, 500.0), e(2, "2024-01-01 10:00:00", 2, 10.0))
      q.processAllAvailable()
      // batch 2: user 1 still above (suppressed), user 2 surges (alert)
      input.addData(e(3, "2024-01-01 10:05:00", 1, 480.0), e(4, "2024-01-01 10:05:00", 2, 460.0))
      q.processAllAvailable()
      // batch 3: user 1 drops then surges again (new alert)
      input.addData(
        e(5, "2024-01-01 10:10:00", 1, 10.0),
        e(6, "2024-01-01 10:11:00", 1, 470.0))
      q.processAllAvailable()
      val alerts = spark.table("edge_alerts")
        .select("event_id").as[Long].collect().toSet
      assert(alerts == Set(1L, 4L, 6L))
    } finally q.stop()
  }

  test("within-batch ordering is by event time, not arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = Stateful.risingEdgeAlerts(spark, input.toDS().toDF()
      .selectExpr("event_id", "ts", "user_id", "value").as[KeyedEvent], 450.0)
      .writeStream.format("memory").queryName("edge_alerts2")
      .outputMode("append").start()
    try {
      // arrival order scrambled: surge(10:02) arrives before dip(10:01)
      // and the initial surge(10:00); time-order = surge, dip, surge
      input.addData(
        e(12, "2024-01-01 10:02:00", 7, 470.0),
        e(11, "2024-01-01 10:01:00", 7, 10.0),
        e(10, "2024-01-01 10:00:00", 7, 500.0))
      q.processAllAvailable()
      val alerts = spark.table("edge_alerts2")
        .select("event_id").as[Long].collect().toSet
      assert(alerts == Set(10L, 12L)) // two rising edges in time order
    } finally q.stop()
  }

  test("transformWithState path emits the same edges as flatMapGroupsWithState") {
    val dir = "/root/testdata/sf0.001"
    val fmgws = Stateful.runRisingEdgeStream(spark, dir, 200.0)
      .select("event_id").as[Long].collect().sorted.toSeq
    val tws = Stateful.runRisingEdgeStreamTws(spark, dir, 200.0)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(fmgws.nonEmpty && tws == fmgws)
  }
}
