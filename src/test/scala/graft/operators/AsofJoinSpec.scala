package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("lastBefore attaches the latest at-or-before left row per key") {
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L, "c"),
      (1L, t("2024-01-01 10:30:00"), 101L, "c"),
      (2L, t("2024-01-01 09:00:00"), 102L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val purchases = Seq(
      (1L, t("2024-01-01 10:15:00"), 200L, "p", 9.99), // after click 100
      (1L, t("2024-01-01 10:30:00"), 201L, "p", 19.99), // ties click 101 → "<=" matches
      (1L, t("2024-01-01 11:00:00"), 202L, "p", 29.99), // after click 101
      (2L, t("2024-01-01 08:00:00"), 203L, "p", 39.99), // before any click → null
      (3L, t("2024-01-01 12:00:00"), 204L, "p", 49.99) // user with no clicks → null
    ).toDF("user_id", "ts", "event_id", "event_type", "amount")

    val out = AsofJoin.lastBefore(clicks, purchases,
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      payload = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(out == Map(
      200L -> Some(100L), 201L -> Some(101L), 202L -> Some(101L),
      203L -> None, 204L -> None))
  }

  test("right columns survive untouched; payload prefix applies") {
    val left = Seq((1L, t("2024-01-01 10:00:00"), 1L, 5.0))
      .toDF("k", "ts", "id", "price")
    val right = Seq((1L, t("2024-01-01 11:00:00"), 7L, "keepme"))
      .toDF("k", "ts", "id", "note")
    val out = AsofJoin.lastBefore(left, right, "k", "ts", "id",
      payload = Seq("id", "price"), payloadPrefix = "last_")
    assert(out.columns.toSeq == Seq("k", "ts", "id", "note", "last_id", "last_price"))
    val row = out.head()
    assert(row.getAs[String]("note") == "keepme")
    assert(row.getAs[Double]("last_price") == 5.0)
    assert(row.getAs[Long]("id") == 7L)
  }
}
