package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("mergeIntervals: overlap and nesting merge, gaps split, touching merges") {
    val iv = Seq(
      // k1: [10:00,11:00) overlaps [10:30,11:30) → island 1;
      //     [11:30,12:00) TOUCHES 11:30 → merges (end == next start);
      //     [13:00,13:10) after a gap → island 2;
      //     [13:02,13:05) nested inside island 2
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
      (1L, t("2024-01-01 10:30:00"), t("2024-01-01 11:30:00")),
      (1L, t("2024-01-01 11:30:00"), t("2024-01-01 12:00:00")),
      (1L, t("2024-01-01 13:00:00"), t("2024-01-01 13:10:00")),
      (1L, t("2024-01-01 13:02:00"), t("2024-01-01 13:05:00")),
      // k2: single interval
      (2L, t("2024-01-01 09:00:00"), t("2024-01-01 09:30:00"))
    ).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e")
      .orderBy(col("key"), col("island"))
      .select(col("key"), col("island"),
        col("interval_start").cast("string"), col("interval_end").cast("string"))
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (1L, 2L, "2024-01-01 13:00:00", "2024-01-01 13:10:00"),
      (2L, 1L, "2024-01-01 09:00:00", "2024-01-01 09:30:00")))
  }

  test("mergeIntervals: out-of-order input produces the same islands") {
    val iv = Seq(
      (1L, t("2024-01-01 13:00:00"), t("2024-01-01 13:10:00")),
      (1L, t("2024-01-01 10:30:00"), t("2024-01-01 11:30:00")),
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"))
    ).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, "k", "s", "e")
      .orderBy(col("island"))
      .select(col("interval_start").cast("string"), col("interval_end").cast("string"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01 10:00:00", "2024-01-01 11:30:00"),
      ("2024-01-01 13:00:00", "2024-01-01 13:10:00")))
  }
}
