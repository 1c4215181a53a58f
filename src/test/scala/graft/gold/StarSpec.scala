package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StarSpec extends SparkSpec {
  import spark.implicits._

  test("dimDate derives calendar attributes for known dates") {
    val df = Seq("2024-01-06", "2024-01-07", "2024-01-08", "2024-02-29")
      .toDF("d").withColumn("d", col("d").cast("date"))
    val out = Star.dimDate(df, "d").orderBy("date").collect()
    // 2024-01-06 Saturday
    val sat = out(0)
    assert(sat.getAs[Int]("day_of_week") == 7)
    assert(sat.getAs[Boolean]("is_weekend"))
    assert(sat.getAs[String]("day_name") == "Saturday")
    // 2024-01-07 Sunday (1=Sunday convention)
    val sun = out(1)
    assert(sun.getAs[Int]("day_of_week") == 1)
    assert(sun.getAs[Boolean]("is_weekend"))
    // 2024-01-08 Monday
    val mon = out(2)
    assert(mon.getAs[Int]("day_of_week") == 2)
    assert(!mon.getAs[Boolean]("is_weekend"))
    assert(mon.getAs[Int]("week_of_year") == 2)
    // leap day
    val leap = out(3)
    assert(leap.getAs[Int]("day") == 29)
    assert(leap.getAs[Int]("month") == 2)
    assert(leap.getAs[Int]("quarter") == 1)
    assert(leap.getAs[String]("month_name") == "February")
  }

  test("upsert replaces keyed rows and appends new ones") {
    val existing = Seq(("2024-01-01", "a", 1.0), ("2024-01-02", "b", 2.0))
      .toDF("date", "k", "v")
    val incoming = Seq(("2024-01-02", "b", 20.0), ("2024-01-03", "c", 3.0))
      .toDF("date", "k", "v")
    val merged = Star.upsert(existing, incoming, Seq("date"))
      .orderBy("date").as[(String, String, Double)].collect()
    assert(merged.toSeq == Seq(
      ("2024-01-01", "a", 1.0), ("2024-01-02", "b", 20.0), ("2024-01-03", "c", 3.0)))
  }

  test("upsert is associative over batches") {
    val base = Seq(("d1", 1.0)).toDF("date", "v")
    val b1 = Seq(("d1", 2.0), ("d2", 5.0)).toDF("date", "v")
    val b2 = Seq(("d2", 7.0)).toDF("date", "v")
    val seq = Star.upsert(Star.upsert(base, b1, Seq("date")), b2, Seq("date"))
    val expected = Seq(("d1", 2.0), ("d2", 7.0))
    assert(seq.orderBy("date").as[(String, Double)].collect().toSeq == expected)
  }

  test("mergeDim dedups on the key") {
    val existing = Seq(("btc", "Bitcoin")).toDF("coin_id", "name")
    val incoming = Seq(("btc", "Bitcoin"), ("eth", "Ethereum")).toDF("coin_id", "name")
    val out = Star.mergeDim(existing, incoming, Seq("coin_id"))
    assert(out.count() == 2)
  }

  test("scd2 compresses runs, versions changes, closes validity with the high date") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val hist = Seq(
      // key 1: A, A (run compressed), B, A again (reopens a version)
      (1L, "A", d("2024-01-01"), 1L), (1L, "A", d("2024-01-05"), 2L),
      (1L, "B", d("2024-02-01"), 3L), (1L, "A", d("2024-03-01"), 4L),
      // key 2: null first attribute is still version 1
      (2L, null.asInstanceOf[String], d("2024-01-10"), 5L),
      (2L, "C", d("2024-01-20"), 6L)
    ).toDF("k", "attr", "eff", "tie")
    val out = Star.scd2(hist, "k", "attr", "eff", Seq("tie"))
      .orderBy(col("k"), col("version"))
      .select(col("k"), col("attr"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("version"), col("is_current"))
      .as[(Long, String, String, String, Int, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "A", "2024-01-01", "2024-02-01", 1, false),
      (1L, "B", "2024-02-01", "2024-03-01", 2, false),
      (1L, "A", "2024-03-01", "9999-12-31", 3, true),
      (2L, null, "2024-01-10", "2024-01-20", 1, false),
      (2L, "C", "2024-01-20", "9999-12-31", 2, true)))
  }

  test("starJoin broadcasts dims and joins on keys") {
    val fact = Seq((1, 10, 100.0), (2, 20, 200.0)).toDF("k1", "k2", "v")
    val d1 = Seq((1, "x"), (2, "y")).toDF("k1", "n1")
    val d2 = Seq((10, "p"), (20, "q")).toDF("k2", "n2")
    val out = Star.starJoin(fact, Seq((d1, Seq("k1")), (d2, Seq("k2"))))
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
