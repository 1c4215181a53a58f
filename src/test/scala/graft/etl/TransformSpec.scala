package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("schemaSplit routes rows with missing required fields to DLQ") {
    val df = Seq(
      ("btc", Some(100.0), Some(1000L)),
      ("eth", None, Some(500L)),
      (null: String, Some(1.0), None)).toDF("coin_id", "price", "cap")
    val (valid, invalid) = Transform.schemaSplit(df, Seq("coin_id", "price", "cap"))
    assert(valid.count() == 1)
    assert(valid.select("coin_id").as[String].collect().toSeq == Seq("btc"))
    val inv = invalid.collect()
    assert(inv.length == 2)
    val reasons = invalid.select("error_reason").as[String].collect().toSet
    assert(reasons.contains("Missing required fields: price"))
    assert(reasons.contains("Missing required fields: coin_id, cap"))
    assert(invalid.columns.toSeq ==
      Seq("raw_data", "error_reason", "timestamp", "validation_type"))
    // raw_data preserves the original row as JSON
    assert(invalid.filter(col("raw_data").contains("eth")).count() == 1)
  }

  test("schemaSplit partitions the input completely and disjointly") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(2.0)))
      .toDF("k", "v")
    val (valid, invalid) = Transform.schemaSplit(df, Seq("k", "v"))
    assert(valid.count() + invalid.count() == df.count())
  }

  test("dedupLatest keeps the latest row per key with deterministic ties") {
    val df = Seq(
      ("btc", "2024-01-01 10:00:00", 1, 100.0),
      ("btc", "2024-01-01 11:00:00", 2, 101.0), // latest → kept
      ("eth", "2024-01-01 09:00:00", 1, 50.0),
      ("eth", "2024-01-01 09:00:00", 2, 51.0) // tie on ts → higher line kept
    ).toDF("coin_id", "ts", "line", "price")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Transform.dedupLatest(df, Seq("coin_id"),
      Seq(col("ts").desc, col("line").desc))
    val rows = out.orderBy("coin_id").select("coin_id", "price").as[(String, Double)].collect()
    assert(rows.toSeq == Seq(("btc", 101.0), ("eth", 51.0)))
  }

  test("dedupLatestAgg (max_by scale path) matches the window dedup") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val windowed = Transform.dedupLatest(li, Seq("l_orderkey"),
      Seq(col("l_shipdate").desc, col("l_linenumber").desc,
        col("l_partkey").desc, col("l_suppkey").desc))
    val agged = Transform.dedupLatestAgg(li, Seq("l_orderkey"),
      Seq(col("l_shipdate"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    assert(agged.count() == windowed.count())
    // identical surviving rows
    assert(windowed.exceptAll(agged).isEmpty && agged.exceptAll(windowed).isEmpty)
  }

  test("dedupLatest is idempotent") {
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)).toDF("k", "seq", "v")
    val once = Transform.dedupLatest(df, Seq("k"), Seq(col("seq").desc))
    val twice = Transform.dedupLatest(once, Seq("k"), Seq(col("seq").desc))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("castProjection renames and casts") {
    val df = Seq(("1", "2.5")).toDF("id", "price")
    val out = Transform.castProjection(df, Seq(
      ("id", "coin_id", LongType), ("price", "current_price", DoubleType)))
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq(("coin_id", LongType), ("current_price", DoubleType)))
    assert(out.as[(Long, Double)].head() == ((1L, 2.5)))
  }

  test("withMetadata injects a fixed now deterministically") {
    val df = Seq(Tuple1("x")).toDF("k")
    val out = Transform.withMetadata(df, Some(java.time.Instant.parse("2024-03-05T12:00:00Z")))
    val r = out.select(col("update_date").cast("string"), col("last_updated_ts").cast("string")).head()
    assert(r.getString(0) == "2024-03-05")
    assert(r.getString(1) == "2024-03-05 12:00:00")
  }

  test("applyChangelog: update, delete, insert, revive, untouched") {
    val base = Seq(
      (1L, "a", 10.0),  // updated twice — last U wins
      (2L, "b", 20.0),  // deleted
      (3L, "c", 30.0),  // deleted then re-inserted — revives with new value
      (4L, "d", 40.0)   // untouched — survives verbatim
    ).toDF("k", "name", "v")
    val changes = Seq(
      (1L, "a1", 11.0, 100L, "U"),
      (1L, "a2", 12.0, 200L, "U"),
      (2L, "b", 0.0, 150L, "D"),
      (3L, "c", 0.0, 100L, "D"),
      (3L, "c2", 33.0, 300L, "I"),
      (5L, "e", 50.0, 100L, "I")  // brand-new key
    ).toDF("k", "name", "v", "seq", "op")
    val snap = Transform.applyChangelog(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(snap == Set(
      (1L, "a2", 12.0), (3L, "c2", 33.0), (4L, "d", 40.0), (5L, "e", 50.0)))
    // idempotent re-apply: replaying the same changelog changes nothing
    val again = Transform.applyChangelog(
      snap.toSeq.toDF("k", "name", "v"), changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(again == snap)
  }

  test("applyChangelog refuses a base whose payload collides with working columns") {
    val changes = Seq((1L, "a", 1.0, 1L, "U")).toDF("k", "name", "v", "seq", "op")
    def base(cols: String*) =
      Seq((1L, "a", 1.0, 0L)).toDF(cols: _*)
    for (bad <- Seq("__rank", "__op", "seq", "op")) {
      val e = intercept[IllegalArgumentException] {
        Transform.applyChangelog(base("k", "name", "v", bad), changes, Seq("k"), "seq", "op")
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("mergeAggStates: base + delta merge equals the full recompute") {
    val all = Seq(("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L),
      ("a", 1L, 30L), ("c", 1L, 7L)).toDF("k", "n", "v")
    def st(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("n").as("n"), sum("v").as("v"))
    val base = st(all.filter(col("v") <= 10))
    val delta = st(all.filter(col("v") > 10))
    val merged = Transform.mergeAggStates(Seq(base, delta), Seq("k"), Seq("n", "v"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val full = st(all).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged == full)
    assert(merged == Seq(("a", 3L, 60L), ("b", 1L, 5L), ("c", 1L, 7L)))
  }
}
