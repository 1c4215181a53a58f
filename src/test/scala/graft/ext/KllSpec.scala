package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Double], partitions: Int, k: Int = 256) =
    values.toDF("v").repartition(partitions)
      .agg(KllAgg.kllAgg(col("v"), k).as("sk"))

  test("small groups (n < k) are exact") {
    val vs = (1 to 100).map(_.toDouble)
    val q = sketchOf(vs, 4)
      .select(
        KllAgg.quantile(col("sk"), 0.5).as("q50"),
        KllAgg.quantile(col("sk"), 1.0).as("q100"))
      .head()
    // n=100 < k: nothing ever compacted, quantiles are exact order stats
    assert(q.getDouble(0) == 50.0)
    assert(q.getDouble(1) == 100.0)
  }

  test("compaction preserves total weight exactly") {
    val n = 50000
    val vs = scala.util.Random.shuffle((1 to n).map(_.toDouble)).toSeq
    val total = sketchOf(vs, 8)
      .select(aggregate(col("sk"), lit(0L), (acc, x) => acc + x.getField("w")))
      .head().getLong(0)
    assert(total == n.toLong)
  }

  test("rank error stays within bound across partitioned merge") {
    val n = 50000
    val vs = scala.util.Random.shuffle((1 to n).map(_.toDouble)).toSeq
    val q = sketchOf(vs, 8)
      .select(
        KllAgg.quantile(col("sk"), 0.1).as("q10"),
        KllAgg.quantile(col("sk"), 0.5).as("q50"),
        KllAgg.quantile(col("sk"), 0.95).as("q95"))
      .head()
    // uniform 1..n: value error == rank error * n; bound 2.5%
    assert(math.abs(q.getDouble(0) - 0.10 * n) <= 0.025 * n, q.toString)
    assert(math.abs(q.getDouble(1) - 0.50 * n) <= 0.025 * n, q.toString)
    assert(math.abs(q.getDouble(2) - 0.95 * n) <= 0.025 * n, q.toString)
  }

  test("single-partition sketch is deterministic across runs") {
    val vs = (1 to 10000).map(i => ((i * 2654435761L) % 100000).toDouble)
    val a = sketchOf(vs, 1).head().getSeq[Any](0)
    val b = sketchOf(vs, 1).head().getSeq[Any](0)
    assert(a == b)
  }

  test("skewed duplicates: heavy value dominates its quantile range") {
    // 90% of the mass is the value 7.0 — any p in (0.06, 0.9] must hit it
    val vs = Seq.fill(45000)(7.0) ++ (1 to 5000).map(_ + 1000000.0)
    val q = sketchOf(scala.util.Random.shuffle(vs).toSeq, 8)
      .select(
        KllAgg.quantile(col("sk"), 0.5).as("q50"),
        KllAgg.quantile(col("sk"), 0.85).as("q85"))
      .head()
    assert(q.getDouble(0) == 7.0, q.toString)
    assert(q.getDouble(1) == 7.0, q.toString)
  }

  test("multi-quantile single pass equals per-p extraction") {
    val vs = scala.util.Random.shuffle((1 to 20000).map(_.toDouble)).toSeq
    val ps = Seq(0.1, 0.5, 0.95, 1.0)
    val row = sketchOf(vs, 8)
      .select(
        KllAgg.quantiles(col("sk"), ps).as("multi"),
        array(ps.map(p => KllAgg.quantile(col("sk"), p)): _*).as("single"))
      .head()
    assert(row.getSeq[Double](0) == row.getSeq[Double](1))
  }

  test("kllMergeAgg: re-aggregated stored sketches stay rank-accurate; exact when small") {
    // two disjoint halves sketched separately, sketches STORED as
    // rows, then merged by the re-aggregation — the rollup lifecycle
    val halves = Seq((1 to 10000).map(_.toDouble), (10001 to 20000).map(_.toDouble))
    val stored = halves.map(vs =>
      vs.toDF("v").agg(KllAgg.kllAgg(col("v"), 256).as("sk")))
      .reduce(_.unionByName(_))
    val merged = stored.agg(KllAgg.kllMergeAgg(col("sk"), 256).as("sk"))
      .select(KllAgg.quantile(col("sk"), 0.5).as("q50"),
        KllAgg.quantile(col("sk"), 0.9).as("q90"))
      .head()
    assert(math.abs(merged.getDouble(0) - 10000.0) <= 0.025 * 20000, merged.toString)
    assert(math.abs(merged.getDouble(1) - 18000.0) <= 0.025 * 20000, merged.toString)
    // sub-k sketches are exact, and so is their sub-k merge
    val tiny = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).map(vs =>
      vs.toDF("v").agg(KllAgg.kllAgg(col("v"), 256).as("sk")))
      .reduce(_.unionByName(_))
      .agg(KllAgg.kllMergeAgg(col("sk"), 256).as("sk"))
      .select(KllAgg.quantile(col("sk"), 0.5).as("q50")).head().getDouble(0)
    assert(tiny == 2.0)
  }

  test("buffer merge at the class level matches a flat rebuild's bound") {
    val a = new KllAgg.Buffer(64)
    val b = new KllAgg.Buffer(64)
    (1 to 20000).foreach(i => a.insert(i.toDouble))
    (20001 to 40000).foreach(i => b.insert(i.toDouble))
    a.mergeIn(b)
    val items = a.flattened.sortBy(_._1)
    val total = items.map(_._2).sum
    assert(total == 40000L)
    // estimated median from the merged buffer
    var cum = 0L
    val target = total / 2
    val median = items.find { case (_, w) => { cum += w; cum >= target } }.get._1
    assert(math.abs(median - 20000.0) <= 0.025 * 40000, median.toString)
  }
}
