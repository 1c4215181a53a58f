package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: known Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
    val got = df.select(Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().toSeq
    // morton(x→odd positions, y→even): (1,0)→2, (0,1)→1,
    // (3,5)→ x bits {0,1}→{1,3}=2+8, y bits {0,2}→{0,4}=1+16 → 27
    assert(got == Seq(0L, 2L, 1L, 27L, (1L << 20) - 1))
  }

  test("zorderWrite: each file covers a compact (x, y) rectangle") {
    val n = 4096
    val df = (0 until n).map { i =>
      // deterministic scatter over a 64x64 grid
      val x = (i * 2654435761L) % 64
      val y = (i * 40503L) % 64
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
    val path = tempDir("graft-zorder")
    Layout.zorderWrite(df, "x", "y", bits = 6, numFiles = 8, path = s"$path/t")
    val files = new java.io.File(s"$path/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 4, s"expected several files, got ${files.size}")
    val totalArea = 64.0 * 64.0
    val areas = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
      (r.getLong(1) - r.getLong(0) + 1).toDouble * (r.getLong(3) - r.getLong(2) + 1)
    }
    // unsorted/row-major files would each span ~the whole grid
    // (sum ≈ files × total); z-ordered files cover compact rectangles
    assert(areas.sum < 0.5 * files.size * totalArea,
      s"areas=$areas vs total=$totalArea")
  }

  test("compact: many small files become targetFiles, content identical, ranges disjoint") {
    val path = tempDir("graft-compact") + "/t"
    val df = (1L to 5000L).toDF("k").withColumn("v", col("k") * 2)
    df.repartition(64).write.parquet(path) // the accreted small-files state
    def parquetFiles = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles.length >= 32)
    Layout.compact(spark, path, targetFiles = 4, sortCols = Seq("k"))
    assert(parquetFiles.length == 4, parquetFiles.length.toString)
    val back = spark.read.parquet(path)
    assert(back.count() == 5000L)
    assert(back.agg(sum(col("v"))).head().getLong(0) == 5000L * 5001L)
    // range clustering: per-file [min(k), max(k)] spans don't overlap
    val spans = parquetFiles.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, spans.mkString(","))
      case _ =>
    }
  }

  test("compact self-heals a crash inside the rename window") {
    val path = tempDir("graft-heal") + "/t"
    val df = (1L to 100L).toDF("k")
    df.write.parquet(path)
    // simulate the crash: dst renamed aside, staging never swapped in
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".precompact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
    // a direct repair restores the retired copy...
    assert(Layout.recoverIfInterrupted(spark, path))
    assert(spark.read.parquet(path).count() == 100L)
    // ...and is a no-op on a healthy table
    assert(!Layout.recoverIfInterrupted(spark, path))
    // the next compact on a crashed state heals then compacts
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".precompact")))
    Layout.compact(spark, path, targetFiles = 1, sortCols = Seq("k"))
    assert(spark.read.parquet(path).count() == 100L)
  }

  test("skippingReport: sorted layout prunes, interleaved layout half-prunes") {
    import org.apache.spark.sql.functions._
    val df = (1L to 20L).toDF("v")
    val r = Layout.skippingReport(df, Seq(
      ("sorted", Seq(col("v"))),
      ("parity", Seq(pmod(col("v"), lit(2)), col("v")))),
      statCol = col("v"), tieBreak = col("v"),
      rowsPerFile = 5, lo = 1L, hi = 5L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // parity order: evens 2..20 (two files), odds 1..19 (two files) —
    // the two even files span [2,10]/[12,20], odds [1,9]/[11,19]:
    // only the two high files miss [1,5] entirely
    assert(r == Seq(("parity", 4L, 2L, 2L), ("sorted", 4L, 3L, 1L)))
  }

  test("skippingReportMulti releases every frame it persists") {
    import org.apache.spark.sql.functions._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1L to 2000L).toDF("v")
    val r = Layout.skippingReportMulti(df,
      Seq(("sorted", Seq(col("v"))), ("mod", Seq(pmod(col("v"), lit(7)), col("v")))),
      Seq(("low", col("v"), 1L, 100L), ("high", col("v"), 1900L, 2000L)),
      tieBreak = col("v"), rowsPerFile = 100)
    assert(r.count() == 4L) // layouts x predicates, already materialized
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"base/ranged frames must be unpersisted before returning: $leaked")
  }

  test("skippingReport: two-phase file model equals the global row_number at 100k string keys") {
    // regression pin for the r13 sf0.1 failure class: the rank must
    // be IDENTICAL to a global row_number over (key, tieBreak). The
    // failure modes it guards — a re-executed range shuffle sampling
    // different bounds (rdd.id-seeded) and AQE coalescing one reader
    // of the exchange but not the other — only bite at enough rows
    // for bounds/coalescing to move, hence 100k md5-string keys.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 100000L).select(col("id"),
      md5(col("id").cast("string")).as("k"))
    val got = Layout.skippingReport(df, Seq(("by_hash", Seq(col("k")))),
      statCol = col("id"), tieBreak = col("id"),
      rowsPerFile = 500, lo = 0L, hi = 49999L)
      .as[(String, Long, Long, Long)].collect().head
    // replay with an exact global window (the test-side oracle)
    val oracle = df
      .withColumn("f", floor((row_number().over(
        Window.orderBy(col("k").asc, col("id").asc)) - 1) / lit(500)))
      .groupBy(col("f"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .agg(count(lit(1)),
        sum(when(col("mx") < 0L || col("mn") > 49999L, 1L).otherwise(0L)))
      .head
    assert(got._2 == oracle.getLong(0), "n_files must match the global model")
    assert(got._3 == oracle.getLong(1), "n_skipped must match the global model")
    assert(got._2 == 200L, "100k rows / 500 per file = 200 files exactly")
  }

  test("hilbertValue: the full known 4x4 curve, and adjacency everywhere") {
    // the canonical order-2 Hilbert walk (U-shape recursion)
    val expected = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (1, 1) -> 2L, (0, 1) -> 3L,
      (0, 2) -> 4L, (0, 3) -> 5L, (1, 3) -> 6L, (1, 2) -> 7L,
      (2, 2) -> 8L, (2, 3) -> 9L, (3, 3) -> 10L, (3, 2) -> 11L,
      (3, 1) -> 12L, (2, 1) -> 13L, (2, 0) -> 14L, (3, 0) -> 15L)
    val got = expected.keys.toSeq.map { case (x, y) => (x, y) }
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 2).as("d"))
      .as[(Int, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == expected)
    // the defining property z-order lacks: consecutive d-values are
    // always grid neighbors (|dx| + |dy| = 1)
    val byD = got.toSeq.map { case ((x, y), d) => d -> ((x, y)) }.sortBy(_._1)
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
    // wider grid: 10-bit key is injective on a 64x24 slab
    val wide = (for (x <- 0 until 64; y <- 0 until 24) yield (x, y)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 10).as("d"))
      .distinct().count()
    assert(wide == 64L * 24L)
  }
}
