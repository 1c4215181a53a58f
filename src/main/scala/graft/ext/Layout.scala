package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving for
  * file-level data skipping on TWO predicate columns at once.
  *
  * A single-column sort gives perfect min/max pruning on that column
  * and none on any other; interleaving the bits of two columns into
  * one sort key gives both columns locality — a file holds a small
  * rectangle of the (x, y) space, so a selective predicate on EITHER
  * column prunes most files. This is the standard lakehouse layout
  * trick for multi-dimensional scans, expressed with plain codegen'd
  * bit arithmetic (no UDF, oracle-reproducible).
  */
object Layout {

  /** Morton z-value of the low `bits` of two non-negative columns:
    * bit b of `x` lands at position 2b+1, bit b of `y` at 2b. Callers
    * range-reduce (mod / bucketize) first; 16 bits per dimension is
    * plenty for file-level clustering.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b + 1)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b))
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert d-value of the low `bits` of two non-negative columns —
    * the OTHER standard multi-dimensional clustering key (the one
    * Delta/Iceberg offer beside Z-order): the iterative xy2d walk
    * (public algorithm — the standard Wikipedia/Hamilton reference
    * form) folded over bit levels s = 2^(bits−1)..1, carrying (x, y,
    * d) state. Expressed as ONE `aggregate` higher-order function
    * over the descending-exponent sequence, so state threads
    * ITERATIVELY — a hand-inlined expression would duplicate the
    * (x, y) subtrees 2^bits times — and the key stays fully in-plan:
    * no UDF, no shuffle, oracle-reproducible (the same walk replays
    * as a recursive CTE). Hilbert keeps every pair of adjacent
    * d-values spatially adjacent where z-order jumps at quadrant
    * seams, so per-file bounding boxes come out tighter on BOTH
    * dimensions.
    */
  def hilbertValue(xc: Column, yc: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val n1 = (1L << bits) - 1L // N-1: rotations mirror inside the full grid
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(xc.cast("long").as("x"), yc.cast("long").as("y"), lit(0L).as("d")),
      (st, i) => {
        val s = pow(lit(2.0), i).cast("long")
        val x = st.getField("x")
        val y = st.getField("y")
        val rx = when(x.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val ry = when(y.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val d2 = st.getField("d") + s * s * (lit(3L) * rx).bitwiseXOR(ry)
        val flip = ry === 0 && rx === 1
        val fx = when(flip, lit(n1) - x).otherwise(x)
        val fy = when(flip, lit(n1) - y).otherwise(y)
        struct(
          when(ry === 0, fy).otherwise(fx).as("x"),
          when(ry === 0, fx).otherwise(fy).as("y"),
          d2.as("d"))
      },
      st => st.getField("d"))
  }

  /** Small-files compaction: rewrite a parquet dataset into
    * `targetFiles` files, preserving (or imposing) a range-clustered
    * sort on `sortCols` so min/max file skipping survives the rewrite.
    * The maintenance job every long-lived table needs — streaming
    * sinks, partition patches, and per-batch appends accrete small
    * files until scan task scheduling dominates the read; one
    * range-shuffle rewrite restores the layout. The swap is
    * rename-based on the filesystem that OWNS `path`: write staging,
    * rename the live dataset aside, rename staging in, delete the old
    * copy last — the data is never gone from disk, and a crash leaves
    * either the original or the compacted dataset recoverable (an
    * object-store deployment swaps this for its own atomic-commit
    * protocol — rename is not atomic there).
    *
    * READER-VISIBLE OUTAGE WINDOW: between the two renames the
    * published `path` briefly does not exist — a concurrent reader in
    * that instant gets FileNotFound. This is a maintenance operation;
    * schedule it when the table is quiescent, or front it with a
    * catalog/manifest swap where readers resolve paths indirectly.
    * If a crash lands inside the window, the NEXT invocation
    * self-heals: on entry, a missing `path` with a `.precompact` copy
    * present is restored before compaction proceeds — no manual
    * intervention needed.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String, targetFiles: Int, sortCols: Seq[String]): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    val staging = path + ".compacting"
    val retired = path + ".precompact"
    recoverIfInterrupted(spark, path)
    val df = spark.read.parquet(path)
    val repart =
      if (sortCols.isEmpty) df.repartition(targetFiles)
      else df.repartitionByRange(targetFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    repart.write.mode("overwrite").parquet(staging)
    val dst = new org.apache.hadoop.fs.Path(path)
    // the filesystem that owns the path, NOT the default filesystem —
    // they differ whenever path is file:// or s3a:// under an hdfs
    // default (or vice versa)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(retired)
    fs.delete(old, true) // clear any residue of an earlier crash
    require(fs.rename(dst, old), s"compaction rename failed: $path -> $retired")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), dst)) {
      // restore the original before failing — and report honestly if
      // even the restore failed (recoverIfInterrupted heals it later)
      val restored = fs.rename(old, dst)
      throw new IllegalStateException(
        s"compaction rename failed: $staging -> $path (original " +
          (if (restored) "restored" else s"NOT restored — retired copy at $retired") + ")")
    }
    fs.delete(old, true)
  }

  /** Crash recovery for [[compact]]'s rename window: if the published
    * `path` is missing but the `.precompact` retired copy exists (a
    * crash landed between the two renames), rename it back. Returns
    * true if a restore happened. Called automatically on every
    * [[compact]] entry; also callable directly from a repair job.
    */
  def recoverIfInterrupted(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".precompact")
    if (!fs.exists(dst) && fs.exists(old)) {
      require(fs.rename(old, dst), s"recovery rename failed: $old -> $path")
      true
    } else false
  }

  /** Data-skipping effectiveness audit: for each candidate layout
    * (an ordering key list), model the files a range-clustered write
    * of `rowsPerFile` rows would produce, compute each file's min/max
    * of the predicate column, and report how many files the range
    * predicate `statCol ∈ [lo, hi]` could skip — the number every
    * layout decision (sort vs z-order vs none) should be made on,
    * BEFORE rewriting the table. All exact integer arithmetic, so the
    * report replays in SQL.
    *
    * The file model is the 0-based global rank of the layout sort
    * divided by `rowsPerFile` — exactly the assignment
    * `repartitionByRange(...).sortWithinPartitions(...)` (the
    * [[zorderWrite]]/[[compact]] shape) produces with balanced
    * ranges. The rank itself comes from the SAME range shuffle plus a
    * two-phase prefix sum (per-range-partition counts → O(P) offset
    * frame broadcast back → per-partition row_number windows — the
    * TrainPrep prefix-sum discipline): the layout key including the
    * tie-break is a total order, so partition-count offsets + local
    * rank reproduce the global row_number exactly, with no
    * single-partition window anywhere in the plan.
    */
  def skippingReport(
      df: DataFrame,
      layouts: Seq[(String, Seq[Column])],
      statCol: Column, tieBreak: Column,
      rowsPerFile: Int, lo: Long, hi: Long): DataFrame =
    skippingReportMulti(df, layouts, Seq(("__single", statCol, lo, hi)),
      tieBreak, rowsPerFile)
      .select(col("layout"), col("n_files"), col("n_skipped"),
        col("n_scanned"))

  /** [[skippingReport]] graded on SEVERAL predicates per layout in
    * ONE pass each: the expensive part of the audit is the layout
    * ranking (key computation + range shuffle), identical for every
    * predicate over the same layout — so rank once, collect per-file
    * min/max for ALL predicate columns in one aggregation, and
    * unpivot the skip counts in-plan (`stack`). Output grain:
    * (layout, predicate).
    */
  def skippingReportMulti(
      df: DataFrame,
      layouts: Seq[(String, Seq[Column])],
      preds: Seq[(String, Column, Long, Long)],
      tieBreak: Column, rowsPerFile: Int): DataFrame = {
    require(layouts.nonEmpty, "need at least one layout")
    require(preds.nonEmpty, "need at least one predicate")
    require(rowsPerFile >= 1, "rowsPerFile must be >= 1")
    require(preds.forall { case (_, _, lo, hi) => lo <= hi },
      "predicate ranges must be non-empty")
    require(preds.forall(_._1.matches("[A-Za-z0-9_]+")),
      "predicate names feed a stack() literal: [A-Za-z0-9_]+ only")
    import org.apache.spark.sql.expressions.Window
    // ONE shared projection carrying every predicate value and every
    // layout's key columns, persisted once: layout keys can be
    // expensive (hilbertValue's per-level HOF) and are needed by the
    // range partitioner's bounds-sampling job AND the shuffle pass of
    // their layout — without the cache each layout pays its own full
    // scan + key computation twice (measured 2x on q206), and with a
    // PER-LAYOUT cache the input is scanned once per layout instead
    // of once total
    val vcols = preds.zipWithIndex.map {
      case ((_, c, _, _), j) => c.cast("long").as(s"__v$j")
    }
    val allKeyCols = layouts.zipWithIndex.flatMap { case ((_, keys), li) =>
      (keys :+ tieBreak).zipWithIndex.map {
        case (c, i) => c.as(s"__l${li}_k$i")
      }
    }
    val base = df.select(vcols ++ allKeyCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the per-layout ranged frames are persisted below (pid-universe
    // pin); track them so everything cached here is RELEASED before
    // returning — the report is a tiny (layouts × preds)-row
    // aggregate, so it is materialized eagerly and rebuilt as a local
    // DataFrame, letting base/ranged unpersist in the finally block
    // instead of leaking cached blocks for the session's lifetime
    val rangedFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
    val report = layouts.zipWithIndex.map { case ((name, keys), li) =>
      val kNames = (0 to keys.length).map(i => s"__l${li}_k$i")
      val ks = kNames.map(col(_).asc)
      // trim to this layout's columns BEFORE the shuffle so other
      // layouts' keys never ride this layout's exchange
      val keyed = base.select(
        (preds.indices.map(j => col(s"__v$j")) ++ kNames.map(col)): _*)
      // phase 1: the range shuffle that IS the modeled write layout;
      // ranges are contiguous in key order, so partition id order =
      // key order and prefix counts are exact rank offsets. The
      // ranged frame is PERSISTED because __pid must mean the same
      // partition to both consumers below, and a re-executed range
      // shuffle does NOT guarantee that: the RangePartitioner's
      // bounds come from a sample whose seed varies per execution
      // (rdd.id-derived), and AQE may coalesce a bare range exchange
      // differently per reader stage — both observed at sf0.1
      // (96.7% of ranks off on the string-keyed layout). One
      // materialized partitioning = one pid universe. The count is
      // explicit as well so AQE never coalesces the persisted scan.
      val ranged = keyed.repartitionByRange(
          df.sparkSession.sessionState.conf.numShufflePartitions, ks: _*)
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rangedFrames += ranged
      // phase 2: per-partition counts → prefix offsets over the O(P)
      // frame (P = shuffle partitions — the accepted bounded-frame
      // single-partition window), broadcast back; the layout key
      // including the tie-break is a total order, so offset + local
      // row_number reproduces the global rank exactly
      val offs = ranged.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__off", coalesce(
          sum(col("__c")).over(Window.orderBy(col("__pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__pid"), col("__off"))
      val wLocal = Window.partitionBy(col("__pid")).orderBy(ks: _*)
      val fileStats = ranged.join(broadcast(offs), Seq("__pid"))
        .withColumn("__f", floor(
          (col("__off") + row_number().over(wLocal) - 1) / lit(rowsPerFile)))
        .groupBy(col("__f"))
        .agg(
          min(col("__v0")).as("mn0"), max(col("__v0")).as("mx0") +:
            preds.indices.drop(1).flatMap(j => Seq(
              min(col(s"__v$j")).as(s"mn$j"),
              max(col(s"__v$j")).as(s"mx$j"))): _*)
      val skips = preds.zipWithIndex.map { case ((_, _, lo, hi), j) =>
        sum(when(col(s"mx$j") < lo || col(s"mn$j") > hi, 1L).otherwise(0L))
          .as(s"__sk$j")
      }
      val stackExpr = preds.zipWithIndex
        .map { case ((pn, _, _, _), j) => s"'$pn', __sk$j" }
        .mkString(s"stack(${preds.size}, ", ", ", ") AS (predicate, n_skipped)")
      fileStats
        .agg(count(lit(1)).as("n_files"), skips: _*)
        .select(lit(name).as("layout"), col("n_files"), expr(stackExpr))
        .select(col("layout"), col("n_files"), col("n_skipped"),
          (col("n_files") - col("n_skipped")).as("n_scanned"),
          col("predicate"))
    }.reduce(_.unionByName(_))
    val rows = report.collect() // bounded: layouts × preds rows
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), report.schema)
    } finally {
      rangedFrames.foreach(_.unpersist(false))
      base.unpersist(false)
    }
  }

  /** Z-ordered write: range-partition on the z-value (one shuffle
    * that IS the clustering), sort within partitions, drop the key.
    * Each output file then covers a compact z-range = a small (x, y)
    * rectangle, which is what min/max file skipping prunes on.
    */
  def zorderWrite(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
