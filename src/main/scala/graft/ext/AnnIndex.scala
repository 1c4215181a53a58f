package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: the build-once / search-many shape every
  * production ANN deployment uses (FAISS serializes an `IndexIVFPQ`
  * to one file; at Spark scale the index IS a partitioned table).
  *
  * On-disk layout under `dir`:
  *  - `codes/` — parquet `partitionBy("label")`: (vec_id, codes)
  *    under `label=<cell>/` directories. This is the load-bearing
  *    choice: [[Features.ivfAdcTopK]] joins the code table to the
  *    broadcast probe list ON `label`, so against a label-partitioned
  *    scan Spark inserts a dynamic-partition-pruning filter (pinned
  *    in PlanSpec) and a search with `nprobe` of `k` cells READS only
  *    ~nprobe/k of the index from storage — the property that turns
  *    a 100 TB corpus search into a bounded IO job. No engine-managed
  *    cache or service: any session that can read the directory can
  *    search it.
  *  - `centroids/` — parquet: (label, centroid) — O(k_coarse) rows.
  *  - `codebooks/` — parquet: (subspace, code, centroid) — O(m·k)
  *    rows. Floats roundtrip parquet bit-exactly, so a reloaded index
  *    scores IDENTICALLY to the in-memory one (the q110b equality
  *    contract).
  */
object AnnIndex {

  /** A loaded index: the code table stays a (lazy, partition-pruned)
    * DataFrame; only the tiny codebook table is materialized
    * driver-side (m·k rows — bounded by construction, the same
    * disclosed driver-hop class as the k-means sample).
    */
  final case class Loaded(
      codes: DataFrame, // (vec_id, codes, label) — partition-pruned scan
      centroids: DataFrame, // (label, centroid)
      codebooks: IndexedSeq[IndexedSeq[Seq[Float]]])

  /** The (label, centroid) probe table for a frozen coarse quantizer
    * ([[graft.ext.Similarity.trainKmeansCentroids]] output).
    */
  def centroidTable(
      spark: SparkSession, centroids: IndexedSeq[Seq[Float]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, l) => (l, c) }
      .toDF("label", "centroid")
  }

  /** Persist just the two frozen quantizer side tables — the part of
    * [[write]] a streaming ingest needs up front, before any codes
    * exist ([[graft.stream.Jobs.runIndexIngestStream]]).
    */
  def writeQuantizers(
      spark: SparkSession,
      centroids: IndexedSeq[Seq[Float]],
      codebooks: IndexedSeq[IndexedSeq[Seq[Float]]],
      dir: String): Unit = {
    import spark.implicits._
    centroidTable(spark, centroids)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) => (j, code, c) }
    }.toDF("subspace", "code", "centroid")
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def write(
      codes: DataFrame, // (vec_id, label, codes)
      centroids: DataFrame, // (label, centroid)
      codebooks: IndexedSeq[IndexedSeq[Seq[Float]]],
      dir: String): Unit = {
    codes.select(col("vec_id"), col("codes"), col("label"))
      .write.mode("overwrite").partitionBy("label").parquet(s"$dir/codes")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    val spark = codes.sparkSession
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) => (j, code, c) }
    }.toDF("subspace", "code", "centroid")
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Quantizer-only load: the trained centroids (float form, label
    * order) and codebooks — what an ingest resume needs to guard
    * against mixing quantizers, readable before any codes exist.
    * Centroid values are cast to float, so the equality check is
    * meaningful against [[writeQuantizers]]-written tables (the
    * ingest path); a [[write]]-built index whose centroid table came
    * from `clusterCentroids` (double member means) won't compare
    * equal to a float quantizer — which is the correct refusal, not
    * a false alarm: those are genuinely different coarse quantizers.
    */
  def readQuantizers(spark: SparkSession, dir: String)
      : (IndexedSeq[Seq[Float]], IndexedSeq[IndexedSeq[Seq[Float]]]) = {
    val cRows = spark.read.parquet(s"$dir/centroids")
      .select(col("label"), transform(col("centroid"), _.cast("float")).as("c"))
      .collect()
    val cents = cRows.sortBy(_.getInt(0)).map(_.getSeq[Float](1)).toIndexedSeq
    val cbRows = spark.read.parquet(s"$dir/codebooks")
      .select(col("subspace"), col("code"), col("centroid"))
      .collect()
    val cbs = cbRows.groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toIndexedSeq
      }
    (cents, cbs)
  }

  /** FAISS `remove_ids` for the persisted index: deletion appends the
    * ids to a `tombstones/` side table — never a rewrite of the code
    * table (at 100 TB deleting k vectors must not cost a corpus-sized
    * IO job). Tombstones are honored logically at search ([[read]]
    * anti-joins them out of the code scan) and swept physically at
    * [[compact]], the same deferred-delete lifecycle every
    * LSM/lakehouse table uses. Idempotent: re-deleting an id appends
    * a duplicate row the anti-join doesn't care about and the sweep
    * clears.
    */
  def delete(ids: DataFrame, idCol: String, dir: String): Unit =
    ids.select(col(idCol).cast("long").as("vec_id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  /** The pending deleted-id table, if any deletes are outstanding. */
  private def pendingTombstones(
      spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(p.toString))
    else None
  }

  def read(spark: SparkSession, dir: String): Loaded = {
    // no-tombstone indexes get the bare scan (the common case — and
    // the plan PlanSpec's DPP pin covers); with pending deletes the
    // anti-join is on the 8-byte id, and AQE broadcasts the (small)
    // tombstone side
    val raw = spark.read.parquet(s"$dir/codes")
    val codes = pendingTombstones(spark, dir).fold(raw)(t =>
      raw.join(t.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val centroids = spark.read.parquet(s"$dir/centroids")
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("subspace"), col("code"), col("centroid"))
      .collect() // O(m·k) — bounded by the index geometry, not the corpus
    val codebooks = rows.groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toIndexedSeq
      }
    Loaded(codes, centroids, codebooks)
  }

  /** IVF-ADC search over a loaded index — delegates to
    * [[Features.ivfAdcTopK]]; the probe-side broadcast join on the
    * partition column is what lets the on-disk form prune cells at
    * the SCAN (DPP), not just at the join.
    */
  def searchTopK(index: Loaded, queries: DataFrame, k: Int, nprobe: Int): DataFrame =
    Features.ivfAdcTopK(index.codes, index.centroids, queries,
      index.codebooks, k, nprobe)

  /** Consolidate a streamed index into the canonical layout — the
    * FAISS `merge_from` maintenance step, because
    * [[graft.stream.Jobs.runIndexIngestStream]] necessarily grows a
    * `codes/batch=<id>/label=<cell>/` file PER (micro-batch, cell):
    * exactly-once appends buy the classic streaming small-files
    * problem, and at ingest cadence the per-cell file count — and
    * with it search-scan task overhead — grows without bound.
    * Compaction rewrites the code table as one `codes/label=<cell>/`
    * level (dropping the batch dimension, which only ever existed for
    * replay idempotence), staged then atomically swapped like the KV
    * sink, so a concurrent reader sees the old or the new table,
    * never a half-written one. Search results are IDENTICAL before
    * and after (q115's contract): codes are content, layout is not.
    * Label partition pruning is preserved — one directory level
    * higher, one level fewer to list.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    // the sweep half of the tombstone lifecycle: pending deletes are
    // physically excised here (the one pass that rewrites the table
    // anyway), then the SWEPT tombstone files are cleared — search
    // results are identical before and after by construction. The
    // file list is SNAPSHOTTED eagerly before the sweep and only
    // those exact files are read and later deleted: a concurrent
    // delete() appending a new tombstone file mid-compaction keeps
    // its file (and so its pending-delete semantics) instead of
    // being silently discarded by a whole-directory delete
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombDir = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val snapshot: Array[org.apache.hadoop.fs.Path] =
      if (fs.exists(tombDir)) fs.listStatus(tombDir).map(_.getPath)
      else Array.empty
    val tombFiles = snapshot.filter(_.getName.endsWith(".parquet"))
    val raw = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("codes"), col("label"))
    val codes =
      if (tombFiles.isEmpty) raw
      else raw.join(
        spark.read.parquet(tombFiles.map(_.toString).toIndexedSeq: _*)
          .select(col("vec_id")),
        Seq("vec_id"), "left_anti")
    val staging = s"$dir/codes__staging"
    codes.write.mode("overwrite").partitionBy("label").parquet(staging)
    val dst = new org.apache.hadoop.fs.Path(s"$dir/codes")
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    // clear exactly the snapshotted files (.parquet plus the write
    // markers listed alongside them), then remove the directory only
    // if nothing new landed — a non-recursive delete refuses a
    // non-empty dir, so a concurrently appended tombstone file keeps
    // both its bytes and its pending-delete semantics
    snapshot.foreach(f => fs.delete(f, false))
    if (snapshot.nonEmpty)
      try { fs.delete(tombDir, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    ()
  }
}
