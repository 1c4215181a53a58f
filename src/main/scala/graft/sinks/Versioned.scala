package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time-travel reads: every publish
  * lands a complete snapshot under `path/v=<version>`, and a reader
  * asks for the table AS OF any retained version — the lakehouse
  * primitive behind reproducible training runs ("train on corpus
  * v=12") and debugging ("what did the golden table say before
  * yesterday's load?"). The streaming side already leans on the same
  * layout for crash-safe plan publication
  * (`stream/Jobs.runPlanRecomputeStream`); this is the batch-facing
  * surface.
  *
  * Publishing is stage-then-rename: the snapshot is written under a
  * hidden `.staging-v=<version>` directory and renamed into place
  * only once the write (and its `_SUCCESS` marker) completed — a
  * concurrent reader can never resolve a half-written snapshot,
  * because [[latestVersion]] additionally gates on the `_SUCCESS`
  * marker inside each version directory (rename is atomic on
  * HDFS/local; on object stores where it is copy+delete, the marker
  * gate still holds). Re-publishing an existing version is refused —
  * published snapshots are immutable, which is what makes readers of
  * v=N isolated from the v=N+1 writer (snapshot isolation via
  * immutability). Retention is the caller's sweep.
  *
  * Scale: a snapshot write is one parquet dump of the table; reads
  * prune to exactly one version directory (a disk path filter, no
  * partition scan of other versions).
  */
object Versioned {

  private def isPublished(
      fs: org.apache.hadoop.fs.FileSystem,
      vPath: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(vPath, "_SUCCESS"))

  /** Publish `df` as version `version` (complete snapshot).
    * Stage-then-rename; refuses to overwrite a published version.
    */
  def publish(df: DataFrame, path: String, version: Long): Unit = {
    require(version >= 0, "version must be >= 0")
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vPath = new org.apache.hadoop.fs.Path(s"$path/v=$version")
    require(!isPublished(fs, vPath),
      s"version $version already published under $path — versions are immutable")
    val staging = new org.apache.hadoop.fs.Path(s"$path/.staging-v=$version")
    // a crashed earlier attempt may have left a stale staging dir (or
    // a marker-less half-renamed target) — both are unpublished, safe
    // to clear
    if (fs.exists(staging)) fs.delete(staging, true)
    if (fs.exists(vPath)) fs.delete(vPath, true)
    df.write.mode("overwrite").parquet(staging.toString)
    require(isPublished(fs, staging),
      s"staging write for version $version produced no _SUCCESS marker")
    require(fs.rename(staging, vPath),
      s"rename of staged version $version into place failed under $path")
  }

  /** Largest published version, −1 if none (object-store-safe: the
    * Hadoop FileSystem API, never java.io). A directory without its
    * `_SUCCESS` marker is in-flight or torn — not published.
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) -1L
    else fs.listStatus(hPath).iterator
      .filter(s => s.getPath.getName.startsWith("v=") &&
        isPublished(fs, s.getPath))
      .map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** The table AS OF `version`. Refuses an unpublished version loudly
    * rather than returning an empty frame.
    */
  def readAsOf(spark: SparkSession, path: String, version: Long): DataFrame = {
    val vPath = new org.apache.hadoop.fs.Path(s"$path/v=$version")
    val fs = vPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(isPublished(fs, vPath),
      s"version $version not published under $path")
    spark.read.parquet(vPath.toString)
  }

  /** The table as of the latest published version. */
  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path)
    require(v >= 0, s"no versions published under $path")
    readAsOf(spark, path, v)
  }
}
