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
  * Publishing is an atomic-enough directory write (parquet overwrite
  * into the version directory; the version only becomes the latest
  * once its directory lists), never an in-place mutation — readers of
  * v=N are isolated from the v=N+1 writer by construction (snapshot
  * isolation via immutability). Retention is the caller's sweep.
  *
  * Scale: a snapshot write is one parquet dump of the table; reads
  * prune to exactly one version directory (a disk path filter, no
  * partition scan of other versions).
  */
object Versioned {

  /** Publish `df` as version `version` (complete snapshot). */
  def publish(df: DataFrame, path: String, version: Long): Unit = {
    require(version >= 0, "version must be >= 0")
    df.write.mode("overwrite").parquet(s"$path/v=$version")
  }

  /** Largest published version, −1 if none (object-store-safe: the
    * Hadoop FileSystem API, never java.io).
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) -1L
    else fs.listStatus(hPath).iterator.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** The table AS OF `version`. Refuses an unpublished version loudly
    * rather than returning an empty frame.
    */
  def readAsOf(spark: SparkSession, path: String, version: Long): DataFrame = {
    val vPath = new org.apache.hadoop.fs.Path(s"$path/v=$version")
    val fs = vPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(vPath), s"version $version not published under $path")
    spark.read.parquet(vPath.toString)
  }

  /** The table as of the latest published version. */
  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path)
    require(v >= 0, s"no versions published under $path")
    readAsOf(spark, path, v)
  }
}
