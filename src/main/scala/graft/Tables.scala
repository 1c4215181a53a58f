package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Plays the role of the reference's S3 Parquet scans
  * (ref: glue/data_aggregate_gold.py:25,74,118 — `spark.read.parquet`).
  * Parquet scans give Catalyst column pruning + predicate pushdown for
  * free; callers should select/filter early so pruning reaches the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events table's `ts` column has shipped in two generations:
    * parquet TIMESTAMP(NANOS) — which Spark 4 refuses to read as a
    * timestamp ([PARQUET_TYPE_ILLEGAL]), so it is read as a nanos long
    * (legacy conf) and truncated to microseconds, the same truncation
    * DuckDB applies — and plain TIMESTAMP(MICROS), which reads
    * natively (as NTZ; normalized to session-TZ TimestampType, a
    * wall-clock no-op in the UTC sessions this library pins).
    * [[normalizeEventTs]] branches on the LOADED dtype, so both
    * generations produce the identical µs TimestampType column. The
    * legacy conf is needed only while the reader resolves a nanos file
    * schema (harmless otherwise), and is saved/restored here rather
    * than leaking a session-wide behavior change onto other reads.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark)(normalizeEventTs(load(spark, dir, "events")))

  private def withNanosAsLong[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** `ts` → µs TimestampType, whatever generation the file is:
    * ns-epoch long gets floor-divided to µs (ordering-preserving, the
    * DuckDB truncation); native NTZ micros cast to session-TZ
    * TimestampType (UTC sessions ⇒ same wall clock); already-TZ
    * timestamps pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Streaming view of the events table (same ns→µs normalization).
    * NOTE: the nanosAsLong conf must stay set for the stream's lifetime
    * (micro-batch scans re-resolve files), so it is deliberately NOT
    * restored here — callers run streaming verification in a session
    * they own (Jobs.runValidationStream). A per-read datasource option
    * (`.option("spark.sql.legacy.parquet.nanosAsLong", "true")`) was
    * probed on Spark 4.1.2 and does NOT reach parquet schema
    * resolution (PARQUET_TYPE_ILLEGAL persists for both batch and
    * stream readers) — the session conf is the only lever, and
    * ContractSpec pins both this lifetime behavior and the batch
    * path's save/restore.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val raw = spark.read.parquet(path).schema
    // file-source streams list a directory; glob-filter to the one table
    normalizeEventTs(
      spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
