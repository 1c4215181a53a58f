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
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read the
    * nanos as long (legacy conf) and truncate to microsecond
    * timestamps — the same truncation DuckDB applies, so oracle parity
    * holds.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }

  /** ns-epoch long → µs timestamp (floor division keeps ordering). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Streaming view of the events table (same ns→µs normalization). */
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
