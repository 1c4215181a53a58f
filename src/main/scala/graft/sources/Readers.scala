package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source-side readers (O-01..O-05): JSON with inference, declared-schema
  * enforcement at the Silver boundary, recursive scans, corrupt-record
  * capture.
  *
  * The reference lands driver-fetched JSON via an RDD shim
  * (ref: glue/data_ingestion_s3.py:30-31 `spark.read.json(rdd)`); the
  * Spark-native equivalent is `spark.read.json(Dataset[String])` —
  * same inference semantics, no RDD API.
  */
object Readers {

  /** Compressed-TEXT source: a binary column of (possibly
    * multi-member) gzip payloads → UTF-8 text, decoded per partition
    * by the from-scratch [[graft.ext.Gzip]] (own DEFLATE, CRC-32 +
    * ISIZE verified per member). Corrupt payloads surface as null
    * text (the O-05 corrupt-record discipline) so DLQ callers can
    * split — never an executor crash. The decode touches payload
    * bytes exactly once; everything downstream is columnar.
    */
  def gzipText(spark: SparkSession, media: DataFrame, partitions: Int,
      maxOut: Int = 1 << 26): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[graft.ext.Multimodal.MediaRecord]
      .mapPartitions(_.map(r => (r.media_id,
        graft.ext.Gzip.decompress(r.payload, maxOut)
          .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
          .orNull)))
      .toDF("doc_id", "text")
  }

  /** O-02: in-memory JSON strings → DataFrame with schema inference. */
  def jsonStrings(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }

  /** O-03: recursive JSON scan of a landing prefix (JSONL, not
    * multiline — ref: glue/data_transform_s3.py:50 `multiline: False`).
    */
  def jsonRecursive(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .option("multiLine", "false")
      .json(dir)

  /** Declared-schema JSON read with corrupt-record capture (O-63):
    * unparseable lines land in `_corrupt_record` instead of failing
    * the job (PERMISSIVE is Spark's default; made explicit here).
    */
  def jsonWithSchema(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
  }

  /** O-05: parse a `value: string` column of JSON payloads (the Kinesis
    * record shape) against a declared schema; rows that fail to parse
    * keep the raw string and flag corrupt → route-able (O-63).
    * True parse failure is detected via PERMISSIVE `from_json`'s
    * corrupt-record capture (schema extended internally), so a
    * legitimately empty `{}` or all-null-fields payload is NOT
    * misrouted as corrupt. The capture column name is passed
    * EXPLICITLY (not inherited from the session's
    * `spark.sql.columnNameOfCorruptRecord` default) and uses a
    * collision-resistant internal name, so a payload that legitimately
    * contains a `_corrupt_record` key parses cleanly; the caller's
    * schema must not declare the internal name itself.
    */
  def parseJsonColumn(df: DataFrame, schema: StructType): DataFrame = {
    val corruptCol = "__graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol),
      s"input schema must not declare the internal column $corruptCol")
    val withCorrupt = schema.add(corruptCol, "string")
    df.withColumn("__parsed_raw",
        from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corruptCol)))
      .withColumn("is_corrupt",
        col("__parsed_raw").isNull ||
          col(s"__parsed_raw.$corruptCol").isNotNull)
      .withColumn("parsed", col("__parsed_raw").dropFields(corruptCol))
      .drop("__parsed_raw")
  }

  /** O-04: parquet scan (kept for symmetry with Tables). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Declared-schema CSV read with corrupt-record capture — the
    * [[jsonWithSchema]] discipline on the single most common
    * real-world tabular drop (north-star scope: the reference lands
    * JSON only). Rows with ANY type-failed token land intact in
    * `_corrupt_record` (PERMISSIVE) instead of failing the job or
    * silently polluting the typed columns, so DLQ callers split on
    * one scan.
    *
    * Deliberately text-scan + `from_csv`, NOT `spark.read.csv`: the
    * native reader's column pruning only PARSES the referenced
    * columns, so a type failure in an unreferenced column is never
    * detected and the row silently rides the good side of the split
    * (observed: a corrupt o_orderkey passing a status rollup). The
    * struct parse always evaluates the full declared schema, making
    * the corrupt verdict plan-independent. Cost: no per-column
    * parse pruning — correct-over-fast for a DLQ boundary; trim the
    * schema if only a subset matters. Limitation: line-grain split,
    * so quoted fields must not embed newlines (multiLine CSV needs
    * the native reader).
    *
    * Headerless only (the declared schema IS the contract — headered
    * drops strip the header upstream or use the native reader); pass
    * `options` for delimiter/format variants.
    */
  def csvWithSchema(spark: SparkSession, dir: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val corruptCol = "_corrupt_record"
    require(!schema.fieldNames.contains(corruptCol),
      s"input schema must not declare $corruptCol")
    require(!options.get("header").exists(_.toBoolean),
      "csvWithSchema is headerless (line-grain from_csv parse)")
    val withCorrupt = schema.add(corruptCol, "string")
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corruptCol) ++ options
    spark.read.text(dir)
      .select(from_csv(col("value"), withCorrupt, opts).as("__r"))
      .select(col("__r.*"))
  }
}
