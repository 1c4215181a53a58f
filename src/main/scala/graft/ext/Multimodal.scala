package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode/feature-extract
  * plumbing a training-data pipeline needs.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * container) behind [[FakeDecoder]] — a clearly-marked deterministic
  * fake. Everything Spark-side is real: schema, partitioning, the
  * per-partition batch iteration shape a JNI/FFI decoder would plug
  * into, and the metadata expressions (oracle-checked).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)

  /** Decoded features produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      features: Array[Float])

  /** STUB: deterministic fake decoder standing in for a real
    * image/audio decode (???: replace with an actual codec binding —
    * e.g. libjpeg/ffmpeg via FFI — when available). Features are a
    * fixed-size byte histogram so tests are reproducible.
    */
  object FakeDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % featureDim) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** Wrap an (id, string payload) frame as a media table — binary
    * payload plus metadata columns computed in-plan (codegen'd):
    * byte length and a content-addressed sha256.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mime"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("sha256", sha2(col("payload"), 256))

  /** Frame sampling for video-like payloads: treat the binary as
    * fixed-size frames and keep every `every`-th one — in-plan
    * (`substring` on binary is codegen'd), so sampling happens during
    * the scan, before any decode cost. The frame size is metadata a
    * real container format would provide; the byte math is real, the
    * "frames" here are synthetic.
    */
  def frameSample(payload: org.apache.spark.sql.Column, frameSize: Int, every: Int)
      : org.apache.spark.sql.Column = {
    val nFrames = floor(octet_length(payload) / frameSize)
    val lastIdx = greatest(((nFrames - 1) / every).cast("long"), lit(0L))
    transform(
      sequence(lit(0L), lastIdx),
      i => substring(payload, (i * every * frameSize + 1).cast("int"), lit(frameSize)))
  }

  /** STUB resize: deterministic byte decimation standing in for an
    * image downscale (???: wire a real scaler via FFI when available).
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] =
    payload.grouped(factor).map(_.head).toArray

  /** Decode/feature-extract over partitions. `mapPartitions` is the
    * deliberate choice here (SURVEY.md §7.3 preference (d) applies to
    * relational ops — media decode is genuine per-partition imperative
    * work): each partition amortizes decoder init, the iterator shape
    * matches batch-oriented codecs, and `repartition(media_id)` upstream
    * spreads decode cost evenly across executors.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // decoder init would happen once per partition here
        it.map { r =>
          MediaFeatures(r.media_id, r.mime, r.payload.length, FakeDecoder.decode(r.payload))
        }
      }
  }
}
