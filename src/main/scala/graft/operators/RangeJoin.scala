package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second join shape Spark's
  * built-in equi-join machinery can't express directly (the first,
  * as-of, is [[AsofJoin]]). A naive formulation
  * (`points.join(intervals, key && start <= p && p <= end)`) plans as
  * a broadcast-nested-loop / cartesian at scale because there is no
  * equality on the time axis.
  *
  * This implementation restores a usable equi-key by BUCKETING time:
  * each interval explodes into the fixed-width buckets it overlaps,
  * each point lands in exactly ONE bucket, and the join runs on
  * (key, bucket) followed by the exact range predicate — the standard
  * interval-blocking design. Cost is O(points + intervals × spanned
  * buckets) through a hash join; each (point, interval) match is found
  * exactly once (the point's single bucket), so no dedup pass is
  * needed. Pick `bucketWidthSec` near the typical interval length:
  * too narrow multiplies the interval explode, too wide grows the
  * per-bucket verify fan-in.
  */
object RangeJoin {

  private def bucketOf(ts: Column, widthSec: Long): Column =
    floor(ts.cast("long") / widthSec).cast("long")

  /** Inner point-in-interval join: rows of `points` paired with every
    * interval of the same `keyCol` where
    * `startCol <= pointCol <= endCol` (inclusive bounds). All columns
    * of both inputs survive (interval columns under their own names —
    * callers alias beforehand on a clash).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long = 3600L): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(
        bucketOf(col(startCol), bucketWidthSec),
        bucketOf(col(endCol), bucketWidthSec))))
    points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidthSec))
      .join(exploded, Seq(keyCol, "__bucket"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
