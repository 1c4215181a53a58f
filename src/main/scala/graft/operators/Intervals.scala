package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval merging (gaps-and-islands): coalesce overlapping or
  * touching [start, end) intervals per key into maximal islands —
  * availability windows, coverage spans, session reach unioning.
  *
  * The classic distributed formulation: one key-partitioned sort
  * carries (a) the running `max(end)` over all PRECEDING rows, (b) the
  * new-island flag (`start` strictly beyond everything seen), and
  * (c) the island id (running sum of flags); a keyed aggregation then
  * collapses each island. No join, no self-comparison — cost is one
  * Exchange + sort regardless of how many intervals overlap.
  *
  * Strictly-greater comparison means back-to-back intervals
  * (`end == next start`) MERGE; callers wanting half-open adjacency to
  * split can pre-shrink ends by an epsilon.
  */
object Intervals {

  /** One row per merged island: (key, island, interval_start,
    * interval_end), island numbered 1..n per key in time order.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("s").asc, col("e").asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("key"), col(startCol).as("s"), col(endCol).as("e"))
      .withColumn("prev_max_e", max(col("e")).over(wPrev))
      .withColumn("is_new",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(wRun))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("interval_start"), max(col("e")).as("interval_end"))
  }
}
