package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each right-side row, attach the payload of the
  * LATEST left-side row with `ts <= right.ts` for the same key — the
  * canonical tick-data operator (last trade before each quote, last
  * click before each purchase).
  *
  * Spark has no asof join; per the preference order (SURVEY.md §7.3 /
  * builder brief (a)) this COMPOSES built-ins instead of adding a
  * physical operator: union both sides, one window per key ordered by
  * (ts, side, tie), propagate the last non-null left payload forward.
  * Cost = one shuffle on the key + one sort — identical to what a
  * dedicated sort-merge AsofJoinExec would do, but it inherits AQE,
  * codegen, and spill handling for free. Left rows at exactly the
  * right row's timestamp match (<=), mirroring `ASOF JOIN ... ON
  * r.ts >= l.ts` semantics.
  */
object AsofJoin {

  /** @param left     rows providing the as-of payload
    * @param right    rows to enrich (all columns preserved)
    * @param keyCol   equi-join key present on both sides
    * @param tsCol    event-time column present on both sides
    * @param tieCol   unique-per-(key, ts) column on both sides — makes
    *                 the window order total, so results are
    *                 deterministic even with duplicate timestamps
    * @param payload  left columns to attach (null when no left row is
    *                 at-or-before the right row — LEFT asof semantics)
    */
  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      payload: Seq[String],
      payloadPrefix: String = "asof_"): DataFrame = {
    val payloadStruct = struct(payload.map(col): _*).as("__asof_payload")
    val l = left.select(
      Seq(col(keyCol), col(tsCol), col(tieCol).as("__tie"),
        lit(0).as("__side"), payloadStruct): _*)

    val rightCols = right.columns.toIndexedSeq
    val r = right.select(
      Seq(col(keyCol), col(tsCol), col(tieCol).as("__tie"), lit(1).as("__side"),
        lit(null).cast(l.schema("__asof_payload").dataType).as("__asof_payload")) ++
        rightCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c).as(s"__r_$c")): _*)

    val merged = l
      .select(r.columns.toIndexedSeq.map(c =>
        if (l.columns.contains(c)) col(c)
        else lit(null).cast(r.schema(c).dataType).as(c)): _*)
      .unionByName(r)

    // left rows sort before right rows at equal ts (side 0 < 1) → "<="
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val attached = merged
      .withColumn("__last_payload", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val restored = rightCols.map {
      case c if c == keyCol || c == tsCol => col(c)
      case c => col(s"__r_$c").as(c)
    } ++ payload.map(p => col(s"__last_payload.$p").as(s"$payloadPrefix$p"))
    attached.select(restored: _*)
  }
}
