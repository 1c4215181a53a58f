package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-record validation, reason accumulation, good/bad routing and
  * threshold alerting (ref: streaming/consumer.py:21-24,47-57,86-92).
  *
  * Pure `DataFrame => DataFrame` column logic — usable identically in
  * batch and Structured Streaming (SURVEY.md §7.1 stream/Validate). The
  * reference evaluates these rules row-at-a-time in Python; here they
  * are Catalyst predicates inside whole-stage codegen.
  */
final case class ValidationRule(reason: String, bad: Column)

object Validate {

  /** Faithful port of the consumer's thresholds
    * (ref: streaming/consumer.py:21-24): Decimal literals so threshold
    * compares stay exact (SURVEY.md §7.4.7).
    */
  def cryptoRules: Seq[ValidationRule] = {
    def d(s: String) = lit(new java.math.BigDecimal(s))
    Seq(
      ValidationRule("Invalid or zero price", col("current_price").isNull || col("current_price") <= d("0")),
      ValidationRule("Price below threshold", col("current_price").isNotNull && col("current_price") > d("0") && col("current_price") < d("0.01")),
      ValidationRule("Market cap below threshold", col("market_cap").isNull || col("market_cap") < d("1000000")),
      ValidationRule("Extreme price drop", col("price_change_percentage_24h").isNotNull && col("price_change_percentage_24h") < d("-15")))
  }

  /** Alert predicate (ref: streaming/consumer.py:86): 24h change > +10%. */
  def cryptoAlert: Column = col("price_change_percentage_24h") > lit(new java.math.BigDecimal("10"))

  /** O-60: annotate rows with accumulated failure reasons
    * (" | "-joined, ref: streaming/consumer.py:63) and validity.
    * `filter(arr, !isNull)` drops non-matching `when`s, mirroring the
    * reference's `error_reasons` list append.
    */
  def annotate(df: DataFrame, rules: Seq[ValidationRule]): DataFrame = {
    val reasons = filter(
      array(rules.map(r => when(r.bad, lit(r.reason))): _*),
      _.isNotNull)
    df.withColumn("__reasons", reasons)
      .withColumn("is_valid", size(col("__reasons")) === 0)
      .withColumn("error_reason", concat_ws(" | ", col("__reasons")))
      .drop("__reasons")
  }

  /** O-61: good/bad routing — two complementary filters over one
    * (cacheable) annotated frame; in streaming, called inside
    * `foreachBatch` on the persisted batch.
    */
  def split(df: DataFrame, rules: Seq[ValidationRule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.filter(col("is_valid")), annotated.filter(!col("is_valid")))
  }

  /** O-62: threshold alerting (ref: streaming/consumer.py:86-92). */
  def alerts(df: DataFrame, alertPred: Column): DataFrame = df.filter(alertPred)
}
