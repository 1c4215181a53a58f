package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity audit + enforcement (Sweeney 2002): the release-gate
  * a dataset with quasi-identifiers needs before leaving the curation
  * pipeline — PII REDACTION (`Text.redactPii`) removes direct
  * identifiers; re-identification risk lives in the quasi-identifier
  * COMBINATIONS (type × day × value band …), which is a grouping
  * property, not a regex.
  *
  * Both forms are one keyed shuffle on the QI tuple: the report is a
  * partial-aggregated groupBy; enforcement is a window count over the
  * same key (no join back, no second shuffle — the count rides the
  * same partitioning). At 100 TB both are textbook keyed aggregations.
  */
object Privacy {

  /** Equivalence classes over the quasi-identifier columns with their
    * sizes and the `at_risk` verdict (size < k). `qi` are named
    * expressions (`expr.as("name")`) — the class table is the audit
    * artifact a privacy review reads.
    */
  def kAnonymityClasses(df: DataFrame, qi: Seq[Column], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** The dataset with every row whose QI class is smaller than k
    * SUPPRESSED (dropped) — record suppression, the conservative
    * enforcement. The class size is computed with a window over the
    * same QI key, so enforcement costs exactly one keyed shuffle and
    * keeps every input column.
    */
  def enforceKAnonymity(df: DataFrame, qi: Seq[Column], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(qi: _*)
    df.withColumn("__class_size", count(lit(1)).over(w))
      .filter(col("__class_size") >= k)
      .drop("__class_size")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity
    * bounds class SIZE, but a large class whose rows all share one
    * sensitive value still leaks it (the homogeneity attack) — each
    * QI class also needs ≥ l DISTINCT sensitive values. Same single
    * keyed shuffle as [[kAnonymityClasses]]; the distinct count
    * compiles to a partial-distinct aggregate on the same key (null
    * sensitive values don't count as a value, matching SQL
    * `count(DISTINCT ...)`).
    */
  def lDiversityClasses(
      df: DataFrame, qi: Seq[Column], sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Record suppression for l-diversity: drop every row whose QI
    * class has fewer than l distinct sensitive values. Windows can't
    * express `count(DISTINCT) OVER`, so the distinct count rides the
    * SAME keyed sort as a dense_rank max (nulls sort first and all
    * take rank 1, so subtracting the any-null indicator matches the
    * audit's null-excluding count) — still one keyed shuffle, no join
    * back, every input column kept.
    */
  def enforceLDiversity(
      df: DataFrame, qi: Seq[Column], sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    require(!df.columns.exists(Set("__dr", "__nsens", "__has_null")),
      "input must not already contain __dr/__nsens/__has_null columns")
    val wOrd = Window.partitionBy(qi: _*).orderBy(sensitive.asc)
    val wAll = Window.partitionBy(qi: _*)
    df.withColumn("__dr", dense_rank().over(wOrd))
      .withColumn("__nsens",
        max(col("__dr")).over(wAll) -
          max(when(sensitive.isNull, 1).otherwise(0)).over(wAll))
      .filter(col("__nsens") >= l)
      .drop("__dr", "__nsens")
  }
}
