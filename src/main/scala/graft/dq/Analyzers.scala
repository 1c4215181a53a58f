package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style column profilers (ref: glue/data_quality_pydeequ.py:41-64),
  * re-expressed as a single distributed `agg(...)` pass.
  *
  * The reference runs PyDeequ's AnalysisRunner with Size, Completeness,
  * Uniqueness, Mean, StandardDeviation, Minimum, Maximum and
  * ApproxCountDistinct analyzers. All but Uniqueness collapse into ONE
  * aggregation over one scan here (the reference's runner does the same
  * on the JVM); Uniqueness (value → count → fraction occurring exactly
  * once) stacks every requested column into one further job and is
  * unioned in.
  *
  * Output shape mirrors `successMetricsAsDataFrame`
  * (ref: glue/data_quality_pydeequ.py:61): (entity, instance, name, value).
  */
final case class Metric(entity: String, instance: String, name: String, agg: Column)

object Analyzers {

  /** O-32 Size. */
  def size: Metric = Metric("Dataset", "*", "Size", count(lit(1)).cast("double"))

  /** O-33 Completeness: fraction of non-null values. */
  def completeness(c: String): Metric =
    Metric("Column", c, "Completeness", count(col(c)).cast("double") / count(lit(1)))

  /** O-35 Mean. */
  def mean(c: String): Metric = Metric("Column", c, "Mean", avg(col(c)))

  /** O-36 StandardDeviation — Deequ uses population stddev. */
  def standardDeviation(c: String): Metric =
    Metric("Column", c, "StandardDeviation", stddev_pop(col(c)))

  /** O-37 Minimum / Maximum. */
  def minimum(c: String): Metric = Metric("Column", c, "Minimum", min(col(c)).cast("double"))
  def maximum(c: String): Metric = Metric("Column", c, "Maximum", max(col(c)).cast("double"))

  /** O-38 ApproxCountDistinct — Spark's HLL++, same sketch family as
    * Deequ's. Not oracle-comparable across engines (approximate).
    */
  def approxCountDistinct(c: String): Metric =
    Metric("Column", c, "ApproxCountDistinct", approx_count_distinct(col(c)).cast("double"))

  /** Exact distinct count — oracle-checkable stand-in for O-38. */
  def countDistinct(c: String): Metric =
    Metric("Column", c, "CountDistinct", count_distinct(col(c)).cast("double"))

  /** Exact median (interpolated for even counts — Deequ exposes it as
    * ApproxQuantile(0.5); the exact form is cross-engine checkable).
    */
  def exactMedian(c: String): Metric = Metric("Column", c, "Median", median(col(c)))

  /** Approximate quantile via Greenwald-Khanna/percentile_approx —
    * the sketch path for 100 TB profiling (not oracle-comparable).
    */
  def approxQuantile(c: String, q: Double, accuracy: Int = 1000): Metric =
    Metric("Column", c, s"ApproxQuantile_$q",
      percentile_approx(col(c), lit(q), lit(accuracy)).cast("double"))

  /** All uniqueness fractions in ONE job: stack (column, value) pairs
    * with an explode, then a two-level aggregate — one scan and one
    * shuffle for N columns, instead of N full scans (values ride the
    * shuffle as strings; within a column the cast is injective enough
    * for grouping, and cross-column collisions can't happen because
    * the column name is part of the key). Output: (c, u) — one row per
    * column with its unique-fraction (value occurring exactly once).
    */
  def uniquenessFractions(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .groupBy(col("kv.c").as("c"), col("kv.v").as("v"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("c"))
      .agg((sum(when(col("__cnt") === 1, 1L).otherwise(0L)).cast("double") /
        sum(col("__cnt")).cast("double")).as("u"))

  /** Robust per-group outlier profile: median / MAD (median absolute
    * deviation) and the count of values farther than `k`·MAD from the
    * group median — the standard heavy-tail-safe outlier rule (mean/
    * stddev break down when the outliers themselves inflate the
    * spread).
    *
    * Shape: two exact-median aggregations and a final count, all keyed
    * on the group column; the tiny per-group stat frames ride back via
    * AQE-chosen broadcast joins, so the detail rows shuffle on the
    * group key only. Exact medians are deliberate — this is the
    * profiling path; a 100 TB monitoring loop swaps in the mergeable
    * KLL sketch aggregate for the same rule shape.
    */
  def robustOutlierStats(
      df: DataFrame, groupCol: String, valueCol: String, k: Double): DataFrame = {
    val med = df.groupBy(col(groupCol)).agg(median(col(valueCol)).as("med"))
    val withDev = df.select(col(groupCol), col(valueCol))
      .join(med, groupCol)
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(first(col("med")).as("med"), median(col("adev")).as("mad"))
    withDev.drop("med")
      .join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("adev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"))
  }

  /** Equal-width histogram of an integer-valued column: the standard
    * corpus-profiling pass (length/size distributions at a glance).
    * Bucket index is exact integer arithmetic —
    * `((x − lo)·buckets) div (hi − lo + 1)` — so every boundary is
    * engine-portable with no float edge cases; `+1` keeps the max value
    * inside the last bucket. Global lo/hi is a one-row aggregate
    * cross-joined back as a broadcast, then one map pass + one keyed
    * count: O(buckets) output regardless of input size. Empty buckets
    * are absent (no zero-fill) — callers needing dense output join a
    * `sequence(0, buckets−1)` spine.
    */
  def equalWidthHistogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val stats = df.agg(
      min(col(c)).cast("long").as("__lo"), max(col(c)).cast("long").as("__hi"))
    df.select(col(c).cast("long").as("__v"))
      .crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(expr(s"((__v - __lo) * $buckets) div (__hi - __lo + 1)")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("lo_val"), max(col("__v")).as("hi_val"))
  }

  /** Run all single-pass metrics in one aggregation, then unpivot to the
    * long metrics shape. `uniquenessCols` adds O-34 Uniqueness rows
    * (fraction of rows whose value occurs exactly once — NOT
    * countDistinct/count; SURVEY.md §7.4.3), all computed in ONE extra
    * job via [[uniquenessFractions]]. No collects; output is a tiny
    * DataFrame.
    */
  def run(df: DataFrame, metrics: Seq[Metric], uniquenessCols: Seq[String] = Nil): DataFrame = {
    val aggd = df.agg(
      metrics.head.agg.as("m0"),
      metrics.tail.zipWithIndex.map { case (m, i) => m.agg.as(s"m${i + 1}") }: _*)
    val long = aggd.select(explode(array(metrics.zipWithIndex.map { case (m, i) =>
      struct(
        lit(m.entity).as("entity"),
        lit(m.instance).as("instance"),
        lit(m.name).as("name"),
        col(s"m$i").cast("double").as("value"))
    }: _*)).as("r")).select("r.*")

    val uniq =
      if (uniquenessCols.isEmpty) Nil
      else Seq(uniquenessFractions(df, uniquenessCols).select(
        lit("Column").as("entity"), col("c").as("instance"),
        lit("Uniqueness").as("name"), col("u").cast("double").as("value")))
    uniq.foldLeft(long)(_.unionByName(_))
  }

  /** Distribution drift between two dataset versions over a
    * categorical column: per-category counts from each side plus the
    * category's Population Stability Index term
    * (p − q)·ln(p / q), with add-one smoothing over the UNION
    * category set so categories present on only one side contribute
    * finite terms (the standard PSI treatment for empty buckets).
    * Σ psi_term is the headline PSI (< 0.1 stable, > 0.25 action —
    * the usual credit-scoring rule of thumb).
    *
    * Shape: one keyed count per side, a full-outer join on the
    * category, and the three totals (N_old, N_new, |union|) as a
    * broadcast 1-row frame (the q53/q57 single-row-stats idiom) —
    * two keyed shuffles total, nothing collected, linear in distinct
    * categories. `psi_term` rounds at 6 dp AFTER the ln so the one
    * libm call is the only cross-engine float risk (q94's class).
    */
  /** [[categoryDrift]] over a NUMERIC column: values land in `n`
    * equal-width buckets on the caller-fixed [lo, hi) range (fixed —
    * not data-derived — so the binning is stable across versions,
    * which is the point of a drift monitor; out-of-range values clamp
    * into the edge buckets, the standard PSI treatment). The bucket
    * index is exact integer arithmetic on top of one IEEE division,
    * so both engines bin identically; the PSI math is inherited.
    */
  def numericDrift(
      oldDf: DataFrame, newDf: DataFrame, numCol: String,
      lo: Double, hi: Double, n: Int): DataFrame = {
    require(n > 0, "need at least one bucket")
    require(lo < hi, "lo must be < hi")
    def bucketed(df: DataFrame): DataFrame = df.select(
      least(lit(n - 1), greatest(lit(0),
        floor((col(numCol).cast("double") - lo) / ((hi - lo) / n)).cast("int")))
        .as("bucket"))
    categoryDrift(bucketed(oldDf), bucketed(newDf), "bucket")
  }

  /** EXACT two-sample Kolmogorov–Smirnov drift over an integral
    * column: D = sup_v |F_old(v) − F_new(v)|, reported as the argmax
    * row (location, exact numerator, totals, and the rounded
    * statistic). Complements [[numericDrift]]/[[categoryDrift]]'s
    * binned PSI with a bin-free distribution distance.
    *
    * Exactness: CDF comparison is CROSS-MULTIPLIED —
    * d_num = |cum_old·n_new − cum_new·n_old| — so the supremum and its
    * argmax (ties → lowest value) are pure long arithmetic; the only
    * float is the final display division. Exact while
    * n_old·n_new < 2⁶³ (~3·10⁹ rows per side; widen to DECIMAL past
    * that).
    *
    * 100 TB posture: one value-keyed shuffle for per-value counts,
    * then TWO-PHASE prefix sums (the q97b/q105 discipline) — the only
    * ordered window over unbounded data is per-bucket; the global pass
    * is a single-partition window over O(#buckets) bucket totals.
    * `div`-bucketing is monotone in v (truncating division is
    * monotone), so bucket-then-value order IS value order. The final
    * argmax is TakeOrdered(1), not a global sort.
    */
  def ksDrift(
      oldDf: DataFrame, newDf: DataFrame, numCol: String,
      bucketWidth: Long = 64L): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val u = oldDf
      .select(col(numCol).cast("long").as("v"),
        lit(1L).as("a"), lit(0L).as("b"))
      .unionByName(newDf.select(col(numCol).cast("long").as("v"),
        lit(0L).as("a"), lit(1L).as("b")))
    val pv = u.groupBy(col("v"))
      .agg(sum(col("a")).as("c_old"), sum(col("b")).as("c_new"))
      .withColumn("bucket", expr(s"v div $bucketWidth"))
    val bucketTotals = pv.groupBy(col("bucket"))
      .agg(sum(col("c_old")).as("bo"), sum(col("c_new")).as("bn"))
    val totals = bucketTotals
      .agg(sum(col("bo")).as("n_old"), sum(col("bn")).as("n_new"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.select(col("bucket"),
      coalesce(sum(col("bo")).over(wOff), lit(0L)).as("off_old"),
      coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off_new"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pv.join(broadcast(offsets), Seq("bucket"))
      .select(col("v"),
        (col("off_old") + sum(col("c_old")).over(wIn)).as("cum_old"),
        (col("off_new") + sum(col("c_new")).over(wIn)).as("cum_new"))
      .crossJoin(broadcast(totals))
      .select(col("v").as("at_value"),
        abs(col("cum_old") * col("n_new") - col("cum_new") * col("n_old"))
          .as("d_num"),
        col("n_old"), col("n_new"))
      .withColumn("ks", round(col("d_num").cast("double") /
        nullif(col("n_old") * col("n_new"), lit(0L)), 6))
      .orderBy(col("d_num").desc, col("at_value").asc)
      .limit(1)
  }

  /** Key-skew audit: the top-N heaviest keys with their row share and
    * the salt factor a skewed join/aggregation on this key would need
    * — the report behind every `q43`/`q75`-style salting decision
    * (measure the skew, THEN pick the salt count, instead of guessing).
    * For each of the heaviest keys:
    *
    *   share_ppm       = n_rows·10⁶ div total_rows
    *   suggested_salts = ⌈n_rows · n_keys / total⌉ — how many
    *                     average-key units this key occupies, i.e. the
    *                     sub-split count that levels it with the mean.
    *
    * One keyed count aggregation (partial-agg'd) + a TakeOrdered
    * top-N; the totals ride a broadcast cross join. All truncating
    * long arithmetic — the report replays exactly.
    */
  def skewReport(df: DataFrame, keyCol: Column, topN: Int = 10): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val counts = df.select(keyCol.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n_rows"),
        expr("n_rows * 1000000 div total").as("share_ppm"),
        expr("(n_rows * n_keys + total - 1) div total").as("suggested_salts"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topN)
  }

  /** Mutual information between two categorical columns, as the
    * per-cell term table: mi_term = (c_xy/n)·ln(c_xy·n/(c_x·c_y)),
    * rounded to 6 dp — the dependence profile behind feature
    * selection and leakage hunts ("does source predict label?"),
    * where correlation only sees linear numeric relations. Σ terms =
    * MI; every input to the one ln is an exact integer, so the table
    * replays (the q116 ln discipline). Empty cells contribute zero
    * and are omitted (their limit is 0).
    *
    * One joint aggregation (the corpus-sized pass); marginals and the
    * 1-row total ride broadcast joins.
    */
  def mutualInformation(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val joint = df.select(xCol.as("x"), yCol.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val my = joint.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = joint.agg(sum(col("n_xy")).as("n"))
    joint
      .join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        round((col("n_xy").cast("double") / col("n")) *
          log(col("n_xy").cast("double") * col("n") /
            (col("n_x").cast("double") * col("n_y"))), 6).as("mi_term"))
  }

  def categoryDrift(oldDf: DataFrame, newDf: DataFrame, catCol: String): DataFrame = {
    val o = oldDf.select(col(catCol).as("category"))
      .groupBy("category").agg(count(lit(1)).as("n_old"))
    val n = newDf.select(col(catCol).as("category"))
      .groupBy("category").agg(count(lit(1)).as("n_new"))
    val joined = o.join(n, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(
      sum(col("n_old")).as("tot_old"),
      sum(col("n_new")).as("tot_new"),
      count(lit(1)).as("n_categories"))
    joined.crossJoin(broadcast(totals))
      .select(col("category"), col("n_old"), col("n_new"),
        round(
          ((col("n_old") + 1).cast("double") / (col("tot_old") + col("n_categories")) -
            (col("n_new") + 1).cast("double") / (col("tot_new") + col("n_categories"))) *
            log(((col("n_old") + 1).cast("double") / (col("tot_old") + col("n_categories"))) /
              ((col("n_new") + 1).cast("double") / (col("tot_new") + col("n_categories")))),
          6).as("psi_term"))
  }

  /** Benford's-law expected first-digit shares in ppm:
    * ⌊log₁₀(1 + 1/d)·10⁶⌋ for d = 1..9 — fixed mathematical
    * constants, spelled out so no runtime log/float enters the audit.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** Benford's-law first-digit audit (Newcomb 1881 / Benford 1938,
    * the standard forensic screen for fabricated or unit-mangled
    * numeric columns): naturally-occurring multiplicative quantities
    * put ~30.1% of first significant digits at 1, falling to ~4.6%
    * at 9; synthetic, truncated, or copy-pasted columns don't. Per
    * digit: observed count, observed share (exact truncating ppm),
    * the Benford expectation (compile-time constants — see
    * [[BenfordPpm]]), and the absolute deviation.
    *
    * Determinism: the first significant digit comes from the STRING
    * form of the non-negative long (`substring(cast(n), 1, 1)`) —
    * zero log/float arithmetic, so no boundary value can land on a
    * different digit across engines. Null and zero values carry no
    * first significant digit and are excluded (n_rows reports the
    * audited count). One partial-agg'd groupBy on a 9-value key +
    * a broadcast 1-row total: a map-side-combined corpus pass.
    */
  def benfordReport(df: DataFrame, valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    val digits = df.select(abs(v).as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("n_rows"))
    val spark0 = df.sparkSession
    import spark0.implicits._
    val expected = broadcast(BenfordPpm.toDF("digit", "benford_ppm"))
    expected.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n_rows"),
        expr("CASE WHEN n_rows > 0 THEN coalesce(n, 0L) * 1000000 div n_rows" +
          " ELSE 0L END").as("share_ppm"),
        col("benford_ppm"))
      .withColumn("abs_dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
  }
}
