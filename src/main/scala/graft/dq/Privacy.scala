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
    * class has fewer than l distinct sensitive values. The distinct
    * count is a partial-aggregated `count(DISTINCT)` on the QI key,
    * joined back null-safely — NOT a per-class dense_rank window: the
    * window form sorts each class in one task, so one huge class (or
    * a continuous sensitive column) becomes a single-task sort at
    * scale, while the aggregate's partial phase on (QI, value)
    * distributes it and the join-back is a hash join AQE can split.
    */
  def enforceLDiversity(
      df: DataFrame, qi: Seq[Column], sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    require(!df.columns.exists(c => c.startsWith("__qi") || c == "__nsens"),
      "input must not already contain __qi*/__nsens columns")
    val qiNames = qi.indices.map(i => s"__qi$i")
    val tagged = df.select(
      col("*") +: qi.zip(qiNames).map { case (c, n) => c.as(n) }: _*)
    val counts = tagged
      .groupBy(qiNames.map(col): _*)
      .agg(countDistinct(sensitive).as("__nsens"))
      .select(qiNames.map(n => col(n).as(s"__c$n")) :+ col("__nsens"): _*)
    // null-safe equality so null-QI classes survive the join exactly
    // as they formed groups in the aggregate
    val cond = qiNames.map(n => col(n) <=> col(s"__c$n")).reduce(_ && _)
    tagged.join(counts, cond)
      .filter(col("__nsens") >= l)
      .select(df.columns.map(col): _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007): the
    * skewness attack l-diversity leaves open — a class can hold l
    * distinct sensitive values yet still leak by holding them in
    * wildly non-representative PROPORTIONS (a class that is 90%
    * "high" in a 10%-"high" table reveals plenty). Each QI class's
    * sensitive-value distribution must sit within distance t of the
    * GLOBAL distribution; for an ORDERED (numeric) sensitive
    * attribute the paper's distance is the Earth Mover's Distance
    * under the ordered ground metric, which collapses to the mean of
    * the |cumulative-difference| series over the m global values,
    * normalized by (m − 1).
    *
    * Exact integer arithmetic end to end (the q156 KS discipline):
    * cumulative counts compare cross-multiplied — the per-value term
    * is |cumc_i·N − cumg_i·n_c| — so no probability ever floats. The
    * products run in DECIMAL(38,0) (a class·corpus count product
    * clears 2⁶³ long before 100 TB does) and the reported
    * t_ppm = ⌊Σterms·10⁶ / (n_c·N·(m−1))⌋ floors via the remainder
    * trick; the at_risk verdict is the MULTIPLIED-THROUGH predicate
    * Σterms·10⁶ > t_ppm_bound·n_c·N·(m−1), so the verdict can never
    * be off by the floor.
    *
    * Shape: one groupBy for the global value histogram, cumulated by
    * a two-phase range-shuffle rank (per-range cumsums + O(P) prefix
    * offsets — no single-partition sort even when the sensitive
    * column is continuous and m ~ n), one keyed shuffle for the
    * per-(class, value) counts, a broadcast spine join so classes
    * MISSING a value still contribute that value's flat-cumulative
    * term, and per-class windows whose frames are O(m). Degenerate
    * m = 1 (one global value) defines t = 0.
    */
  def tClosenessClasses(
      df: DataFrame, qi: Seq[Column], sensitive: Column,
      tPpmBound: Long): DataFrame = {
    require(tPpmBound >= 0, s"tPpmBound must be >= 0, got $tPpmBound")
    val qiNames = qi.map(c => df.select(c).columns.head)
    val base = df.select((qi :+ sensitive.as("__v")): _*)
      .filter(col("__v").isNotNull)
    // Global cumulative histogram WITHOUT a single-partition sort over
    // the m distinct values (a continuous sensitive column makes m ~ n):
    // range-shuffle the distinct-value histogram once, reduce each
    // range to (max value, count sum, row count), prefix those over
    // the O(P) frame (the accepted bounded single-partition window),
    // then re-derive each value's range in the MAIN plan by comparing
    // against the range-bound VALUES — facts about values, not
    // partition ids, so nothing needs the q171 persist pin and the
    // result is cut-independent. The remaining cumulative window is
    // per-range. The histogram subtree appears twice (bounds branch +
    // main branch); both are the same deterministic aggregate.
    val hist = base.groupBy(col("__v")).agg(count(lit(1)).as("__gc"))
    val nP = df.sparkSession.sessionState.conf.numShufflePartitions
    val wP = Window.orderBy(col("__pid").asc)
    val wPAll = wP.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val bounds = hist.repartitionByRange(nP, col("__v").asc)
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid"))
      .agg(max(col("__v")).as("__hi"), sum(col("__gc")).as("__pc"),
        count(lit(1)).as("__pm"))
      .withColumn("__lo", lag(col("__hi"), 1).over(wP))
      .withColumn("__goff", coalesce(sum(col("__pc")).over(
        wP.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n_total", sum(col("__pc")).over(wPAll))
      .withColumn("__m", sum(col("__pm")).over(wPAll))
      .select(col("__pid").as("__bkt"), col("__lo"), col("__hi"),
        col("__goff"), col("__n_total"), col("__m"))
    val wB = Window.partitionBy(col("__bkt")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val global = hist
      .join(broadcast(bounds), col("__v") <= col("__hi") &&
        (col("__lo").isNull || col("__v") > col("__lo")))
      .withColumn("__gcum", col("__goff") + sum(col("__gc")).over(wB))
      .select(col("__v"), col("__gcum"), col("__n_total"), col("__m"))
    val cv = base.groupBy((qiNames.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__cc"))
    // spine: every class × every global value, so a value absent from
    // a class still contributes its flat-cumulative |…| term
    val classes = cv.groupBy(qiNames.map(col): _*)
      .agg(sum(col("__cc")).as("class_size"))
    val spine = classes.crossJoin(broadcast(global))
      .join(cv, qiNames :+ "__v", "left")
      .withColumn("__cc", coalesce(col("__cc"), lit(0L)))
    val wc = Window.partitionBy(qiNames.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = "DECIMAL(38,0)"
    spine
      .withColumn("__ccum", sum(col("__cc")).over(wc))
      .withColumn("__term", expr(
        s"abs(CAST(__ccum AS $dec) * __n_total - " +
          s"CAST(__gcum AS $dec) * class_size)"))
      .groupBy((qiNames.map(col) :+ col("class_size") :+ col("__n_total") :+
        col("__m")): _*)
      .agg(sum(col("__term")).as("__sum_term"))
      .withColumn("__den", expr(
        s"CAST(class_size AS $dec) * __n_total * greatest(__m - 1, 1)"))
      .withColumn("t_ppm", expr(
        "CAST(((__sum_term * 1000000) - (__sum_term * 1000000) % __den)" +
          " / __den AS BIGINT)"))
      .withColumn("at_risk",
        expr(s"__sum_term * 1000000 > CAST($tPpmBound AS DECIMAL(38,0)) * __den"))
      .select((qiNames.map(col) :+ col("class_size") :+
        col("__m").as("n_values") :+ col("t_ppm") :+ col("at_risk")): _*)
  }
}
