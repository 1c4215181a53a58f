package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Transform

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is deterministic (stable ORDER BY, literal dates, rounded
  * floating-point aggregates) so the driver's DuckDB hash-compare is
  * stable across engines. Column names are aliased identically in the
  * Spark plan and the oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest-snapshot-per-key → validate → aggregate: the essence of the
    * reference pipeline (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    q01DedupLatestAgg(spark, "/root/testdata/sf0.001")

  /** O-28 window dedup + O-11 null guard + O-29 agg + O-47 sort.
    * Keep the latest lineitem per order (ship date desc, linenumber desc
    * as the deterministic tie-break), then aggregate per return flag.
    */
  def q01DedupLatestAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val deduped = Transform.dedupLatest(
      li,
      partitionCols = Seq("l_orderkey"),
      orderCols = Seq(
        col("l_shipdate").desc, col("l_linenumber").desc,
        col("l_partkey").desc, col("l_suppkey").desc))
    deduped
      .filter(col("l_orderkey").isNotNull)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_dedup_latest_agg" -> ((s, d) => q01DedupLatestAgg(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_dedup_latest_agg" ->
      """WITH dedup AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY l_orderkey
        |      ORDER BY l_shipdate DESC, l_linenumber DESC,
        |               l_partkey DESC, l_suppkey DESC) AS rn
        |    FROM lineitem) WHERE rn = 1)
        |SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price
        |FROM dedup
        |WHERE l_orderkey IS NOT NULL
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
