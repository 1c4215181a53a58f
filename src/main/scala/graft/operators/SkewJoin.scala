package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the classic remedy when
  * one join key dominates the fact side and a single reducer would
  * receive the whole hot key's partition.
  *
  * The fact side gets a salt in [0, buckets) derived from a
  * caller-supplied uniform column (NOT the join key — the point is to
  * spread rows of the SAME key); the dim side replicates each row
  * `buckets` times, one per salt value. Joining on (keys…, salt) then
  * splits every hot key across `buckets` reducers while preserving the
  * exact join semantics: each fact row still meets each matching dim
  * row exactly once (at its own salt).
  *
  * When to reach for it at 100 TB: AQE's skew-join handling
  * (`OptimizeSkewedJoin`) already splits oversized sort-merge
  * partitions at runtime and should be the first line of defense;
  * manual salting remains the deterministic fallback when the skew is
  * in a single key VALUE so extreme that even a split partition
  * re-skews, or when a fixed partitioning must be reused across
  * stages. The dim side grows `buckets`×, so keep buckets modest and
  * the dim slim (project to join keys + carried attrs first).
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `keys`, salted into
    * `buckets` sub-keys. `factSalt` must be a deterministic expression
    * over fact columns that is uniform WITHIN each join key (a row id
    * works; the join key itself does not). Result columns = the usual
    * join output; the internal salt column is dropped.
    */
  def salted(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factSalt: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // an input already carrying __salt would be silently overwritten —
    // corrupting the join keys — so refuse it loudly
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already contain a __salt column")
    // a NULL salt source must not drop the row (the plain join keeps
    // it) — park NULLs in bucket 0; their keys still join exactly once
    val f = fact.withColumn("__salt",
      coalesce(pmod(factSalt, lit(buckets)).cast("int"), lit(0)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** MEASURED salting decision — [[graft.dq.Analyzers.skewReport]]'s
    * arithmetic turned into the join-time choice a 100 TB pipeline
    * makes hourly instead of hand-tuning: one keyed count aggregation
    * over the fact side (partial-agg'd; the collect is a single
    * totals row, bounded by construction) yields the heaviest key's
    * `suggested_salts = ⌈max_rows · n_keys / total⌉` — how many
    * average-key units the hot key occupies. Returns the bucket count
    * a salted join should use (`min(suggested, maxBuckets)`), or 0
    * when the skew is below `threshold` (suggested ≤ threshold — a
    * near-uniform key where salting would only pay the dim-replication
    * tax). All truncating long arithmetic, so the decision replays
    * exactly in SQL. At data scales where even one counting pass is
    * too dear, feed a `fact.sample(...)` — the ratio arithmetic is
    * scale-free; the q249 oracle path measures exactly.
    */
  def decide(fact: DataFrame, keys: Seq[String],
      threshold: Int = 4, maxBuckets: Int = 64): Int = {
    require(threshold >= 1 && maxBuckets >= 1, "positive threshold/cap")
    val row = fact.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .agg(max(col("n_rows")).as("max_rows"), sum(col("n_rows")).as("total"),
        count(lit(1)).as("n_keys"))
      .select(expr("(max_rows * n_keys + total - 1) div total").as("suggested"))
      .head()
    if (row.isNullAt(0)) 0 // empty fact: nothing to skew
    else {
      val suggested = row.getLong(0)
      if (suggested <= threshold) 0
      else math.min(suggested, maxBuckets.toLong).toInt
    }
  }

  /** Adaptive equi-join: [[decide]] measures the fact side's key skew,
    * then dispatches — the plain join when near-uniform (no
    * dim-replication tax), [[salted]] with the measured bucket count
    * when a hot key would otherwise own a reducer. Same output either
    * way (the q249 oracle pins both legs against one closed form).
    */
  def auto(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factSalt: Column,
      threshold: Int = 4,
      maxBuckets: Int = 64): DataFrame =
    dispatch(fact, dim, keys, factSalt, decide(fact, keys, threshold, maxBuckets))

  /** [[auto]]'s dispatch half with the decision precomputed — for
    * callers that need the bucket count as evidence (q249's
    * `buckets_used` column) without paying [[decide]]'s counting
    * pass twice.
    */
  def dispatch(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factSalt: Column,
      buckets: Int): DataFrame =
    if (buckets == 0) fact.join(dim, keys)
    else salted(fact, dim, keys, factSalt, buckets)
}
