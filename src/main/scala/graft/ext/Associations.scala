package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association mining over (basket, item) pairs: pairwise support,
  * confidence, and lift — the market-basket view of an event stream
  * (which event types co-occur in the same user's history beyond
  * chance?). Pairwise with a support floor is the scalable core of
  * Apriori: the candidate surface is bounded by (distinct items per
  * basket)², and the floor prunes it before the heavy join.
  *
  * All arithmetic is scaled-integer truncating division, so the full
  * report replays exactly in SQL.
  */
object Associations {

  /** Pairwise co-occurrence lift. One distinct pass keys baskets, a
    * self-join ON the basket builds ordered item pairs (a < b — each
    * unordered pair once), then one count aggregation; per-item
    * supports ride a broadcast join back (O(#items) side). Rows:
    * (item_a, item_b, n_ab, n_a, n_b, support_ppm, confidence_ppm,
    * lift_ppm) for pairs with n_ab ≥ minSupport:
    *
    *   support_ppm    = n_ab·10⁶ div n_baskets
    *   confidence_ppm = n_ab·10⁶ div n_a            (a ⇒ b)
    *   lift_ppm       = n_ab·n_baskets·10⁶ div (n_a·n_b)
    *
    * Scale: the self-join is per-basket quadratic in DISTINCT items —
    * bounded by the item vocabulary, not the event count; the basket
    * count is one scalar aggregate carried as a broadcast cross join
    * (no driver hop).
    */
  def pairLift(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L, scale: Long = 1000000L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val nb = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val items = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.select(col("b"), col("i").as("item_a"))
      .join(bi.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(items.select(col("i").as("item_a"), col("n_i").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(items.select(col("i").as("item_b"), col("n_i").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr(s"n_ab * $scale div n_baskets").as("support_ppm"),
        expr(s"n_ab * $scale div n_a").as("confidence_ppm"),
        expr(s"n_ab * n_baskets * $scale div (n_a * n_b)").as("lift_ppm"))
  }
}
