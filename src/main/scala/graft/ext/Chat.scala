package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-structured training data — the instruction-tuning /
  * chat data model: a conversation is an ordered
  * `array<struct<role:string, content:string>>` column, and the
  * pipeline needs per-turn token accounting, loss-mask spans (train
  * on assistant turns only — the SFT masking rule), and a
  * deterministic chat-template rendering. All ops are exploded-window
  * or HOF passes: per-conversation work is bounded by its own turn
  * count, the corpus-sized shuffles are one explode + one keyed
  * window partitioned by conversation id.
  */
object Chat {

  /** Per-turn accounting + SFT loss-mask spans: explode the turns
    * with their index, count whitespace tokens per turn, and lay the
    * turns out on the conversation's token axis with a prefix-sum
    * window — `tok_start`/`tok_end` are the half-open token spans a
    * trainer masks with (`in_loss` = the assistant turns). One
    * explode + one window partitioned by the conversation id; spans
    * are exact integers, so an external engine replays the whole
    * layout.
    */
  def turnStats(df: DataFrame, idCol: String, turnsCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
    df.select(col(idCol),
        posexplode(col(turnsCol)).as(Seq("turn_idx", "turn")))
      .select(col(idCol), col("turn_idx"),
        col("turn.role").as("role"),
        size(Text.tokens(col("turn.content"))).cast("long").as("n_toks"))
      .withColumn("tok_start",
        coalesce(sum(col("n_toks")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("n_toks"))
      .withColumn("in_loss", col("role") === "assistant")
  }

  /** Deterministic chat-template rendering: one HOF fold over the
    * turn array producing `<|role|>content<|eot|>` per turn — the
    * canonical SFT serialization, no explode, no shuffle. Returns a
    * string column (callers usually keep its md5 + lengths rather
    * than the text itself).
    */
  def renderTemplate(turns: Column): Column =
    aggregate(turns, lit(""),
      (acc, t) => concat(acc, lit("<|"), t.getField("role"), lit("|>"),
        t.getField("content"), lit("<|eot|>")))

  /** Preference-pair assembly (the DPO/RLHF data shape): within each
    * prompt group, pair the highest-scoring response with the
    * lowest-scoring one (ties on id — fully deterministic), with the
    * score margin. Groups with fewer than two members can't form a
    * pair, and zero-margin groups carry no preference signal (and
    * could even pair a doc with itself under all-equal scores) —
    * both drop out. One keyed aggregation via ordered-struct
    * max/min — no self-join, no window over the corpus.
    */
  def preferencePairs(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: Column): DataFrame = {
    val g = groupCols.map(col)
    // deterministic argmax/argmin: order by (score, -id) / (score, id)
    // via struct comparison — max_by ties would otherwise be
    // partitioning-dependent
    val keyed = df.select(g :+ col(idCol).as("__pid") :+
      scoreCol.cast("long").as("__score"): _*)
    keyed.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_candidates"),
        max(struct(col("__score"), (-col("__pid")).as("__nid"))).as("__best"),
        min(struct(col("__score"), col("__pid"))).as("__worst"))
      .filter(col("n_candidates") >= 2 &&
        col("__best.__score") > col("__worst.__score"))
      .select(g ++ Seq(
        (-col("__best.__nid")).as("chosen_id"),
        col("__best.__score").as("chosen_score"),
        col("__worst.__pid").as("rejected_id"),
        col("__worst.__score").as("rejected_score"),
        (col("__best.__score") - col("__worst.__score")).as("margin"),
        col("n_candidates")): _*)
  }
}
