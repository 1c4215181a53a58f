package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conversation data-model coverage: per-turn span layout, the SFT
  * loss mask, template rendering, and preference-pair assembly.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def conv(id: Long, turns: (String, String)*) =
    (id, turns.map { case (r, c) => (r, c) })

  test("turnStats: hand-computed spans, half-open and contiguous; assistant turns masked in") {
    val df = Seq(
      conv(1L, ("user", "a b c"), ("assistant", "d"), ("user", "e f")),
      conv(2L, ("assistant", "x y"))
    ).toDF("conv_id", "turns")
      .select(col("conv_id"),
        col("turns").cast("array<struct<role:string,content:string>>").as("turns"))
    val out = Chat.turnStats(df, "conv_id", "turns")
      .select("conv_id", "turn_idx", "role", "n_toks", "tok_start", "tok_end", "in_loss")
      .as[(Long, Int, String, Long, Long, Long, Boolean)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 0, "user", 3L, 0L, 3L, false),
      (1L, 1, "assistant", 1L, 3L, 4L, true),
      (1L, 2, "user", 2L, 4L, 6L, false),
      (2L, 0, "assistant", 2L, 0L, 2L, true)))
  }

  test("renderTemplate: canonical serialization, order-preserving") {
    val df = Seq(conv(1L, ("user", "hi"), ("assistant", "yo")))
      .toDF("conv_id", "turns")
      .select(col("conv_id"),
        col("turns").cast("array<struct<role:string,content:string>>").as("turns"))
    val r = df.select(Chat.renderTemplate(col("turns"))).as[String].head()
    assert(r == "<|user|>hi<|eot|><|assistant|>yo<|eot|>")
  }

  test("preferencePairs: argmax/argmin with id ties, margin and singleton filters") {
    val scored = Seq(
      // group g1: clear best/worst; tie at the top between 11 and 12
      ("g1", 11L, 90L), ("g1", 12L, 90L), ("g1", 13L, 10L),
      // group g2: all equal — no signal, must drop
      ("g2", 21L, 50L), ("g2", 22L, 50L),
      // group g3: singleton — must drop
      ("g3", 31L, 99L)
    ).toDF("grp", "doc_id", "score")
    val out = Chat.preferencePairs(scored, Seq("grp"), "doc_id", col("score"))
      .select("grp", "chosen_id", "rejected_id", "margin", "n_candidates")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("g1", 11L, 13L, 80L, 3L))) // tie -> lower id chosen
  }
}
