package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of a linear text quality classifier — the
  * fastText shape (Joulin et al. 2016, arXiv:1607.01759) every modern
  * curation pipeline uses to score documents against a trusted
  * reference (GPT-3 / LLaMA "quality classifier" stage): hashed
  * bag-of-words features, a single sigmoid unit, batch delta-rule
  * gradient descent. `ext/Text.qualityLogit` (q86) applies FIXED
  * weights; this closes the loop by LEARNING them on the cluster.
  *
  * Bit-reproducibility is the design center — training is fully
  * hash-checkable against an unrolled SQL replay of every iteration
  * (the q119 BPE discipline) because nothing in the update depends on
  * float summation order or a transcendental:
  *
  *  - **Weights live in scaled-integer space** (`w_scaled` = w × 1e9,
  *    a long). The per-document pre-activation is an exact integer
  *    dot product `zs = Σ w_scaled(b) · cnt(b)` over raw token counts
  *    — longs, order-free — and only then one IEEE division
  *    `z = zs / 1e9`.
  *  - **The sigmoid is algebraic**, the Elliott squashing function
  *    σ(z) = 0.5·(1 + z/(1+|z|)) (Elliott 1993): add/mul/div/abs are
  *    exactly-rounded IEEE ops, so Spark and any other IEEE engine
  *    produce identical bits — `exp` is NOT correctly rounded and
  *    would diverge in the last ulp between libm implementations.
  *  - **Gradient contributions quantize to longs before the sum**:
  *    q = floor(err · cnt · 1e9) per (doc, bucket), then an exact
  *    long sum per bucket and an integer mean-gradient weight update
  *    — commutative, associative, partition-order-free.
  *
  * Scale posture: the feature frame is built once, repartitioned by
  * doc_id, and persisted — each of the T iterations then runs ONE
  * co-located per-doc aggregation + join (no exchange; HashPartitioning
  * on doc_id satisfies both) and a bucket-grain shuffle of ≤ D+1 rows.
  * Weights travel to executors as a literal array (D+1 longs) and back
  * as D+1 rows per iteration — the only driver traffic, bounded by
  * D × iters, the bounded-hop class of the k-means sample-train sites.
  */
object Classifier {

  /** Hashed bag-of-words features at (doc, bucket) grain, plus one
    * bias row per doc (bucket = −1, cnt = 1) so the bias trains
    * through the same integer path as every other weight. The bucket
    * is the first two hex digits of md5(token) mod `numBuckets` — the
    * repo's portable-hash convention (hashSplit / DSIR), so an
    * external SQL engine reproduces every bucket id.
    */
  def hashedFeatures(
      docs: DataFrame, idCol: String, textCol: String,
      label: Column, numBuckets: Int): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= 256,
      s"numBuckets must be in 2..256 (two hex digits), got $numBuckets")
    val base = docs.select(col(idCol).as("doc_id"),
        label.cast("double").as("y"), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
    val buckets = base
      .select(col("doc_id"), col("y"), explode(col("toks")).as("tok"))
      .withColumn("bucket",
        (conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("int")
          % numBuckets).cast("int"))
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("cnt"))
    val bias = base.select(col("doc_id"), col("y"),
      lit(-1).as("bucket"), lit(1L).as("cnt"))
    buckets.unionByName(bias)
  }

  /** z and p columns for a given scaled-weight vector, shared by the
    * train loop and [[score]] so both provably use the same
    * arithmetic. Index mapping: slot = bucket + 2 (1-based array,
    * bias at slot 1).
    */
  private def preActivation(feat: DataFrame, wScaled: Array[Long]): DataFrame = {
    val warr = typedlit(wScaled.toSeq)
    feat.groupBy(col("doc_id"), col("y"))
      .agg(sum(element_at(warr, col("bucket") + 2) * col("cnt")).as("zs"))
      .withColumn("z", col("zs").cast("double") / lit(1.0e9))
      .withColumn("p",
        lit(0.5) * (lit(1.0) + col("z") / (lit(1.0) + abs(col("z")))))
  }

  /** Batch delta-rule training: `iters` passes, learning rate 1/2 on
    * the MEAN gradient — the exact per-bucket long sum divided by the
    * training-doc count, floored back to the integer weight grid.
    * Returns the scaled weights, slot 0 = bias (bucket −1).
    *
    * The input frame is persisted (doc_id-partitioned) for the span
    * of the loop and released before return. Driver traffic per call:
    * one doc-count scalar plus ≤ (numBuckets+1) gradient rows per
    * iteration — the bounded-hop class.
    */
  def trainElliott(
      features: DataFrame, numBuckets: Int, iters: Int): Array[Long] = {
    val feat = features.repartition(col("doc_id")).persist()
    try {
      val nDocs = feat.filter(col("bucket") === -1).count()
      require(nDocs > 0, "trainElliott: no training documents")
      val w = Array.fill(numBuckets + 1)(0L)
      var it = 0
      while (it < iters) {
        val err = preActivation(feat, w)
          .select(col("doc_id"), (col("y") - col("p")).as("err"))
        val g = feat.join(err, Seq("doc_id"))
          .withColumn("q",
            floor(col("err") * col("cnt") * lit(1.0e9)))
          .groupBy(col("bucket")).agg(sum(col("q")).as("g"))
          .collect() // bounded: ≤ numBuckets + 1 rows per iteration
        g.foreach { r =>
          val slot = r.getInt(0) + 1
          w(slot) = w(slot) + math.floor(r.getLong(1) * 0.5 / nDocs).toLong
        }
        it += 1
      }
      w
    } finally { feat.unpersist(); () }
  }

  /** Scaled weights as a frame: (bucket, w_scaled, weight). */
  def weightsDF(spark: SparkSession, wScaled: Array[Long]): DataFrame = {
    import spark.implicits._
    wScaled.zipWithIndex
      .map { case (ws, slot) => (slot - 1, ws, ws / 1.0e9) }.toSeq
      .toDF("bucket", "w_scaled", "weight")
  }

  /** Score every doc under the trained weights: exact z, Elliott p,
    * and the keep decision (p > 1/2 ⇔ z > 0, decided on the exact
    * integer-ratio z so both engines agree even at the boundary).
    */
  def score(feat: DataFrame, wScaled: Array[Long]): DataFrame =
    preActivation(feat, wScaled)
      .select(col("doc_id"), col("y"), col("z"), col("p"),
        (col("z") > 0.0).as("keep"))

  /** SERVING form of [[score]]: the whole dot product as ONE
    * codegen'd map expression — a higher-order fold over the token
    * array that adds `w_scaled(bucket(token))` per occurrence, seeded
    * with the bias. No explode, no shuffle, no state: the ideal gate
    * for a streaming micro-batch or a 100 TB scoring pass. Bit-equal
    * to the trained path by construction — the fold visits tokens in
    * document order while [[score]] sums per-bucket counts, but every
    * addend is a LONG, and long addition is exactly commutative and
    * associative, so `zs` (and everything derived from it) is
    * identical.
    */
  def scoreMapOnly(
      docs: DataFrame, idCol: String, textCol: String,
      label: Column, wScaled: Array[Long]): DataFrame = {
    val numBuckets = wScaled.length - 1
    val warr = typedlit(wScaled.toSeq)
    def bucket(t: Column): Column =
      (conv(substring(md5(t), 1, 2), 16, 10).cast("int") % numBuckets).cast("int")
    docs
      .filter(size(Text.tokens(col(textCol))) >= 1)
      .select(col(idCol).as("doc_id"), label.cast("double").as("y"),
        aggregate(Text.tokens(col(textCol)), lit(wScaled(0)),
          (acc, t) => acc + element_at(warr, bucket(t) + 2)).as("zs"))
      .withColumn("z", col("zs").cast("double") / lit(1.0e9))
      .withColumn("p",
        lit(0.5) * (lit(1.0) + col("z") / (lit(1.0) + abs(col("z")))))
      .select(col("doc_id"), col("y"), col("z"), col("p"),
        (col("z") > 0.0).as("keep"))
  }
}
