package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted separable corpus: label = text contains "pos"
  private def corpus = Seq(
    (1L, "pos alpha beta", 1.0), (2L, "pos gamma", 1.0),
    (3L, "pos pos delta", 1.0), (4L, "neg alpha", 0.0),
    (5L, "neg beta gamma", 0.0), (6L, "neg neg neg", 0.0),
    (7L, "alpha beta gamma", 0.0), (8L, "pos neg pos", 1.0)
  ).toDF("doc_id", "text", "lab")

  private def feat = Classifier.hashedFeatures(
    corpus, "doc_id", "text", col("lab"), numBuckets = 16)

  test("hashedFeatures: one bias row per doc with cnt=1, buckets in range") {
    val f = feat.collect()
    val bias = f.filter(_.getAs[Int]("bucket") == -1)
    assert(bias.length == 8 && bias.forall(_.getAs[Long]("cnt") == 1L))
    assert(f.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= -1 && b < 16
    })
    // token counts survive: doc 6 has "neg" 3 times in one bucket
    val d6 = f.filter(r => r.getAs[Long]("doc_id") == 6L
      && r.getAs[Int]("bucket") != -1)
    assert(d6.map(_.getAs[Long]("cnt")).sum == 3L)
  }

  test("trainElliott learns the planted signal and separates the corpus") {
    val w = Classifier.trainElliott(feat, numBuckets = 16, iters = 8)
    val scored = Classifier.score(feat, w)
      .select(col("doc_id"), col("y"), col("keep")).collect()
    val acc = scored.count(r =>
      (r.getAs[Double]("y") == 1.0) == r.getAs[Boolean]("keep")) / 8.0
    assert(acc == 1.0, s"expected perfect separation on the planted corpus, got $acc")
    // the discriminative buckets carry opposite signs
    val posB = Classifier.hashedFeatures(
      Seq((0L, "pos", 1.0)).toDF("doc_id", "text", "lab"),
      "doc_id", "text", col("lab"), 16)
      .filter(col("bucket") =!= -1).head.getAs[Int]("bucket")
    val negB = Classifier.hashedFeatures(
      Seq((0L, "neg", 1.0)).toDF("doc_id", "text", "lab"),
      "doc_id", "text", col("lab"), 16)
      .filter(col("bucket") =!= -1).head.getAs[Int]("bucket")
    assert(w(posB + 1) > 0, "weight on the positive token's bucket must be > 0")
    assert(w(negB + 1) < 0, "weight on the negative token's bucket must be < 0")
  }

  test("training is bit-deterministic across runs and partitionings") {
    val w1 = Classifier.trainElliott(feat, numBuckets = 16, iters = 4)
    val w2 = Classifier.trainElliott(
      feat.repartition(7), numBuckets = 16, iters = 4)
    assert(w1.toSeq == w2.toSeq)
  }

  test("scoreMapOnly (serving fold) is bit-equal to the trained per-bucket path") {
    val w = Classifier.trainElliott(feat, numBuckets = 16, iters = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "z", "p", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getBoolean(3)))).toMap
    val a = rows(Classifier.score(feat, w))
    val b = rows(Classifier.scoreMapOnly(corpus, "doc_id", "text", col("lab"), w))
    assert(a == b)
  }

  test("empty input is rejected loudly") {
    val empty = corpus.filter(col("doc_id") < 0)
    intercept[IllegalArgumentException] {
      Classifier.trainElliott(Classifier.hashedFeatures(
        empty, "doc_id", "text", col("lab"), 16), 16, 1)
    }
  }
}
