package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // 4 fully separated clusters (same pattern in both subspaces), the
  // FeaturesSpec IVF-ADC geometry — coarse assignment is unambiguous
  private val patterns = IndexedSeq(
    Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
    Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
  private lazy val planted = {
    val rnd = new scala.util.Random(11)
    (0 until 80).map { i =>
      val a = i % 4
      (i.toLong,
        (patterns(a) ++ patterns(a)).map(x => x + 0.1f * (rnd.nextFloat() - 0.5f)))
    }
  }

  test("write → read roundtrips codebooks bit-exactly and searches identically") {
    val df = planted.toDF("vec_id", "embedding")
    val clustered = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 4)
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(clustered, "vec_id", "embedding", cbs,
      carryCols = Seq("label"))
    val centroids = Similarity.clusterCentroids(clustered)
    val dir = tempDir("graft-annidx")
    AnnIndex.write(codes, centroids, cbs, dir)

    val idx = AnnIndex.read(spark, dir)
    assert(idx.codebooks == cbs, "codebooks changed across the roundtrip")

    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val mem = Features.ivfAdcTopK(codes, centroids, queries, cbs, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "adc_score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val disk = AnnIndex.searchTopK(idx, queries, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "adc_score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(disk == mem, s"disk=$disk mem=$mem")
  }

  test("compact: collapses batch partitions into label dirs, codes unchanged") {
    val df = planted.toDF("vec_id", "embedding")
    val clustered = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 4)
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(clustered, "vec_id", "embedding", cbs,
      carryCols = Seq("label"))
    val dir = tempDir("graft-annidx-compact")
    // emulate the streamed layout: per-batch partition level above label
    Seq(0, 1, 2).foreach { b =>
      codes.filter(col("vec_id") % 3 === b)
        .select(col("vec_id"), col("codes"), col("label"))
        .write.mode("overwrite").partitionBy("label")
        .parquet(s"$dir/codes/batch=$b")
    }
    AnnIndex.writeQuantizers(spark,
      (0 until 4).map(i => Seq.fill(8)(i.toFloat)), cbs, dir)
    val beforeCodes = spark.read.parquet(s"$dir/codes")
      .select("vec_id", "label", "codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(spark.read.parquet(s"$dir/codes").columns.contains("batch"))

    AnnIndex.compact(spark, dir)
    val after = spark.read.parquet(s"$dir/codes")
    assert(!after.columns.contains("batch"), "batch level must be gone")
    val afterCodes = after.select("vec_id", "label", "codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(afterCodes == beforeCodes, "compaction must not change content")
    val top = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.nonEmpty).toSeq
    assert(top.forall(_.startsWith("label=")), s"unexpected dirs: $top")
    // no staging residue
    assert(!new java.io.File(s"$dir/codes__staging").exists())
  }

  test("delete: tombstoned search == index built without the ids; compact sweeps") {
    val df = planted.toDF("vec_id", "embedding")
    val clustered = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 4)
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(clustered, "vec_id", "embedding", cbs,
      carryCols = Seq("label"))
    val centroids = Similarity.clusterCentroids(clustered)
    val full = tempDir("graft-annidx-del")
    val ref = tempDir("graft-annidx-ref")
    AnnIndex.write(codes, centroids, cbs, full)
    // reference: same frozen quantizers, codes built WITHOUT the ids
    AnnIndex.write(codes.filter(col("vec_id") % 7 =!= 3), centroids, cbs, ref)
    AnnIndex.delete(df.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
      "vec_id", full)
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def searchSet(dir: String): Set[(Long, Long, Double, Int)] =
      AnnIndex.searchTopK(AnnIndex.read(spark, dir), queries, k = 5, nprobe = 2)
        .select("query_id", "vec_id", "adc_score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val deleted = searchSet(full)
    assert(deleted == searchSet(ref), "build+delete must equal build-without")
    assert(deleted.forall(_._2 % 7 != 3), "no deleted id may surface")
    // re-delete is idempotent
    AnnIndex.delete(df.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
      "vec_id", full)
    assert(searchSet(full) == deleted)
    // physical sweep: tombstones cleared, raw scan excised, search stable
    AnnIndex.compact(spark, full)
    assert(!new java.io.File(s"$full/tombstones").exists(),
      "compaction must clear the tombstone table")
    assert(spark.read.parquet(s"$full/codes")
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "compaction must physically excise tombstoned rows")
    assert(searchSet(full) == deleted)
  }

  test("codes land label-partitioned on disk — the layout pruning depends on") {
    val df = planted.toDF("vec_id", "embedding")
    val clustered = Similarity.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 4)
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(clustered, "vec_id", "embedding", cbs,
      carryCols = Seq("label"))
    val dir = tempDir("graft-annidx-layout")
    AnnIndex.write(codes, Similarity.clusterCentroids(clustered), cbs, dir)
    val parts = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("label=")).sorted
    assert(parts.length == 4, s"expected 4 label partitions, got ${parts.toSeq}")
  }
}
