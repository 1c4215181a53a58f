package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.0f, 10.0f, -4.0f)),
    (2L, Array(2.0f, 30.0f, -2.0f)),
    (3L, Array(8.0f, 20.0f, 0.0f))
  ).toDF("id", "vec")

  test("dimMinMax: exact per-dimension extremes") {
    val s = Features.dimMinMax(vecs, "vec")
      .as[(Int, Float, Float)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(s == Map(0 -> ((0.0f, 8.0f)), 1 -> ((10.0f, 30.0f)), 2 -> ((-4.0f, 0.0f))))
  }

  test("minMaxScaleRows: endpoints scale to exactly 0 and 1") {
    val stats = Features.dimMinMax(vecs, "vec")
    val r = Features.minMaxScaleRows(vecs, "id", "vec", stats)
      .select(col("id"), col("dim"), col("scaled"))
      .as[(Long, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 0)) == 0.0 && r((3L, 0)) == 1.0)
    assert(r((1L, 1)) == 0.0 && r((2L, 1)) == 1.0)
    assert(r((1L, 2)) == 0.0 && r((3L, 2)) == 1.0)
    assert(r((2L, 0)) == 0.25)  // (2-0)/8
    r.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("scaleVectors (map-only literal path) matches the row form bit-for-bit") {
    val stats = Features.dimMinMax(vecs, "vec")
    val rows = Features.minMaxScaleRows(vecs, "id", "vec", stats)
      .select(col("id"), col("dim"), col("scaled"))
      .as[(Long, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val packed = Features.scaleVectors(vecs, "id", "vec", stats)
      .select(col("id"), posexplode(col("scaled_vec")).as(Seq("dim", "scaled")))
      .as[(Long, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(packed == rows)
    // and the literal path carries no join or shuffle
    val plan = Features.scaleVectors(vecs, "id", "vec", stats)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan.take(600))
  }

  test("scaleVectors refuses a gapped or non-0-based stats frame") {
    val gapped = Seq((0, 0.0, 1.0), (2, 0.0, 1.0)).toDF("dim", "vmin", "vmax")
    val e = intercept[IllegalArgumentException] {
      Features.scaleVectors(vecs, "id", "vec", gapped)
    }
    assert(e.getMessage.contains("contiguous"))
    val shifted = Seq((1, 0.0, 1.0), (2, 0.0, 1.0)).toDF("dim", "vmin", "vmax")
    intercept[IllegalArgumentException] {
      Features.scaleVectors(vecs, "id", "vec", shifted)
    }
  }

  test("quantize: endpoints hit 0/255, constant dim codes 0, recon error within half a step") {
    val vecs2 = Seq(
      (1L, Array(0.0f, 5.0f, 2.0f)),
      (2L, Array(10.0f, 5.0f, 8.0f))).toDF("id", "vec")
    val stats = Features.dimMinMax(vecs2, "vec")
    val codes = Features.quantizeVectors(vecs2, "id", "vec", stats)
      .select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(0, 0, 0))   // dim0 min → 0; dim1 constant → 0; dim2 min → 0
    assert(codes(2L) == Seq(255, 0, 255)) // maxes → 255
    // reconstruction error bound: |v̂ − v| ≤ (vmax − vmin)/510 per dim
    val dims = 8
    val many = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(dims)(d => (math.sin(i * 0.7 + d) * 3.0).toFloat))
    }.toDF("id", "vec")
    val st = Features.dimMinMax(many, "vec")
    val q = Features.quantizeVectors(many, "id", "vec", st)
    val recon = Features.dequantizeVectors(q, "id", "codes", st)
      .select(col("id"), col("recon_vec")).as[(Long, Seq[Double])].collect().toMap
    val orig = many.select(col("id"), col("vec")).as[(Long, Seq[Float])].collect().toMap
    val ranges = st.orderBy(col("dim"))
      .select((col("vmax").cast("double") - col("vmin").cast("double")))
      .as[Double].collect()
    for ((id, v) <- orig; d <- 0 until dims) {
      val err = math.abs(recon(id)(d) - v(d).toDouble)
      assert(err <= ranges(d) / 510.0 + 1e-9, s"id=$id dim=$d err=$err")
    }
  }

  test("empty vectors yield empty outputs, not a crash") {
    val mixed = Seq((1L, Array(1.0f, 3.0f)), (2L, Array.empty[Float])).toDF("id", "vec")
    val stats = Features.dimMinMax(mixed, "vec") // dims from non-empty rows only
    val scaled = Features.scaleVectors(mixed, "id", "vec", stats)
      .select(col("id"), size(col("scaled_vec"))).as[(Long, Int)].collect().toMap
    assert(scaled == Map(1L -> 2, 2L -> 0))
    val codes = Features.quantizeVectors(mixed, "id", "vec", stats)
    assert(codes.schema("codes").dataType.simpleString == "array<int>")
    val cm = codes.select(col("id"), size(col("codes"))).as[(Long, Int)].collect().toMap
    assert(cm == Map(1L -> 2, 2L -> 0))
    val recon = Features.dequantizeVectors(codes, "id", "codes", stats)
      .select(col("id"), size(col("recon_vec"))).as[(Long, Int)].collect().toMap
    assert(recon == Map(1L -> 2, 2L -> 0))
  }

  test("sqAdcTopK: scalar-quantized ADC recovers the exact neighbor sets on separated clusters") {
    // two tight clusters far apart: the ~0.39-wide code step collapses
    // intra-cluster detail (ties break on vec_id) but cluster
    // membership — the retrieval verdict — must match exact search
    val corpus = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.05f, 0.05f)),
      (11L, Array(100.0f, 99.9f)), (12L, Array(99.9f, 100.0f)), (13L, Array(100.0f, 100.0f))
    ).toDF("vec_id", "embedding")
    val stats = Features.dimMinMax(corpus, "embedding")
    val codes = Features.quantizeVectors(corpus, "vec_id", "embedding", stats)
    val queries = Seq((1L, Array(0.0f, 0.0f)), (11L, Array(100.0f, 100.0f)))
      .toDF("query_id", "query_vec")
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = sets(Features.sqAdcTopK(codes, queries, stats, 2))
    val exact = sets(Similarity.bruteForceTopK(queries, corpus, 2,
      scorer = (a, b) => Features.negSquaredL2(a, b)))
    assert(adc == exact)
    assert(exact(1L) == Set(2L, 3L) && exact(11L) == Set(12L, 13L))
  }

  test("PQ: planted codebook structure recovers exact codes; ADC top-1 matches exact") {
    // 2 subspaces × 4 patterns: every vector is a (pattern_a, pattern_b)
    // concatenation plus per-vector noise far smaller than the pattern
    // separation — k-means must rediscover the patterns, the encoder
    // must assign every vector to its planted pair
    val patterns = IndexedSeq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val rnd = new scala.util.Random(7)
    val planted = (0 until 80).map { i =>
      val (a, b) = (i % 4, (i / 4) % 4)
      (i.toLong, a, b,
        (patterns(a) ++ patterns(b)).map(x => x + 0.1f * (rnd.nextFloat() - 0.5f)))
    }
    val df = planted.map { case (id, _, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    assert(cbs.length == 2 && cbs.forall(_.length == 4))
    val codes = Features.pqEncode(df, "vec_id", "embedding", cbs)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    // codes are byte-ranged and consistent: two vectors share a code in
    // subspace j iff they share the planted pattern there
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 4)))
    val byPattern = planted.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    byPattern.values.foreach { ids =>
      assert(ids.map(id => codes(id)(0)).toSet.size == 1, "subspace-0 code split")
    }
    planted.groupBy(_._3).values.foreach { rows =>
      assert(rows.map(r => codes(r._1)(1)).toSet.size == 1, "subspace-1 code split")
    }
    // reconstruction lands near the planted pattern (noise-level error)
    val recon = Features.pqDecode(
      Features.pqEncode(df, "vec_id", "embedding", cbs), "vec_id", "codes", cbs)
      .select("vec_id", "recon_vec").as[(Long, Seq[Float])].collect().toMap
    planted.foreach { case (id, a, b, _) =>
      val expect = patterns(a) ++ patterns(b)
      val err = recon(id).zip(expect).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(err < 0.1, s"vec $id recon err $err")
    }
    // ADC top-1 for a query = a vector sharing both patterns
    val queries = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = Features.pqAdcTopK(
      Features.pqEncode(df, "vec_id", "embedding", cbs), queries, cbs, 5)
      .select("vec_id").as[Long].collect().toSet
    // vec 0's pattern pair (0,0) is shared by vecs 16, 32, 48, 64 —
    // ADC cannot distinguish within a cell, but the cell must win
    val cell = planted.filter(r => r._2 == 0 && r._3 == 0).map(_._1).toSet - 0L
    assert(cell.subsetOf(top), s"cell $cell not in top $top")
  }

  test("IVF-ADC on planted clusters: probed-cell search matches full-scan ADC") {
    // 4 fully separated clusters (pairwise cos 0 — the same pattern in
    // BOTH subspaces), so the coarse quantizer's assignment is
    // unambiguous and nprobe = 1 provably covers each query's true
    // neighborhood
    val patterns = IndexedSeq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val rnd = new scala.util.Random(11)
    val planted = (0 until 80).map { i =>
      val a = i % 4
      (i.toLong,
        (patterns(a) ++ patterns(a)).map(x => x + 0.1f * (rnd.nextFloat() - 0.5f)))
    }
    val df = planted.toDF("vec_id", "embedding")
    val clustered = graft.ext.Similarity.kmeansLabels(
      df, "vec_id", "embedding", k = 4, iters = 4)
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(clustered, "vec_id", "embedding", cbs,
      carryCols = Seq("label"))
    // carryCols kept the label without a join
    assert(codes.columns.toSeq == Seq("vec_id", "label", "codes"))
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ivfAdc = Features.ivfAdcTopK(codes,
      graft.ext.Similarity.clusterCentroids(clustered), queries, cbs,
      k = 5, nprobe = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // nprobe = 1 on perfectly separated clusters loses nothing: the
    // full-scan ADC top-5 and the IVF-restricted top-5 agree
    val fullAdc = Features.pqAdcTopK(
      codes.select(col("vec_id"), col("codes")), queries, cbs, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfAdc == fullAdc, s"ivf=$ivfAdc full=$fullAdc")
  }

  test("refineTopK: exact re-rank recovers the true order ADC cannot see") {
    // same planted geometry as the PQ test: ADC is blind WITHIN a
    // cell (all four same-pattern vectors share codes), but their
    // noise makes the exact distances distinct — refinement must
    // reproduce the brute-force order from the ADC candidate list
    val patterns = IndexedSeq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val rnd = new scala.util.Random(7)
    val planted = (0 until 80).map { i =>
      val (a, b) = (i % 4, (i / 4) % 4)
      (i.toLong,
        (patterns(a) ++ patterns(b)).map(x => x + 0.1f * (rnd.nextFloat() - 0.5f)))
    }
    val df = planted.toDF("vec_id", "embedding")
    val cbs = Features.pqTrainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 4)
    val codes = Features.pqEncode(df, "vec_id", "embedding", cbs)
    val queries = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cands = Features.pqAdcTopK(codes, queries, cbs, 10)
    val refined = Features.refineTopK(cands, df, queries, "embedding", k = 3)
      .select("vec_id", "rank").as[(Long, Int)].collect().toSet
    val exact = graft.ext.Similarity.bruteForceTopK(queries, df, 3,
      scorer = (a, b) => Features.negSquaredL2(a, b))
      .select("vec_id", "rank").as[(Long, Int)].collect().toSet
    assert(refined == exact, s"refined=$refined exact=$exact")
    // and refinement only reorders — it never leaves the candidate set
    val candIds = cands.select("vec_id").as[Long].collect().toSet
    assert(refined.map(_._1).subsetOf(candIds))
  }

  test("constant dimension scales to NULL, not an arbitrary constant") {
    val const = Seq((1L, Array(5.0f, 1.0f)), (2L, Array(5.0f, 3.0f))).toDF("id", "vec")
    val r = Features.minMaxScaleRows(const, "id", "vec",
      Features.dimMinMax(const, "vec"))
      .filter(col("dim") === 0).select("scaled")
    assert(r.collect().forall(_.isNullAt(0)))
  }

  test("pcaProjectScaled: hand-checked axis-aligned corpus") {
    // vectors along the x-axis: q = (1e4, 0), (2e4, 0), (3e4, 0)
    // M = (6e4, 0); S_00 = 1.4e9; C_00 = 3·1.4e9 − 3.6e9 = 6e8, rest 0
    // divisor = 6e8/1e6 = 600 → Cn_00 = 1e6; one iteration lands the
    // component exactly on (1e5, 0) → proj_scaled = q_x · 1e5
    val axis = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(3.0f, 0.0f))).toDF("id", "vec")
    val r = Features.pcaProjectScaled(axis, "id", "vec")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 1000000000L), (2L, 2000000000L), (3L, 3000000000L)))
    assert(r.map(_._3).toSeq == Seq(1.0, 2.0, 3.0))
    // the returned projection frame is a broadcast-literal map pass:
    // covariance/iteration live behind the bounded driver hops, so
    // consuming the result never joins or shuffles the corpus
    val plan = Features.pcaProjectScaled(axis, "id", "vec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan.take(600))
  }

  test("pcaProjectScaled: all-constant corpus keeps the all-ones start") {
    // C is identically zero → every iterate is zero → v stays at the
    // deterministic start (scaleV per dim); proj = sum(q) · scaleV
    val const = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("id", "vec")
    val r = Features.pcaProjectScaled(const, "id", "vec")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r.forall(_._2 == 2000000000L) && r.forall(_._3 == 2.0))
  }

  test("pcaProject2Scaled: deflation recovers the exact second axis") {
    // two independent axes with 16:1 variance ratio and zero cross
    // term: Cn = diag(1e6, 62500, 0). v1 converges to (1e5, 0, 0)
    // EXACTLY in 6 iterations (v_s shrinks by //16 per step:
    // 1e5→6250→390→24→1→0), deflation zeroes C2_tt exactly
    // ((1e10·1e16)//1e20 = 1e6), and v2 = (0, 1e5, 0) — so both
    // projections are exact hand values
    val pts = Seq(
      (1L, Array(0.0f, 0.5f, 0f)), (2L, Array(2.0f, 0.0f, 0f)),
      (3L, Array(2.0f, 1.0f, 0f)), (4L, Array(4.0f, 0.5f, 0f)))
      .toDF("id", "vec")
    val r = Features.pcaProject2Scaled(pts, "id", "vec")
      .select("id", "proj1_scaled", "proj2_scaled", "proj1", "proj2")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 0L, 500000000L, 0.0, 0.5),
      (2L, 2000000000L, 0L, 2.0, 0.0),
      (3L, 2000000000L, 1000000000L, 2.0, 1.0),
      (4L, 4000000000L, 500000000L, 4.0, 0.5)))
  }

  test("pcaProjectScaled refuses empty and ragged input") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Features.pcaProjectScaled(empty, "id", "vec")
    }
    val ragged = Seq((1L, Array(1.0f)), (2L, Array(1.0f, 2.0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Features.pcaProjectScaled(ragged, "id", "vec")
    }
  }
}
