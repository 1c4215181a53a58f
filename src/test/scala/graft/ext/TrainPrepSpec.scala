package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("unimaxAllocation: water-filling caps the small group, shares the rest") {
    // per-doc token counts: A = 10, B = 10, C = 2 (two docs each)
    val docs = Seq(("A", 6), ("A", 4), ("B", 7), ("B", 3), ("C", 1), ("C", 1))
      .toDF("grp", "tc")
    def run(budget: Long, epochs: Long) =
      TrainPrep.unimaxAllocation(docs, "grp", col("tc"), budget, epochs)
        .orderBy("grp").as[(String, Long, Long, Boolean, Long)]
        .collect().toSeq
    // budget 18, 1 epoch: C (cap 2) is capped — 2·3 ≤ 18; A fails
    // 10·2 ≤ 16 → A and B split the 16 leftover equally
    assert(run(18, 1) == Seq(("A", 10L, 10L, false, 8L),
      ("B", 10L, 10L, false, 8L), ("C", 2L, 2L, true, 2L)))
    // a budget beyond all caps caps everyone (the rest stays unspent)
    assert(run(100, 1) == Seq(("A", 10L, 10L, true, 10L),
      ("B", 10L, 10L, true, 10L), ("C", 2L, 2L, true, 2L)))
    // truncating share: (19 − 2) div 2 = 8, one token unallocated
    assert(run(19, 1).map(_._5).sum == 18L)
    // epoch cap scales the ceiling: 2 epochs doubles C's grant
    assert(run(18, 2).filter(_._1 == "C").head._5 == 4L)
  }

  test("neymanSample: weight = isqrt(nΣy²−(Σy)²); caps bind; zero-variance gets zero") {
    // A [0,10] → w = isqrt(100) = 10; B [5,5] → 0; C [0,6,0,6] → isqrt(144) = 12
    val df = Seq((1L, "A", 0L), (2L, "A", 10L), (3L, "B", 5L), (4L, "B", 5L),
      (5L, "C", 0L), (6L, "C", 6L), (7L, "C", 0L), (8L, "C", 6L))
      .toDF("id", "s", "y")
    val r = TrainPrep.neymanSample(df, "s", "id", col("y"), budget = 11L)
      .orderBy("s")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // Σw = 22: A floor(110/22)=5 capped at 2; B 0; C floor(132/22)=6 capped at 4
    assert(r == Seq(("A", 2L, 10L, 2L, 2L, 3L), ("B", 2L, 0L, 0L, 0L, 0L),
      ("C", 4L, 12L, 4L, 4L, 26L)))
  }

  test("hashSplit: disjoint, exhaustive, stable, roughly proportional") {
    val ids = (1L to 4000L).toDF("id")
    val cuts = Seq("train" -> 3277, "val" -> 3687, "test" -> 4096)
    val split = TrainPrep.hashSplit(ids, "id", cuts)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 4000L) // exhaustive, disjoint by construction
    // uniform md5 buckets → proportions near 80/10/10 (loose bounds)
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03, counts.toString)
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.03, counts.toString)
    assert(math.abs(counts("test") / 4000.0 - 0.1) < 0.03, counts.toString)
    // STABILITY: membership is a function of the id alone — a grown
    // corpus never reassigns an existing id
    val grown = TrainPrep.hashSplit((1L to 8000L).toDF("id"), "id", cuts)
    val before = split.as[(Long, String)].collect().toMap
    val after = grown.filter(col("id") <= 4000).as[(Long, String)].collect().toMap
    assert(before == after)
  }

  test("hashSplit rejects malformed cuts") {
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      TrainPrep.hashSplit(ids, "id", Seq("train" -> 4000)) // doesn't close range
    }
    intercept[IllegalArgumentException] {
      TrainPrep.hashSplit(ids, "id", Seq("a" -> 3000, "b" -> 2000, "c" -> 4096))
    }
  }

  test("packSequences: bins cut at the budget, offsets contiguous per shard") {
    val docs = Seq(
      // shard A: tokens 300, 300, 300, 300 → starts 0,300,600,900 → bins 0,0,1,1
      ("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 300L), ("A", 4L, 300L),
      // shard B: 600, 100 → starts 0,600 → bins 0,1
      ("B", 1L, 600L), ("B", 2L, 100L)
    ).toDF("source", "doc_id", "n_tokens")
    val packed = TrainPrep.packSequences(docs, "source", "doc_id", "n_tokens", 512)
      .select("source", "doc_id", "start_offset", "bin")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(packed == Set(
      ("A", 1L, 0L, 0L), ("A", 2L, 300L, 0L), ("A", 3L, 600L, 1L), ("A", 4L, 900L, 1L),
      ("B", 1L, 0L, 0L), ("B", 2L, 600L, 1L)))
  }

  test("hashed decontamination path agrees with the string-shingle path") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    def flags(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, Int) => org.apache.spark.sql.DataFrame) =
      f(docs, bench, "doc_id", "text", 5).as[(Long, Boolean)].collect().toMap
    assert(flags(TrainPrep.contaminatedDocs) == flags(TrainPrep.contaminatedDocsHashed))
  }

  test("quotaSample: per-group quota respected, deterministic, RNG-free") {
    val df = (1L to 500L).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("grp", "id")
    val s1 = TrainPrep.quotaSample(df, "grp", "id", 10)
      .as[(String, Long)].collect().toSet
    val s2 = TrainPrep.quotaSample(df, "grp", "id", 10)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2) // reproducible
    assert(s1.count(_._1 == "a") == 10 && s1.count(_._1 == "b") == 10)
    // small groups keep everything
    val tiny = TrainPrep.quotaSample(
      Seq(("x", 1L), ("x", 2L)).toDF("grp", "id"), "grp", "id", 10)
    assert(tiny.count() == 2)
  }

  test("contaminatedDocs flags exactly the overlapping non-benchmark docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 5-gram with bench 100
      (2L, "one two three four five six"), // no overlap
      (100L, "alpha beta gamma delta epsilon eta") // the benchmark doc itself
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 100L)
    val flags = TrainPrep.contaminatedDocs(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Boolean)].collect().toMap
    // doc 1 shares "alpha beta gamma delta epsilon"; doc 2 shares nothing;
    // the benchmark doc is never flagged against itself
    assert(flags == Map(1L -> true, 2L -> false, 100L -> false))
  }

  test("contaminationReport: attributes overlaps with exact counts, excludes self-pairs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 2 distinct 5-grams, both shared with 100
      (2L, "one two three four five six"), // no overlap
      (3L, "alpha beta gamma delta epsilon"), // exactly one 5-gram, shared with 100 and 1
      (100L, "alpha beta gamma delta epsilon zeta") // the benchmark doc
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 100L)
    val report = TrainPrep.contaminationReport(corpus, bench, "doc_id", "text", 5)
      .select("doc_id", "bench_id", "n_shared", "doc_shingles")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1 shares both of its 2 shingles; doc 3 its single shingle;
    // doc 2 absent; the benchmark doc never reports against itself
    assert(report == Set((1L, 100L, 2L, 2L), (3L, 100L, 1L, 1L)), report.toString)
    // flags and report agree on WHO is contaminated
    val flagged = TrainPrep.contaminatedDocs(corpus, bench, "doc_id", "text", 5)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(report.map(_._1) == flagged)
    // hashed join keys change nothing (the q102b xxhash64 pattern)
    val hashed = TrainPrep.contaminationReport(corpus, bench, "doc_id", "text", 5,
      hashShingles = true)
      .select("doc_id", "bench_id", "n_shared", "doc_shingles")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(hashed == report)
  }

  test("weightedSample: deterministic, exact-k, and weight-biased") {
    // 200 ids in one group: ids < 100 weight 10, ids >= 100 weight 0.1
    val df = (0L until 200L).map(i =>
      (i, "g", if (i < 100) 10.0 else 0.1)).toDF("id", "grp", "w")
    val pick = TrainPrep.weightedSample(df, "grp", "id", "w", k = 40)
    val ids = pick.select("id").as[Long].collect().toSet
    assert(ids.size == 40)
    // 100:1 weight ratio → the heavy half dominates the sample
    assert(ids.count(_ < 100L) >= 35, s"heavy-weight count: ${ids.count(_ < 100L)}")
    // same inputs → identical sample (RNG-free)
    val again = TrainPrep.weightedSample(df, "grp", "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    assert(again == ids)
    // ES key sanity against a driver-side recomputation for a few ids
    val keyOf = pick.select(col("id"),
      org.apache.spark.sql.functions.conv(
        substring(md5(col("id").cast("string")), 1, 13), 16, 10)
        .cast("double").as("h"))
      .as[(Long, Double)].collect().toMap
    keyOf.foreach { case (_, h) =>
      assert(h >= 0 && h < math.pow(16.0, 13) && h == math.floor(h))
    }
  }

  test("chunkDocs: boundaries, overlap, and the short final chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n <= size → one chunk
      (2L, (1 to 11).map(i => s"t$i").mkString(" ")), // n = size+1 → two chunks
      (3L, (1 to 30).map(i => s"t$i").mkString(" "))  // strides 0,8,16,24
    ).toDF("doc_id", "text")
    val r = TrainPrep.chunkDocs(docs, "doc_id", "text", chunkSize = 10, stride = 8)
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", col("chunk_toks")).as("chunk"), col("n_chunk_tokens"))
      .as[(Long, Int, String, Int)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(r((1L, 0))._2 == 10 && !r.contains((1L, 1)))
    // chunk 1 of doc 2 starts at token 9 (stride 8) and runs short
    assert(r((2L, 1)) == (("t9 t10 t11", 3)))
    // consecutive chunks of doc 3 overlap by size − stride = 2 tokens
    assert(r((3L, 0))._1.endsWith("t9 t10") && r((3L, 1))._1.startsWith("t9 t10"))
    assert(r((3L, 3)) == (("t25 t26 t27 t28 t29 t30", 6)))
    assert(!r.contains((3L, 4)))
    // every token of every doc appears in at least one of its chunks
    val covered = TrainPrep.chunkDocs(docs, "doc_id", "text", 10, 8)
      .select(col("doc_id"), explode(col("chunk_toks")).as("t"))
      .distinct().groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(covered == Map(1L -> 10L, 2L -> 11L, 3L -> 30L))
    intercept[IllegalArgumentException] {
      TrainPrep.chunkDocs(docs, "doc_id", "text", chunkSize = 8, stride = 10)
    }
  }

  test("budgetFill: prefix admission per group — straddler ends the fill") {
    val docs = Seq(
      // group g1: qualities 9, 8, 7, 6 with tokens 50, 40, 30, 10
      (1L, "g1", 9.0, 50L), (2L, "g1", 8.0, 40L),
      (3L, "g1", 7.0, 30L), (4L, "g1", 6.0, 10L),
      // group g2 fits entirely
      (5L, "g2", 5.0, 20L), (6L, "g2", 4.0, 30L)
    ).toDF("doc_id", "grp", "quality", "n_tokens")
    val r = TrainPrep.budgetFill(docs, "grp", "doc_id", "quality", "n_tokens", 100L)
      .select("doc_id", "running_tokens", "admitted")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // g1: 50, 90 admitted; 120 straddles → out; the 10-token doc at
    // rank 4 would fit the leftover but prefix semantics exclude it
    assert(r(1L) == ((50L, true)) && r(2L) == ((90L, true)))
    assert(r(3L) == ((120L, false)) && r(4L) == ((130L, false)))
    assert(r(5L)._2 && r(6L)._2)
    // quality ties break by id: equal-quality docs admit deterministically
    val ties = Seq((10L, "g", 1.0, 60L), (11L, "g", 1.0, 60L))
      .toDF("doc_id", "grp", "quality", "n_tokens")
    val t = TrainPrep.budgetFill(ties, "grp", "doc_id", "quality", "n_tokens", 60L)
      .select("doc_id", "admitted").as[(Long, Boolean)].collect().toMap
    assert(t(10L) && !t(11L))
    intercept[IllegalArgumentException] {
      TrainPrep.budgetFill(docs, "grp", "doc_id", "quality", "n_tokens", 0L)
    }
    // re-piping a fill result is refused, not silently clobbered
    val once = TrainPrep.budgetFill(docs, "grp", "doc_id", "quality", "n_tokens", 100L)
    val e = intercept[IllegalArgumentException] {
      TrainPrep.budgetFill(once, "grp", "doc_id", "quality", "n_tokens", 100L)
    }
    assert(e.getMessage.contains("admitted"))
  }

  test("budgetFillSkip: straddler skipped, later smaller docs admitted — differs from prefix") {
    // q97's fixture: prefix admits 50+40=90 and stops at the 30-token
    // straddler; skip-and-continue skips it and admits the 10-token doc
    val docs = Seq(
      (1L, "g1", 9.0, 50L), (2L, "g1", 8.0, 40L),
      (3L, "g1", 7.0, 30L), (4L, "g1", 6.0, 10L),
      (5L, "g2", 5.0, 20L), (6L, "g2", 4.0, 30L)
    ).toDF("doc_id", "grp", "quality", "n_tokens")
    val typed = docs.select(col("grp"), col("doc_id"), col("quality"), col("n_tokens"))
      .as[(String, Long, Double, Long)]
    val skip = TrainPrep.budgetFillSkip(typed, 100L).collect()
      .map(r => r._2 -> ((r._5, r._6))).toMap
    assert(skip(1L) == ((50L, true)) && skip(2L) == ((90L, true)))
    assert(skip(3L) == ((90L, false))) // straddler skipped, total unchanged
    assert(skip(4L) == ((100L, true))) // later smaller doc still fits
    assert(skip(5L)._2 && skip(6L)._2) // g2 fits entirely
    val prefix = TrainPrep.budgetFill(docs, "grp", "doc_id", "quality", "n_tokens", 100L)
      .filter(col("admitted")).select("doc_id").as[Long].collect().toSet
    assert(prefix == Set(1L, 2L, 5L, 6L)) // no doc 4: the semantics differ
    // zero-token docs always admit; a doc exactly filling the budget admits
    val edge = Seq(("g", 1L, 2.0, 100L), ("g", 2L, 1.0, 0L))
      .toDF("grp", "doc_id", "quality", "n_tokens")
      .as[(String, Long, Double, Long)]
    val er = TrainPrep.budgetFillSkip(edge, 100L).collect()
      .map(r => r._2 -> r._6).toMap
    assert(er(1L) && er(2L))
    intercept[IllegalArgumentException] { TrainPrep.budgetFillSkip(typed, 0L) }
  }

  test("budgetFillGlobal: equals brute-force global greedy; exact across bucket boundaries") {
    // 200 docs, adversarial quality distribution (duplicate qualities,
    // skewed token sizes) so bucket boundaries land ON tied values
    val docs = (1L to 200L).map { i =>
      (i, (i % 17).toDouble / 3.0, 5L + i % 23)
    }.toDF("doc_id", "quality", "n_tokens")
    for (budget <- Seq(1L, 37L, 500L, 1500L, 100000L);
         buckets <- Seq(1, 4, 32, 200)) {
      val got = TrainPrep.budgetFillGlobal(
        docs, "doc_id", "quality", "n_tokens", budget, numBuckets = buckets)
        .select("doc_id", "running_tokens", "admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)
      // brute force: one global sort on the driver
      var run = 0L
      val exp = docs.as[(Long, Double, Long)].collect()
        .sortBy { case (id, q, _) => (-q, id) }
        .map { case (id, _, t) => run += t; (id, run, run <= budget) }
        .sortBy(_._1)
      assert(got.toSeq == exp.toSeq, s"budget=$budget buckets=$buckets")
    }
    // the admitted set is a PREFIX of the global quality order
    val r = TrainPrep.budgetFillGlobal(
      docs, "doc_id", "quality", "n_tokens", 300L, numBuckets = 8)
      .select("quality", "doc_id", "admitted")
      .as[(Double, Long, Boolean)].collect()
      .sortBy { case (q, id, _) => (-q, id) }
    assert(r.indexWhere(!_._3) == r.count(_._3)) // all admits precede all drops
    intercept[IllegalArgumentException] {
      TrainPrep.budgetFillGlobal(docs, "doc_id", "quality", "n_tokens", 0L)
    }
    // re-piping refused, as in the per-group form
    val once = TrainPrep.budgetFillGlobal(docs, "doc_id", "quality", "n_tokens", 300L)
    intercept[IllegalArgumentException] {
      TrainPrep.budgetFillGlobal(once, "doc_id", "quality", "n_tokens", 300L)
    }
    // −∞-cut regression: when > 1/numBuckets of the corpus has NULL
    // quality (normalized −∞), a sketch cut lands ON −∞ and two ranges
    // would share lo = −∞ — each −∞ row then matched BOTH via the
    // bottom-bucket closure clause and appeared twice in the output
    val nullHeavy = (1L to 100L).map { i =>
      (i, if (i <= 60) None else Some(i.toDouble), 3L)
    }.toDF("doc_id", "quality", "n_tokens")
    val nh = TrainPrep.budgetFillGlobal(
      nullHeavy, "doc_id", "quality", "n_tokens", 150L, numBuckets = 4)
      .select("doc_id").as[Long].collect()
    assert(nh.length == 100 && nh.distinct.length == 100)
  }

  test("temperatureMixture: hand-computed shares; T=1 proportional; T flattens toward uniform") {
    val docs = (Seq.fill(10)(("a", 10L)) ++ Seq.fill(10)(("b", 40L)))
      .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
      .toDF("doc_id", "grp", "n_toks")
    // T=2: w = √100·10⁶ = 10⁷, √400·10⁶ = 2·10⁷ → shares 1/3, 2/3
    val r2 = TrainPrep.temperatureMixture(docs, "grp", col("n_toks"), 2.0, 9000L)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r2 == Seq(
      ("a", 100L, 10000000L, 333333L, 2999L, 29990000L),
      ("b", 400L, 20000000L, 666666L, 5999L, 14997500L)))
    // T=1: proportional (1/5, 4/5)
    val r1 = TrainPrep.temperatureMixture(docs, "grp", col("n_toks"), 1.0, 9000L)
      .orderBy("grp").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r1.map(_._4).toSeq == Seq(200000L, 800000L))
    // higher T compresses the big group's share toward 1/2
    val r8 = TrainPrep.temperatureMixture(docs, "grp", col("n_toks"), 8.0, 9000L)
      .orderBy("grp").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r8(1)._4 < r2(1)._4 && r2(1)._4 < r1(1)._4 && r8(1)._4 > 500000L)
    intercept[IllegalArgumentException] {
      TrainPrep.temperatureMixture(docs, "grp", col("n_toks"), 0.0, 9000L)
    }
  }

  test("quantileNormalize: equals per-group window ranks; null/NaN rank worst; bucket-count invariant") {
    // 3 groups, heavy score ties (bucket cuts land ON tied values),
    // planted NULL and NaN scores
    val docs = (1L to 300L).map { i =>
      val grp = s"g${i % 3}"
      val score: Option[Double] =
        if (i % 29 == 0) None
        else if (i % 31 == 0) Some(Double.NaN)
        else Some((i % 13).toDouble / 4.0)
      (i, grp, score)
    }.toDF("doc_id", "grp", "score")
    // brute force: one per-group sort on the driver, null/NaN → −∞
    val exp = docs.as[(Long, String, Option[Double])].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, g) =>
        val sorted = g.map { case (id, _, s) =>
          val v = s match {
            case Some(d) if !d.isNaN => d
            case _ => Double.NegativeInfinity
          }
          (id, v)
        }.sortBy { case (id, v) => (v, id) }
        sorted.zipWithIndex.map { case ((id, _), k) =>
          val rank = k + 1L
          (id, rank, sorted.length.toLong, rank * 1000000L / sorted.length)
        }
      }.sortBy(_._1)
    for (buckets <- Seq(1, 4, 64)) {
      val got = TrainPrep.quantileNormalize(
        docs, "grp", "doc_id", col("score"), numBuckets = buckets)
        .select("doc_id", "q_rank", "group_n", "quantile_ppm")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == exp.toSeq, s"buckets=$buckets")
    }
    // reserved-column guard, as in budgetFillGlobal
    intercept[IllegalArgumentException] {
      TrainPrep.quantileNormalize(
        docs.withColumn("q_rank", lit(1L)), "grp", "doc_id", col("score"))
    }
  }

  test("bloomContaminatedDocs: flags a superset of exact, never misses, empty bench flags none") {
    val docs = (1L to 200L).map { i =>
      // docs 10 and 110 share a rare 3-gram; everything else is unique
      val tail = if (i == 10 || i == 110) "shared rare trigram here"
        else s"unique tail $i alpha beta"
      (i, s"doc $i body $tail")
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 100 === 10) // docs 10, 110
    val exact = TrainPrep.contaminatedDocs(docs, bench, "doc_id", "text", 3)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(exact == Set(10L, 110L))
    val flagged = TrainPrep.bloomContaminatedDocs(docs, bench, "doc_id", "text", 3,
      expectedItems = 10000L, numBits = 65536L)
      .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
    // the bloom guarantee: no false negatives
    assert(exact.subsetOf(flagged), s"missed: ${exact -- flagged}")
    // at this sizing the FP rate is ~0: nothing beyond the bench docs'
    // own shingles should flag
    assert(flagged == Set(10L, 110L), flagged.toString)
    val none = TrainPrep.bloomContaminatedDocs(
      docs, bench.filter(lit(false)), "doc_id", "text", 3)
    assert(none.filter(col("flagged")).count() == 0)
    assert(none.count() == 200)
  }

  test("decontaminateTwoStage: identical verdicts to the full exact join; self-flags cleared") {
    val docs = (1L to 200L).map { i =>
      val tail = if (i == 10 || i == 110) "shared rare trigram here"
        else s"unique tail $i alpha beta"
      (i, s"doc $i body $tail")
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 100 === 10) // docs 10, 110 — IN the corpus
    val full = TrainPrep.contaminatedDocsHashed(docs, bench, "doc_id", "text", 3)
      .as[(Long, Boolean)].collect().toMap
    val two = TrainPrep.decontaminateTwoStage(docs, bench, "doc_id", "text", 3,
      expectedItems = 10000L, numBits = 65536L)
      .as[(Long, Boolean)].collect().toMap
    assert(two == full) // byte-identical composition, every doc present
    assert(two.size == 200 && two(10L) && two(110L) && !two(5L))
    // a deliberately tiny, FP-heavy bloom still composes exactly: the
    // exact stage clears every false flag
    val noisy = TrainPrep.decontaminateTwoStage(docs, bench, "doc_id", "text", 3,
      expectedItems = 4L, numBits = 64L)
      .as[(Long, Boolean)].collect().toMap
    assert(noisy == full)
  }

  test("mixtureWeights: alpha=1 keeps natural shares; alpha<1 boosts the tail") {
    val df = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("fr"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val nat = TrainPrep.mixtureWeights(df, "lang", alpha = 1.0)
      .select("lang", "weight", "sample_rate")
      .as[(String, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(nat("en")._1 == 0.8 && nat("de")._1 == 0.15 && nat("fr")._1 == 0.05)
    nat.values.foreach(v => assert(v._2 == 1.0)) // natural = no re-sampling
    val tempered = TrainPrep.mixtureWeights(df, "lang", alpha = 0.5)
      .select("lang", "weight", "sample_rate")
      .as[(String, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // weights still sum to 1 (up to the 6-decimal rounding)
    assert(math.abs(tempered.values.map(_._1).sum - 1.0) < 1e-5)
    // the dominant group is down-sampled, the tail up-sampled
    assert(tempered("en")._2 < 1.0 && tempered("fr")._2 > 1.0)
    intercept[IllegalArgumentException] {
      TrainPrep.mixtureWeights(df, "lang", alpha = 0.0)
    }
  }

  test("materializeMixture: targets met within one doc, prefix deterministic, both regimes") {
    import org.apache.spark.sql.functions.expr
    // two groups: 'big' holds 300 tokens, 'small' 60
    val docs = ((1L to 10L).map(i => ("big", i, 30L)) ++
      (11L to 16L).map(i => ("small", i, 10L)))
      .toDF("lang", "doc_id", "n_tokens")
    val weights = Seq(("big", 0.5), ("small", 0.5)).toDF("lang", "weight")
    val plan = TrainPrep.materializeMixture(
      docs, "lang", "doc_id", "n_tokens", weights, totalTokens = 600L)
    val rows = plan.select("lang", "doc_id", "n_tokens", "base_repeats", "n_repeats")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 16)
    // big: target 300 = exactly one epoch → base 1, no extras
    val big = rows.filter(_._1 == "big")
    assert(big.forall(r => r._4 == 1L && r._5 == 1L))
    // small: target 300 = 5 epochs of 60 → base 5, no extras
    val small = rows.filter(_._1 == "small")
    assert(small.forall(r => r._4 == 5L && r._5 == 5L))
    // planned tokens hit the target exactly when it divides evenly
    val planned = plan.select(expr("sum(n_tokens * n_repeats)")).as[Long].head()
    assert(planned == 600L)
    // uneven remainder: target 90 for small → base 1 epoch (60) + 30
    // remainder = exactly 3 extra 10-token docs, hash-prefix chosen
    val uneven = TrainPrep.materializeMixture(
      docs.filter(col("lang") === "small"), "lang", "doc_id", "n_tokens",
      weights.filter(col("lang") === "small"), totalTokens = 180L)
    val u = uneven.select("doc_id", "n_repeats").as[(Long, Long)].collect().toMap
    assert(u.values.count(_ == 2L) == 3 && u.values.count(_ == 1L) == 3)
    // deterministic: same call, same prefix
    val u2 = TrainPrep.materializeMixture(
      docs.filter(col("lang") === "small"), "lang", "doc_id", "n_tokens",
      weights.filter(col("lang") === "small"), totalTokens = 180L)
      .select("doc_id", "n_repeats").as[(Long, Long)].collect().toMap
    assert(u == u2)
    // down-sampling regime: targets (50 each) below both groups' epoch
    // sizes (300 / 60) → base 0 everywhere, prefix survivors only
    val down = TrainPrep.materializeMixture(
      docs, "lang", "doc_id", "n_tokens", weights, totalTokens = 100L)
      .select("lang", "base_repeats", "n_repeats")
      .as[(String, Long, Long)].collect()
    assert(down.forall(_._2 == 0L))
    assert(down.exists(_._3 == 1L) && down.exists(_._3 == 0L))
    // a zero-token group (every doc hollowed out) fills nothing —
    // no Infinity/overflow garbage, no phantom extra epochs
    val hollow = Seq(("z", 100L, 0L), ("z", 101L, 0L)).toDF("lang", "doc_id", "n_tokens")
    val hz = TrainPrep.materializeMixture(
      hollow, "lang", "doc_id", "n_tokens",
      Seq(("z", 1.0)).toDF("lang", "weight"), totalTokens = 1000L)
      .select("n_repeats").as[Long].collect()
    assert(hz.toSeq == Seq(0L, 0L), hz.toSeq.toString)
    // clean division (rem = 0): a zero-token doc claims no phantom extra
    val zdoc = Seq(("x", 1L, 0L), ("x", 2L, 30L)).toDF("lang", "doc_id", "n_tokens")
    val zr = TrainPrep.materializeMixture(
      zdoc, "lang", "doc_id", "n_tokens",
      Seq(("x", 1.0)).toDF("lang", "weight"), totalTokens = 60L)
      .select("doc_id", "n_repeats").as[(Long, Long)].collect().toMap
    assert(zr == Map(1L -> 2L, 2L -> 2L), zr.toString)
    // output-column collision is refused, not clobbered
    val e = intercept[IllegalArgumentException] {
      TrainPrep.materializeMixture(
        docs.withColumn("n_repeats", lit(1)), "lang", "doc_id", "n_tokens",
        weights, 100L)
    }
    assert(e.getMessage.contains("n_repeats"))
  }

  test("tokenBalancedShards: equals the single-window brute force; shards within one doc of target") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 400L).map(i => (i, 1L + (i * 7) % 50)).toDF("doc_id", "n_tokens")
    val target = 1500L
    val got = TrainPrep.tokenBalancedShards(docs, "doc_id", "n_tokens", target)
      .select("doc_id", "tokens_before", "shard")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute force: ONE global window over the same order
    val h = substring(md5(col("doc_id").cast("string")), 1, 15)
    val brute = docs
      .withColumn("tokens_before", coalesce(
        sum(col("n_tokens")).over(Window.orderBy(h.asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard", floor(col("tokens_before") / target).cast("long"))
      .select("doc_id", "tokens_before", "shard")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == brute)
    // every shard's token total lands within one max-doc of the target
    // (straddler stays in the shard it starts in); last shard exempt
    val totals = TrainPrep.tokenBalancedShards(docs, "doc_id", "n_tokens", target)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val maxDoc = 50L
    totals.dropRight(1).foreach { case (s, t) =>
      assert(t >= target - maxDoc && t < target + maxDoc, s"shard $s total $t")
    }
    // an input already carrying shard/tokens_before is refused
    val e = intercept[IllegalArgumentException] {
      TrainPrep.tokenBalancedShards(
        docs.withColumn("shard", lit(0L)), "doc_id", "n_tokens", target)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("deterministicShuffle: positions contiguous per shard, order stable, shard matches splitBucket") {
    val df = (1L to 500L).toDF("doc_id")
    val r = TrainPrep.deterministicShuffle(df, "doc_id", numShards = 4)
    assert(r.count() == 500)
    // every shard's positions are exactly 0..n-1
    val spans = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Int, Long, Long, Long)].collect()
    assert(spans.map(_._2).sum == 500)
    spans.foreach { case (_, n, lo, hi) => assert(lo == 0L && hi == n - 1) }
    // re-running yields the identical permutation (no RNG anywhere)
    val perm1 = r.select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    val perm2 = TrainPrep.deterministicShuffle(df, "doc_id", 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(perm1 == perm2)
    // shard is the md5 split bucket mod numShards
    val mismatch = TrainPrep.deterministicShuffle(df, "doc_id", 4)
      .filter(col("shard") =!= pmod(TrainPrep.splitBucket(col("doc_id")), lit(4)))
    assert(mismatch.count() == 0)
    // an input already carrying shard/pos is refused, not clobbered
    val e = intercept[IllegalArgumentException] {
      TrainPrep.deterministicShuffle(df.withColumn("shard", lit(9)), "doc_id", 4)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("dsirLogWeights: target-like docs score above, disjoint docs below, featureless at 0") {
    val corpus = Seq(
      (1L, "a b a b"), // exactly the target's vocabulary
      (2L, "x y x y"), // disjoint vocabulary
      (3L, "a") // one token — no bigram features
    ).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    val w = TrainPrep.dsirLogWeights(corpus, "doc_id", "text", target, n = 2)
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(1L, 2L, 3L), "every corpus doc must appear")
    assert(w(1L) > 0.0, s"target-like doc must score positive, got ${w(1L)}")
    assert(w(2L) < 0.0, s"disjoint doc must score negative, got ${w(2L)}")
    assert(w(3L) == 0.0, s"featureless doc must score exactly 0, got ${w(3L)}")
    // importance ORDER is the operator's contract
    assert(w(1L) > w(2L))
  }

  test("dsirLogWeights is deterministic and composes with weightedSample's ranking") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "spark table join query scan"
          else "random walk noise tokens here")
    }.toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0).limit(5)
    val a = TrainPrep.dsirLogWeights(docs, "doc_id", "text", target)
      .as[(Long, Double)].collect().toMap
    val b = TrainPrep.dsirLogWeights(docs, "doc_id", "text", target)
      .as[(Long, Double)].collect().toMap
    assert(a == b, "no RNG anywhere — reruns must be identical")
    // every target-distribution doc outranks every off-target doc
    val (on, off) = a.partition { case (id, _) => id % 3 == 0 }
    assert(on.values.min > off.values.max)
  }

  test("dsirLogWeightsWithHandle persists the doc-bucket frame until released") {
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val (out, handle) = TrainPrep.dsirLogWeightsWithHandle(
      docs, "doc_id", "text", docs.limit(1))
    out.collect()
    assert(handle.isCached, "doc-bucket counts should be persisted while in use")
    handle.unpersist()
    assert(!handle.isCached)
  }

  test("curriculumSchedule: hand-computed sqrt pacing, boundary ranks, P=1 degenerate") {
    // N=4, P=2: admit(1) = isqrt(16/2) = 2 → ranks 1-2 in phase 1;
    // ranks 3-4 in phase 2 (closed form ceil(rank^2 * 2 / 16))
    val docs = Seq((10L, 5L), (11L, 1L), (12L, 9L), (13L, 3L))
      .toDF("id", "diff")
    val out = TrainPrep.curriculumSchedule(docs, "id", col("diff"), phases = 2)
      .select("id", "difficulty_rank", "first_phase")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(11L) == ((1L, 1L)))   // diff 1 → easiest
    assert(out(13L) == ((2L, 1L)))   // diff 3
    assert(out(10L) == ((3L, 2L)))   // diff 5
    assert(out(12L) == ((4L, 2L)))   // diff 9
    // P=1: everything admitted in the single phase
    val p1 = TrainPrep.curriculumSchedule(docs, "id", col("diff"), phases = 1)
      .select("first_phase").as[Long].collect().toSet
    assert(p1 == Set(1L))
    // phase_order is a within-phase permutation 1..|phase|
    val po = TrainPrep.curriculumSchedule(docs, "id", col("diff"), phases = 2)
      .select("first_phase", "phase_order").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(po == Map(1L -> Seq(1, 2), 2L -> Seq(1, 2)))
  }
}
