package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.Transform
import graft.gold.Star

/** Property-based invariants (SURVEY.md §5.2.3) over ScalaCheck-generated
  * frames (deterministically seeded — no flaky samples): dedup
  * idempotence, split completeness/disjointness, DQ metric ranges,
  * upsert last-writer-wins.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int, Option[Double])]] =
    Gen.listOfN(40, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      seq <- Gen.choose(0, 10)
      v <- Gen.option(Gen.choose(-100.0, 100.0))
    } yield (k, seq, v))

  private def samples(n: Int): Seq[List[(String, Int, Option[Double])]] =
    (1 to n).map(i => rowsGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("dedup is idempotent and keeps exactly one row per key") {
    samples(8).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val once = Transform.dedupLatestAgg(df, Seq("k"), Seq(col("seq"), col("v")))
      val twice = Transform.dedupLatestAgg(once, Seq("k"), Seq(col("seq"), col("v")))
      assert(once.count() == rows.map(_._1).distinct.size)
      assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
    }
  }

  test("schema split partitions the input: valid ∪ invalid = input, disjoint") {
    samples(8).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val (valid, invalid) = Transform.schemaSplit(df, Seq("k", "v"))
      assert(valid.count() + invalid.count() == rows.size)
      assert(valid.filter(col("v").isNull).count() == 0)
    }
  }

  test("DQ completeness and uniqueness are always in [0, 1]") {
    samples(8).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val metrics = dq.Analyzers.run(df,
        Seq(dq.Analyzers.completeness("v")), uniquenessCols = Seq("k"))
        .select("value").as[Double].collect()
      metrics.foreach(m => assert(m >= 0.0 && m <= 1.0, s"metric $m out of range"))
    }
  }

  test("upsert: incoming rows always win, untouched keys survive") {
    samples(8).sliding(2).foreach { case Seq(existing, incoming) =>
      // dropDuplicates picks an ARBITRARY row per key and may pick a
      // different one on each recomputation of the same plan — use the
      // deterministic max_by dedup so e/i are stable across actions
      val e = Transform.dedupLatestAgg(existing.toDF("k", "seq", "v"),
        Seq("k"), Seq(col("seq"), col("v")))
      val i = Transform.dedupLatestAgg(incoming.toDF("k", "seq", "v"),
        Seq("k"), Seq(col("seq"), col("v")))
      val merged = Star.upsert(e, i, Seq("k"))
      val eKeys = e.select("k").as[String].collect().toSet
      val iKeys = i.select("k").as[String].collect().toSet
      assert(merged.count() == (eKeys ++ iKeys).size)
      // every incoming row present verbatim in the merge
      assert(i.exceptAll(merged).isEmpty)
    }
  }
}
