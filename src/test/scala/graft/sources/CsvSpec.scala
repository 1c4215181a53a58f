package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source tier: declared-schema parse, corrupt-record DLQ split,
  * quoting roundtrip — and the column-pruning trap the from_csv form
  * exists to close (the native reader only parses referenced columns,
  * so corruption in an unreferenced column silently rides the good
  * side of a pruned plan).
  */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def landing(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvspec").toString
    spark.createDataset(lines).coalesce(1)
      .write.mode("overwrite").text(dir)
    dir
  }

  test("good rows parse typed, type-corrupt rows land whole in the DLQ column") {
    val dir = landing(
      "1,alpha,0.5",
      "2,\"beta, with comma\",1.5", // quoted delimiter round-trips
      "notanumber,gamma,2.5",       // corrupt in id
      "4,delta,notadouble")         // corrupt in score
    val df = Readers.csvWithSchema(spark, dir, schema)
    val good = df.filter(col("_corrupt_record").isNull)
      .select(col("id"), col("name"), col("score"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(good == Seq((1L, "alpha", 0.5), (2L, "beta, with comma", 1.5)))
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record")).as[String].collect().sorted.toSeq
    assert(bad == Seq("4,delta,notadouble", "notanumber,gamma,2.5"),
      "the DLQ column must carry each corrupt line verbatim")
  }

  test("corruption in an UNREFERENCED column still routes to the DLQ (pruning trap)") {
    val dir = landing("1,alpha,0.5", "notanumber,beta,1.5")
    // the plan references only (name, _corrupt_record): with the
    // native reader's column pruning, row 2's corrupt id would never
    // be parsed and the row would count as good
    val r = Readers.csvWithSchema(spark, dir, schema)
      .groupBy(col("_corrupt_record").isNotNull.as("bad"))
      .agg(count(lit(1)).as("n"), min(col("name")).as("nm"))
      .orderBy(col("bad"))
      .as[(Boolean, Long, String)].collect().toSeq
    assert(r == Seq((false, 1L, "alpha"), (true, 1L, "beta")))
  }

  test("contracts: corrupt column collision and header rejected") {
    intercept[IllegalArgumentException] {
      Readers.csvWithSchema(spark, "/nonexistent",
        schema.add("_corrupt_record", "string"))
    }
    intercept[IllegalArgumentException] {
      Readers.csvWithSchema(spark, "/nonexistent", schema,
        Map("header" -> "true"))
    }
  }

  test("delimiter option passes through; roundtrip via Spark's writer is lossless") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvrt").toString
    val src = Seq((1L, "a,b", 0.25), (2L, "c\"d", 1e300), (3L, null: String, -0.0))
      .toDF("id", "name", "score")
    src.write.mode("overwrite").csv(dir)
    val back = Readers.csvWithSchema(spark, dir, schema)
    assert(back.filter(col("_corrupt_record").isNotNull).isEmpty)
    val rows = back.select(col("id"), col("name"), col("score"))
      .as[(Long, Option[String], Double)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some("a,b"), 0.25), (2L, Some("c\"d"), 1e300),
      (3L, None, -0.0)))
  }
}
