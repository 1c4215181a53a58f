package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: `runMain graft.tools.Scratch <query> <sfdir>`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    println(s"[scratch] count=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
