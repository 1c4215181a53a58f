package graft.tools
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(s"TIMING $q ${(System.nanoTime() - t0) / 1e9}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
