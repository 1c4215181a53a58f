package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Hygiene:
  *  - queries execute against the `noop` sink, not `.count()` —
  *    count lets Catalyst prune computed columns, under-measuring
  *    projection-heavy queries;
  *  - a warmup pass runs the full suite once at sf0.001 untimed, so
  *    the first timed query doesn't eat JVM/codegen/classloading
  *    warmup (steady-state numbers are what a long-running cluster
  *    job sees);
  *  - queries run in sorted-name order so per-round timings are
  *    comparable.
  */
object Bench {
  /** 1-minute load average from /proc/loadavg — recorded at run start
    * and end so a load-contaminated bench run self-identifies in the
    * durable history (a line whose loadavg far exceeds the allotted
    * cpus was measured on a busy host and its timings are suspect).
    */
  private def loadavg1m(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Self-defense against a busy host (two rounds of polluted final
    // records): if the 1-minute loadavg at start exceeds cpus/8, wait
    // once for the host to quiesce before measuring. Whatever happens,
    // the emitted line carries an explicit `contaminated` flag when
    // start OR end loadavg breached the threshold, so no reader ever
    // trends on a polluted record without knowing it.
    val loadThreshold = math.max(1.0, cpus.toDouble / 8.0)
    var loadStart = loadavg1m()
    if (loadStart > loadThreshold) {
      System.err.println(
        s"[bench] loadavg_start=$loadStart > $loadThreshold; sleeping 90s for the host to quiesce")
      Thread.sleep(90000)
      loadStart = loadavg1m()
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      queries.foreach { case (_, fn) =>
        try exec(fn, warmDir)
        catch { case scala.util.control.NonFatal(_) => () }
      }

    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try exec(fn, sfDir)
      catch { case scala.util.control.NonFatal(_) => () }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // drop internal persists a query leaked so the next query's
      // timing never pays (or benefits from) a predecessor's cache —
      // OUTSIDE the timed window, so cache hygiene is attributed to
      // no query
      spark.catalog.clearCache()
      elapsed
    }

    val firstPass = queries.map { case (name, fn) => name -> timeOne(name, fn) }
    // A transient load spike skews exactly the queries unlucky enough to
    // run under it — re-measure the slowest and keep the min, so one
    // noisy window can't manufacture an apparent regression in the
    // queries that matter most for the trend. Batch and streaming are
    // ranked SEPARATELY: streaming queries carry 5-9 s of fixed startup
    // and would otherwise monopolize the retry slots, leaving a
    // noise-hit 3 s batch query unretried (the r11 q38/q39 artifact —
    // 0.45 s-class queries recorded at ~3 s in the one run where a
    // spike landed on them).
    val streamingSet = SparkEntry.streamingQueries
    val (streamPass, batchPass) =
      firstPass.partition { case (k, _) => streamingSet.contains(k) }
    val retryNames =
      (batchPass.sortBy(-_._2).take(10) ++ streamPass.sortBy(-_._2).take(10))
        .map(_._1).toSet
    val byName = queries.toMap
    val results = firstPass.map { case (name, t) =>
      if (retryNames.contains(name)) name -> math.min(t, timeOne(name, byName(name)))
      else name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the min-of-two retry above was introduced in r11; every earlier
    // bench_history line is single-shot, so also record the RAW
    // (first-pass, un-re-measured) total and the retried names — the
    // trend tool compares like with like and a cross-round delta can
    // always be read off the raw field
    val rawTotal = firstPass.map(_._2).sum
    val retriedJson = retryNames.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // streaming queries carry fixed multi-second startup (checkpoint +
    // state-store init per run) — split them out so the batch trend is
    // readable round-over-round
    val streamTotal = results
      .filter { case (k, _) => SparkEntry.streamingQueries.contains(k) }
      .map(_._2).sum
    val loadEnd = loadavg1m()
    // contamination keys on the START loadavg only: the END value is
    // dominated by the bench's own local[N] work (clean historical
    // runs end at 8-10 on this host) and cannot distinguish a busy
    // host from an honest run — it stays recorded for transparency
    val contaminated = loadStart > loadThreshold
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","streaming_total_s":$streamTotal,"batch_total_s":${total - streamTotal},"raw_total_s":$rawTotal,"retried":$retriedJson,"n_streaming_queries":${SparkEntry.streamingQueries.size},"cpus":$cpus,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"contaminated":$contaminated}"""
    println(line)
    // BENCH_r*.json captures only the stdout tail, which loses the
    // per-query times for over half the suite — persist the complete
    // record so round-over-round regressions in EVERY query stay
    // visible (appended: one line per bench run, committed with the
    // round)
    try {
      val docs = new java.io.File("docs")
      if (docs.isDirectory) {
        val stamped = s"""{"ts_ms":${System.currentTimeMillis()},""" +
          line.drop(1)
        val w = new java.io.FileWriter("docs/bench_history.jsonl", true)
        try w.write(stamped + "\n") finally w.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
