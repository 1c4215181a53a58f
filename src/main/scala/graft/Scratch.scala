package graft

/** Host-local scratch policy, shared by the harness mains
  * ([[Bench]], [[Verify]], `tools.BenchOne`) and the query scratch
  * allocator: prefer the tmpfs mount when one is writable —
  * streaming checkpoints, sink dirs, and shuffle spill are thousands
  * of tiny fsync'd files, and the bench host mounts a large tmpfs.
  * Harness-local only; cluster deployments provision their own
  * local dirs and pass real storage paths into the job functions.
  */
object Scratch {

  private val Tmpfs = java.nio.file.Paths.get("/dev/shm")

  /** The tmpfs root when present and writable. */
  def tmpfsBase: Option[java.nio.file.Path] =
    if (java.nio.file.Files.isDirectory(Tmpfs) &&
        java.nio.file.Files.isWritable(Tmpfs)) Some(Tmpfs)
    else None

  /** `spark.local.dir` value: tmpfs-backed when available, else the
    * JVM temp dir.
    */
  def sparkLocalDir: String =
    tmpfsBase.map(_.resolve("graft-spark-local").toString)
      .getOrElse(System.getProperty("java.io.tmpdir"))
}
