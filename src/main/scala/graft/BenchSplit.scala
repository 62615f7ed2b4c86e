package graft

/** Scale-adaptive parquet split size for the bench/probe sessions:
  * `clamp(listedBytes / (3 · cpus), 64 KB, 128 MB)` — roughly three
  * scan-task waves per core on the local single-file sf tables, and
  * exactly Spark's 128 MB default once the input is big enough that
  * split sizing stops being the parallelism bottleneck (a real
  * cluster gets its splits from many files). Replaces the previous
  * 64 KB CONSTANT, which fanned a 17 MB corpus into hundreds of
  * micro-tasks whose scheduling overhead lost to an 8-core run under
  * co-tenant load.
  */
object BenchSplit {
  def size(sfDir: String, cpus: String): Long = {
    import scala.jdk.CollectionConverters._
    val nCpus = scala.util.Try(cpus.toInt).getOrElse(4).max(1)
    val bytes =
      try {
        val stream = java.nio.file.Files
          .list(java.nio.file.Paths.get(sfDir))
        try stream.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
        finally stream.close()
      } catch { case _: Throwable => 0L }
    math.max(65536L, math.min(128L << 20, bytes / (3L * nCpus)))
  }
}
