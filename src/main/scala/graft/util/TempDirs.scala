package graft.util

/** Shared registry of temp roots created by this JVM (streaming sinks,
  * text-I/O round-trips, bucketed/partitioned layout builds), removed
  * recursively at shutdown. `File.deleteOnExit` cannot remove non-empty
  * directories, and callers hand out DataFrames that read the files
  * lazily, so removal cannot happen any earlier than JVM exit. */
object TempDirs {
  private val roots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      }))
  }

  /** Create a fresh temp directory cleaned up at JVM shutdown. */
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
