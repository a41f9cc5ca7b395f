package graft

/** Small filesystem helpers shared by the bench harness and fixture
  * machinery (one definition — the recursive delete was previously
  * duplicated between Bench and MultimodalQueries). */
object IoUtil {

  /** Recursive delete, children first. Closes the walk stream — a bare
    * `Files.walk` holds directory handles until GC, which on some
    * filesystems blocks the deletes it is feeding. Throws nothing away
    * silently: callers choose whether to swallow (both current callers
    * are best-effort cleanup and do). */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally walk.close()
  }
}
