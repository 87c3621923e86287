package graft

/** Recursive deletion for the per-invocation temp trees the
  * streaming/index-reuse queries stage under java.io.tmpdir (q86, q92,
  * q93). One definition instead of three inline walks, and unlike the
  * inline form it CLOSES the `Files.walk` stream (each walk holds open
  * directory handles until closed — the inline copies leaked them
  * until GC). Callers invoke from `finally` so an exception mid-query
  * cannot orphan checkpoint/index stores on disk; deletion failures
  * are swallowed (cleanup must never mask the real failure).
  */
private[graft] object TmpTrees {
  def delete(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        // preorder lists parents before children; reversed deletes
        // leaves first
        walk.iterator().asScala.toSeq.reverse.foreach { f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () }
        }
      } finally walk.close()
    }
  }
}
