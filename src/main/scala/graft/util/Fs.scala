package graft.util

import java.nio.file.{Files, Path}

/** Filesystem helpers shared by the harness mains and specs. */
object Fs {

  /** Recursively delete `root` (children first). `Files.walk` holds an
    * open directory stream until closed, so the walk is consumed and
    * closed BEFORE any deletion starts — the unclosed-stream /
    * triplicated-idiom finding from the r9 review. Missing paths are a
    * no-op. */
  def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    val walk = Files.walk(root)
    val paths =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toVector
      } finally walk.close()
    paths.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }
}
