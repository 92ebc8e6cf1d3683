package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Small filesystem helpers that CLOSE their directory streams —
  * `Files.list`/`Files.walk` hold an open directory handle until
  * close(), so the bare `.iterator().asScala` pattern leaks one fd per
  * call (a long-lived driver doing per-commit listings eventually hits
  * the process fd limit).
  */
object Fs {

  /** Children of `p` (empty when not a directory), stream closed. */
  def list(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toList finally s.close()
    }

  /** Recursive copy of a directory tree (driver-local scratch only —
    * e.g. seeding a fresh bench fixture from a pristine template
    * without re-running the Spark write that produced it). */
  def copyRecursively(from: Path, to: Path): Unit = {
    val s = Files.walk(from)
    val all = try s.iterator().asScala.toList finally s.close()
    all.sortBy(_.getNameCount).foreach { src =>
      val dst = to.resolve(from.relativize(src))
      if (Files.isDirectory(src)) Files.createDirectories(dst)
      else {
        Files.createDirectories(dst.getParent)
        Files.copy(src, dst)
      }
    }
  }

  /** Recursive delete (no-op when absent), streams closed. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toList finally s.close()
      all.sortBy(-_.getNameCount).foreach(f => Files.deleteIfExists(f))
    }
}
