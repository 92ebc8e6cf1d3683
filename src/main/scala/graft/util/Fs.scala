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

  /** End-of-run sweep of the scratch VersionedTable roots the battery
    * queries stage under `java.io.tmpdir` (every such path is named
    * `graft_*`; each query deletes ITS root before (re)building, never
    * after, so a full battery strands ~20 of them per JVM — VERDICT
    * r13 item 4). Called by [[graft.Bench]]/[[graft.Verify]] after the
    * battery; crash-safe because the next run's sweep collects what a
    * killed JVM left behind. Returns the number of roots removed.
    */
  def sweepTmpArtifacts(): Int = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val stranded = list(tmp).filter(_.getFileName.toString.startsWith("graft_"))
    stranded.foreach { p =>
      try deleteRecursively(p)
      catch { case e: java.io.IOException =>
        System.err.println(s"[tmp-sweep] could not remove $p: ${e.getMessage}")
      }
    }
    stranded.size
  }
}
