package graft.util

import java.nio.file.{Files, Paths}
import java.util.Comparator

/** Staging-directory lifecycle for the self-staging queries and specs
  * (format round trips, ingest e2e): one place for the recursive
  * delete, instead of the four copies the round-11 advice flagged.
  */
object TempDirs {

  /** Recursively delete `root` if it exists (children first). */
  def rm(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
  }

  /** Fresh temp dir for `body`, ALWAYS removed afterwards — callers
    * must materialize (collect/localCheckpoint) anything derived from
    * files under it before returning.
    */
  def withTempDir[A](prefix: String)(body: String => A): A = {
    val tmp = Files.createTempDirectory(prefix).toFile.getAbsolutePath
    try body(tmp) finally rm(tmp)
  }
}
