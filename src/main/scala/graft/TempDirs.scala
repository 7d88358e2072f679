package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped temp directories with guaranteed cleanup.
  *
  * `File.deleteOnExit` only removes EMPTY directories, so registering the
  * dir alone leaks every parquet file written inside it — each Bench/Verify
  * run left the full docs/entities/edges/assembled corpora in /tmp. A JVM
  * shutdown hook deleting recursively removes the whole tree.
  */
object TempDirs {
  private val dirs = scala.collection.concurrent.TrieMap.empty[Path, Unit]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.keys.foreach(p => try deleteRecursively(p) catch { case _: Throwable => () })))

  /** Create a temp dir removed (recursively) at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.put(p, ())
    p
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // Files.walk is AutoCloseable and holds directory handles — close it
      // or repeated calls in a long session leak file descriptors.
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
