package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** JVM-temp scratch dirs with ONE shared exit-time cleaner.
  *
  * Per-call `addShutdownHook` registrations accumulate unboundedly in a
  * long-lived bench/session loop (one thread object per query run);
  * here a single hook sweeps an appendable list instead. `rmTree`
  * closes its `Files.walk` stream (a leaked stream holds the directory
  * fd until GC).
  */
object TempDirs {

  private val cleanupAtExit =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  // one JVM-wide hook, registered on first use of this object
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    cleanupAtExit.iterator().asScala.foreach(p =>
      try rmTree(p) catch { case _: Throwable => () })
  }, "graft-tempdir-cleaner"))

  /** Recursive delete; closes the walk stream. */
  def rmTree(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      Using.resource(Files.walk(root)) { st =>
        st.iterator().asScala.toSeq.reverse
          .foreach((p: Path) => Files.deleteIfExists(p))
      }
    }
  }

  /** Create a temp dir removed at JVM exit — for artifacts a returned
    * DataFrame still reads lazily (an eager delete would pull the files
    * out from under the caller).
    */
  def createCleanedAtExit(prefix: String): String = {
    val p = Files.createTempDirectory(prefix).toString
    cleanupAtExit.add(p)
    p
  }

  /** Register a caller-chosen path for exit-time removal (for stable,
    * content-keyed scratch locations reused across calls in one JVM —
    * e.g. a persisted index keyed by its corpus).
    */
  def registerCleanedAtExit(path: String): Unit =
    cleanupAtExit.add(path)
}
