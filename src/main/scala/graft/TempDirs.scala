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
  *
  * SCOPING (round-11): every scratch/fixture path is created under
  * [[scratchRoot]] — `java.io.tmpdir` by default, or the
  * `graft.scratch` system property when set. The bench sets the
  * property to a bench-owned subdirectory before anything else runs,
  * so its cold-start fixture sweep can never delete a concurrently
  * running test/verify JVM's fixtures out from under it (those land
  * under the unscoped default root).
  */
object TempDirs {

  private val cleanupAtExit =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  // one JVM-wide hook, registered on first use of this object
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    cleanupAtExit.iterator().asScala.foreach(p =>
      try rmTree(p) catch { case _: Throwable => () })
  }, "graft-tempdir-cleaner"))

  /** Root for all scratch/fixture dirs this JVM creates. Read at every
    * call (not cached) so the bench can scope it first thing in main.
    */
  def scratchRoot: String = {
    val r = sys.props.getOrElse("graft.scratch",
      System.getProperty("java.io.tmpdir"))
    new java.io.File(r).mkdirs()
    r
  }

  /** Stable, caller-keyed fixture location under [[scratchRoot]] (for
    * build-once fixtures reused across calls in one JVM — versioned
    * tables, persisted indexes — keyed by their dataset).
    */
  def fixturePath(name: String): String =
    new java.io.File(scratchRoot, name).getAbsolutePath

  /** Unique scratch dir under [[scratchRoot]], NOT exit-cleaned — for
    * sources/checkpoints the caller deletes eagerly itself.
    */
  def createScratch(prefix: String): String =
    Files.createTempDirectory(Paths.get(scratchRoot), prefix).toString

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
    val p = createScratch(prefix)
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

/** Registry of build-once fixture CACHES (the in-JVM memo maps that
  * remember "this dataset's fixture is already built at path P").
  *
  * Why it exists: the bench's cold-run contract sweeps fixture
  * DIRECTORIES before timing, but a per-JVM memo that still points at
  * the swept path would then serve a dangling fixture — and, worse,
  * the load-gated RERUN path used to re-time entries inside the same
  * JVM where the first pass had already built everything, so the
  * committed "cold" map carried warm readings (round-10's p03 at
  * 0.87 s vs its 4.7-5.2 s cold band — the escape happened twice
  * before the mechanism was found). Every memo registers a reset here;
  * [[resetAll]] + a directory sweep restores a true cold start without
  * a JVM restart.
  */
object Fixtures {
  private val resets =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  def onReset(f: () => Unit): Unit = resets.add(f)

  /** Clear every registered fixture memo (the directories are the
    * caller's to sweep — [[graft.Bench.sweepFixtures]]).
    */
  def resetAll(): Unit =
    resets.iterator().asScala.foreach(f => f())
}
