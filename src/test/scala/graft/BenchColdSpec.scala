package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's cold-run contract (round-11): the committed bench map
  * must never carry a warm fixture reading. Round 10's escape: the
  * load-gated RERUN re-timed p03 inside the same JVM where the first
  * pass had already built its fixture — 0.87 s against a 4.7-5.2 s
  * cold band — twice. The fix is [[Bench.coldReset]]: sweep the
  * fixture dirs AND clear the in-JVM fixture memos before every
  * rerun. These specs pin both halves, plus the scoping that keeps
  * the sweep away from other JVMs' fixtures.
  */
class BenchColdSpec extends AnyFunSuite {

  test("sweepFixtures removes planted stale entry fixtures (p03 " +
    "included) but never GenScale data dirs or foreign names") {
    val root = java.nio.file.Files
      .createTempDirectory("bench-sweep-test").toString
    val stale = Seq("graft-p03-deadbeef", "graft-q85-cafe",
      "graft-st16-1a2b", "graft-contam-base123")
    val keep = Seq("graft-sf1", "graft-sf3", "graft-bench-lock",
      "unrelated-dir")
    (stale ++ keep).foreach(n =>
      new java.io.File(root, n).mkdirs())
    // a non-empty nested fixture must also go (rm -r, not rmdir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "graft-p03-deadbeef", "part-0"),
      "x".getBytes("UTF-8"))
    val removed = Bench.sweepFixtures(root).toSet
    assert(removed == stale.toSet, s"removed $removed")
    stale.foreach(n => assert(!new java.io.File(root, n).exists(), n))
    keep.foreach(n => assert(new java.io.File(root, n).exists(), n))
    TempDirs.rmTree(root)
  }

  test("coldReset makes a rerun rebuild: after sweep+reset the p03 " +
    "fixture memo does not serve the swept path — the next call " +
    "rebuilds the versioned table from scratch") {
    import graft.sources.Versioned
    val spark = SparkSpec.spark
    val scratch = java.nio.file.Files
      .createTempDirectory("bench-cold-test").toString
    val prevProp = sys.props.get("graft.scratch")
    try {
      System.setProperty("graft.scratch", scratch)
      Fixtures.resetAll() // drop memos pointing at the previous root
      val root1 = graft.queries.PipelineQueries
        .incrRoot(spark, "/root/testdata/sf0.001")
      assert(root1.startsWith(scratch), root1)
      assert(Versioned.hasVersion(root1, 2))
      // the warm-rerun bug, reproduced: sweep WITHOUT resetting the
      // memo and the cache still points at the (now dangling) path
      Bench.sweepFixtures(scratch)
      assert(!Versioned.hasVersion(root1, 2), "sweep missed p03")
      val dangling = graft.queries.PipelineQueries
        .incrRoot(spark, "/root/testdata/sf0.001")
      assert(dangling == root1 && !Versioned.hasVersion(dangling, 2),
        "memo unexpectedly rebuilt — if this starts failing the memo " +
          "design changed and this spec should be revisited")
      // the fix: coldReset sweeps AND resets, so the next call builds
      // a real cold fixture again
      Bench.coldReset(scratch)
      val root2 = graft.queries.PipelineQueries
        .incrRoot(spark, "/root/testdata/sf0.001")
      assert(Versioned.hasVersion(root2, 2),
        "cold rerun did not rebuild the fixture")
    } finally {
      prevProp match {
        case Some(p) => System.setProperty("graft.scratch", p)
        case None => System.clearProperty("graft.scratch")
      }
      // leave no memo pointing into the scratch root we delete
      Fixtures.resetAll()
      TempDirs.rmTree(scratch)
    }
  }
}
