package graft

import org.apache.spark.sql.SparkSession

object Bench {
  /** 1-minute host load — emitted per query so a future reader can
    * separate noisy-neighbor swings from genuine regressions without
    * re-running (this host shows 3-30x swings under external load).
    */
  private def loadavg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .trim.split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** Entry-fixture dirs under `root` (versioned tables, catalog data,
    * persisted indexes — the graft-<entry>-* prefixes the query
    * builders create). GenScale data dirs (graft-sf1 etc.) and other
    * harness scratch don't match and are kept.
    */
  private[graft] val fixtureRe =
    "^graft-(ckpt|contam|attr|d\\d+|m\\d+|mm\\d+|p\\d+|q\\d+|s\\d+|st\\d+)".r

  /** Remove every entry fixture under `root` so the next build is
    * COLD; returns the removed names. Called at bench start (a killed
    * earlier JVM leaks warm fixtures) and again before every
    * load-gated rerun — the rerun executes in the same JVM that
    * already built everything, and without a sweep+[[Fixtures]] reset
    * it times a warm fixture (the round-10 p03 escape: first pass at
    * host load 5.56 > max 5.0 triggered a rerun, the warm 0.87 s beat
    * the cold 4.7 s, and the "faster figure" rule committed it).
    */
  private[graft] def sweepFixtures(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        fixtureRe.findFirstIn(f.getName).isDefined)
      .flatMap { f =>
        try { TempDirs.rmTree(f.getAbsolutePath); Some(f.getName) }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] fixture sweep ${f.getName}: $e")
          None }
      }.toSeq

  /** Full cold start without a JVM restart: sweep the fixture dirs AND
    * clear the in-JVM memo maps that remember them (a memo pointing at
    * a swept path would serve a dangling fixture).
    */
  private[graft] def coldReset(root: String): Unit = {
    Fixtures.resetAll()
    sweepFixtures(root)
    ()
  }

  def main(args: Array[String]): Unit = {
    // scope ALL fixture/scratch dirs this JVM creates under a
    // bench-owned root, so the cold-start sweep below can never
    // delete a concurrent test/verify JVM's fixtures (those live
    // under the unscoped java.io.tmpdir default). Must run before
    // anything touches TempDirs.
    val benchRoot = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-bench").getAbsolutePath
    System.setProperty("graft.scratch", benchRoot)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic fixture lifecycle (round-10): entry fixtures are
    // normally removed at JVM exit — but a killed builder JVM leaks
    // them, and a leaked warm fixture made identical code swing
    // 0.3 <-> 3.4 s across rounds (q85/q70, round-9 verdict: the
    // bench's dominant noise). Sweep BEFORE timing so every bench run
    // times the same cold build.
    sweepFixtures(benchRoot)
    // warm up JVM/session (scheduler, codegen, parquet footer reads) so
    // the first timed query doesn't absorb startup cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n =>
      try Tables(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () })
    // optional args = query-name substrings to run (local profiling);
    // the driver passes none and gets the full suite
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               tag: String): (Double, Boolean, Double) = {
      val load0 = loadavg()
      val t0 = System.nanoTime()
      // full evaluation via the noop sink: under a bare count() Catalyst
      // prunes every unreferenced projection, so map-only queries would
      // be timed as scans rather than as the work they claim to measure
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name$tag FAILED: $e"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name$tag $sec%.2f s" +
        (if (ok) "" else " (failed)"))
      // queries are independent: drop any cache an operator built so
      // later queries aren't squeezed by accumulated blocks
      spark.catalog.clearCache()
      (sec, ok, load0)
    }
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok, load0) = runOne(name, fn, "")
      (name, fn, sec, ok, load0)
    }
    // load-gated rerun (round-6 verdict task 5): a timing taken while
    // the host load exceeds SPARK_GRAFT_LOAD_MAX is noisy-neighbor
    // suspect — rerun it once after the full pass (the host is often
    // quiet again by then) and HEADLINE the faster figure; both are
    // emitted so a reader can audit the substitution. Clean-host runs
    // rerun nothing and behave exactly as before.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "5.0").toDouble
    val reruns: Map[String, (Double, Double)] = firstPass.collect {
      case (name, fn, _, true, load0) if load0 > loadMax =>
        // a rerun must be as COLD as the first pass: the first pass
        // already built this JVM's fixtures, and an entry re-timed
        // against its own warm fixture reports build-free time the
        // committed map then presents as cold (the round-10 p03
        // escape). Sweep dirs + reset the fixture memos first.
        coldReset(benchRoot)
        val (sec2, ok2, load2) = runOne(name, fn, " [rerun]")
        name -> (if (ok2) (sec2, load2) else (Double.MaxValue, load2))
    }.toMap
    val results = firstPass.map { case (name, _, sec, ok, load0) =>
      val best = reruns.get(name) match {
        case Some((sec2, _)) if sec2 < sec => sec2
        case _ => sec
      }
      (name, best, ok, load0)
    }
    // a failed query reports -1 (never a truncated wall time) so broken
    // queries can't masquerade as fast ones; errors also listed
    def r3(v: Double) = BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val qs = results.map { case (k, v, ok, _) =>
      s"\"" + k + "\":" + (if (ok) r3(v) else -1) }.mkString("{", ",", "}")
    val loads = results.map { case (k, _, _, l) =>
      s"\"" + k + "\":" + l }.mkString("{", ",", "}")
    val rr = reruns.toSeq.sortBy(_._1).map { case (k, (s2, l2)) =>
      s"\"" + k + "\":[" + (if (s2 == Double.MaxValue) -1 else r3(s2)) +
        "," + l2 + "]" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    // any failure invalidates the total for cross-run comparison: a run
    // where the slowest query failed would otherwise report a lower sum
    val valid = results.forall(_._3)
    // key order matters: the harness keeps only a ~2000-char TAIL of
    // the output, so the per-query timings map goes LAST (round 5 lost
    // its timings when the load map crowded them out of the tail)
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","valid":$valid,"sf":"$sfDir","load_max":$loadMax,"reruns_sec_load":$rr,"errors":$errs,"load_1m_at_start":$loads,"queries":$qs}"""
    // at 200+ queries the full line (~6 KB) no longer fits any ~2 KB
    // capture window, so BENCH_r07 carried parsed:null. Emit a COMPACT
    // headline line — total + the slowest 25 queries + a pointer to
    // the full map — sized to survive truncation whole. It must be the
    // LAST stdout line: the capture keeps a TAIL, so printing it first
    // (round 8) scrolled it out behind the full line and the driver
    // parsed nothing. Full line first, compact headline last.
    val slow = results.filter(_._3).sortBy(-_._2).take(25)
      .map { case (k, v, _, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // round-15 (PERF_r14 n_common=0 fix): the compact line now carries
    // the FULL per-query map inline — BENCH_LOCAL.json is scratch that
    // every run overwrites, so a pointer to it left the next round's
    // driver with no prev map to diff against (geomean null two rounds
    // running). All pre-existing fields are kept; the map is ~8 KB and
    // the r14 capture demonstrably parsed both emitted lines whole.
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","valid":$valid,"sf":"$sfDir","errors":$errs,"n_queries":${results.size},"full_map":"BENCH_LOCAL.json","slowest25":$slow,"queries":$qs}"""
    println(line)
    println(compact)
    // truncation-proof sibling: the full line also lands in-repo so
    // per-query numbers stay machine-readable regardless of capture
    // limits (the driver commits it with round-end state), plus a
    // per-run-id copy so successive runs never overwrite each other's
    // record within a round
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_LOCAL", "BENCH_LOCAL.json")),
        (line + "\n").getBytes("UTF-8"))
      val runsDir = java.nio.file.Paths.get("target/bench_runs")
      java.nio.file.Files.createDirectories(runsDir)
      java.nio.file.Files.write(
        runsDir.resolve(s"bench_${System.currentTimeMillis()}.json"),
        (line + "\n").getBytes("UTF-8"))
    }
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL write failed: $e") }
    spark.stop()
  }
}
