package graft

import org.apache.spark.sql.SparkSession

import graft.fuzz.{Differ, QueryFuzzer}

/** Ad-hoc differential fuzz CAMPAIGN driver — the same generator +
  * compare the in-suite FuzzSpec gate runs at 220 seeds, runnable at
  * campaign scale and at any data scale:
  *
  *   sbt "runMain graft.Fuzz <sfDir> <fromSeed> <toSeed>"
  *   sbt "runMain graft.Fuzz /root/testdata/sf0.001 1 2000"
  *
  * Runs every seed in [from, to] through Spark (Column-API plan) and
  * DuckDB (generated ANSI SQL, batched subprocess per 500 queries),
  * prints one JSON summary line, shrinks and prints every divergence,
  * exits 1 on any. Campaign results are recorded in BASELINE.md; a
  * divergence becomes a pinned regression entry (FuzzQueries).
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val from = args.lift(1).map(_.toInt).getOrElse(1)
    val to = args.lift(2).map(_.toInt).getOrElse(from + 1999)
    require(Differ.duckAvailable(), "python3+duckdb required")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pools = QueryFuzzer.samplePools(spark, sfDir)
    val t0 = System.nanoTime()
    var failures = 0
    (from to to).grouped(500).foreach { chunk =>
      val queries = chunk.map(s => s"q$s" -> QueryFuzzer.gen(s, pools))
      val duck = Differ.runDuck(sfDir, queries.map { case (n, q) =>
        n -> q.sql }.toMap)
      queries.foreach { case (n, q) =>
        Differ.diff(spark, sfDir, q, duck(n)).foreach { reason =>
          failures += 1
          val (minQ, minReason) =
            Differ.minimize(spark, sfDir, q, reason)
          System.err.println(s"[fuzz] DIVERGENCE $n: $reason\n" +
            s"[fuzz] minimal repro (seed ${q.seed}): ${minQ.sql}\n" +
            s"[fuzz] minimal diff: $minReason")
        }
      }
      System.err.println(s"[fuzz] ...through seed ${chunk.last}: " +
        s"$failures divergence(s)")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"fuzz","seeds":${to - from + 1},""" +
      f""""divergences":$failures,"sf":"$sfDir","sec":$sec%.1f}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
