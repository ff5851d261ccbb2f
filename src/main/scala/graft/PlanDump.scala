package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected registry entries to files —
  * the optimization-round evidence trail (plans/r14/<query>_<tag>.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <querySubstr>...
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench, builds each
  * matching entry's DataFrame (fixtures and all), and writes the
  * formatted physical plan. No timing — plan shape only.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val filters = args.drop(2)
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-plandump").getAbsolutePath
    System.setProperty("graft.scratch", scratch)
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
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
      .toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        System.err.println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
