package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of registry entries — the optimization round's
  * measurement tool (guide §1: decide whether time goes to shuffle,
  * compute, or scheduling BEFORE changing anything).
  *
  * Usage: runMain graft.Prof <querySubstr>... — runs each matching
  * entry once through the noop sink (same timed action as Bench) and
  * prints every completed stage's task count, wall span, summed
  * executor run/CPU time, shuffle read/write bytes and records, and
  * the stage's callsite, ordered by wall span.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-prof").getAbsolutePath
    System.setProperty("graft.scratch", scratch)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up, as in Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n =>
      try Tables(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () })
    final case class St(id: Int, name: String, tasks: Int, wallMs: Long,
                        runMs: Long, cpuMs: Long, shRead: Long,
                        shWrite: Long, recsIn: Long, recsOut: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add(St(i.stageId, i.name, i.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten))
      }
    }
    val selected = SparkEntry.queries
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
      .toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        spark.sparkContext.setJobDescription(name)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        println(s"== $name FAILED: $e")
      } finally {
        spark.sparkContext.setJobDescription(null)
        spark.sparkContext.removeSparkListener(listener)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give queued events a moment to land
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val all = stages.iterator().asScala.toSeq
      println(f"== $name: $sec%.2f s, ${all.size} stages, " +
        f"${all.map(_.tasks).sum} tasks, " +
        f"sum(stage wall) ${all.map(_.wallMs).sum / 1000.0}%.2f s")
      println(f"${"stage"}%5s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s " +
        f"${"cpu_s"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"recIn"}%9s " +
        f"${"recShW"}%9s  name")
      all.sortBy(-_.wallMs).take(30).foreach { s =>
        println(f"${s.id}%5d ${s.tasks}%5d ${s.wallMs / 1000.0}%7.2f " +
          f"${s.runMs / 1000.0}%7.2f ${s.cpuMs / 1000.0}%7.2f " +
          f"${s.shRead / 1e6}%7.1f ${s.shWrite / 1e6}%7.1f " +
          f"${s.recsIn}%9d ${s.recsOut}%9d  ${s.name.take(80)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
