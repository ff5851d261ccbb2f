package graft

import org.apache.spark.sql.functions._

import graft.sources.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compacting write fuses a 64-partition input into few sized files") {
    val df = spark.range(0, 500000)
      .select($"id", ($"id" % 97).as("k"), rand(7).as("v"))
      .repartition(64)
    val naive = TempDirs.createCleanedAtExit("graft-compact-naive")
    df.write.mode("overwrite").parquet(naive)
    assert(Compact.partFileCount(naive) == 64)
    val sized = TempDirs.createCleanedAtExit("graft-compact-sized")
    Compact.write(df, sized, targetBytes = 4L << 20)
    val n = Compact.partFileCount(sized)
    // ~5-6 MB of parquet at a 4 MB target: a couple of files, never 64
    assert(n >= 1 && n <= 8, s"got $n part files")
    // lossless: same rows, same values. The long sum is exact; the
    // double sum is order-dependent (different partitioning on each
    // side), so compare with a tolerance, not after rounding — a
    // ~250k-magnitude sum's accumulation-order drift can straddle a
    // rounding boundary.
    val back = spark.read.parquet(sized)
    assert(back.count() == 500000)
    val s1 = df.agg(sum($"id"), sum($"v")).head()
    val s2 = back.agg(sum($"id"), sum($"v")).head()
    assert(s1.getLong(0) == s2.getLong(0))
    assert(math.abs(s1.getDouble(1) - s2.getDouble(1)) < 1e-4)
  }

  test("write never mutates the caller session's advisory size") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(key)
    val out = TempDirs.createCleanedAtExit("graft-compact-conf")
    Compact.write(spark.range(0, 1000).toDF("id"), out, 1L << 20)
    assert(spark.conf.getOption(key) == before,
      "caller conf changed by Compact.write")
    assert(spark.read.parquet(out).count() == 1000)
    // and the writer session's view registration is cleaned up
    assert(spark.sql("SHOW VIEWS IN global_temp")
      .filter(col("viewName").startsWith("graft_compact_")).count() == 0)
  }

  test("mergeSchema read surfaces missing columns as nulls") {
    val out = TempDirs.createCleanedAtExit("graft-merge-spec")
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite")
      .parquet(s"$out/v1")
    Seq((2L, "b", 9.5)).toDF("id", "s", "x").write.mode("overwrite")
      .parquet(s"$out/v2")
    val m = Compact.readMerged(spark, s"$out/v1", s"$out/v2")
      .orderBy("id").as[(Long, String, Option[Double])].collect()
    assert(m.toSeq == Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }
}
