package graft



import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Csv

class CsvSpec extends SparkSpec {
  import spark.implicits._

  test("CSV sink round-trips a report table (S2/S3)") {
    val report = Seq(("AL", 12.34, 3L), ("AK", 56.78, 7L), ("AZ", 9.01, 2L))
      .toDF("state", "est", "n")
    val dir = TempDirs.createCleanedAtExit("graft-csv")
    Csv.write(report, dir, header = true, singleFile = true)
    // exactly one part file when singleFile requested
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val schema = StructType(Seq(
      StructField("state", StringType), StructField("est", DoubleType),
      StructField("n", LongType)))
    val back = Csv.read(spark, dir, schema)
      .orderBy("state").as[(String, Double, Long)].collect().toSeq
    assert(back == Seq(("AK", 56.78, 7L), ("AL", 12.34, 3L), ("AZ", 9.01, 2L)))
  }

  test("CSV sink stays partitioned for data-sized extracts") {
    val big = spark.range(0, 1000).repartition(4)
      .withColumn("v", col("id") * 2)
    val dir = TempDirs.createCleanedAtExit("graft-csv-par")
    Csv.write(big, dir) // no coalesce
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 4)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    assert(Csv.read(spark, dir, schema).count() == 1000)
    assert(Csv.read(spark, dir, schema).agg(sum("v")).as[Long].head() ==
      999L * 1000L)
  }
}
