package graft



import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonLines

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("k", LongType).add("name", StringType)

  test("readAudit keeps every line: valid rows parse, corrupt rows " +
      "carry the raw line verbatim for quarantine") {
    val dir = TempDirs.createCleanedAtExit("graft-jsonaudit")
    val lines = Seq(
      """{"k": 1, "name": "alpha"}""",
      """{"k": 2, "name"  """, // truncated mid-object
      """not json at all""",
      """{"k": 3, "name": "gamma"}""")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)

    val audit = JsonLines.readAudit(spark, dir, schema)
    assert(audit.count() == 4) // nothing dropped, nothing fatal
    val good = audit.filter(col("_corrupt_record").isNull)
      .select("k", "name").as[(Long, String)].collect().toSet
    assert(good == Set((1L, "alpha"), (3L, "gamma")))
    // the quarantine contract: the ORIGINAL malformed line survives
    val bad = audit.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSet
    assert(bad == Set("""{"k": 2, "name"  """, "not json at all"))
  }

  test("readAudit survives a corrupt-column-only projection " +
      "(the raw-json-scan form throws QUERY_ONLY_CORRUPT_RECORD_COLUMN here)") {
    val dir = TempDirs.createCleanedAtExit("graft-jsonaudit2")
    Seq("""{"k": 1, "name": "a"}""", "oops").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val nBad = JsonLines.readAudit(spark, dir, schema)
      .filter(col("_corrupt_record").isNotNull).count()
    assert(nBad == 1)
  }
}
