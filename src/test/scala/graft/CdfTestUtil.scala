package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Manifest-FREE change-feed ground truth shared by the history fuzz
  * (ChangeFeedFuzzSpec) and the commit-race fuzz (CommitRaceFuzzSpec):
  * the brute-force full-outer diff of two snapshot reads, aligned to
  * the union schema — independent of the manifests the feed itself
  * reads.
  */
object CdfTestUtil {

  def bruteDiff(spark: SparkSession, root: String,
                v: Int): Set[(String, Long)] = {
    val a = Versioned.readAsOf(spark, root, v - 1)
    val b = Versioned.readAsOf(spark, root, v)
    val cols = (a.columns ++ b.columns).distinct.filterNot(_ == "k")
    def aligned(df: DataFrame) = {
      val have = df.columns.toSet
      df.select(col("k").as("kk") +: cols.map(c =>
        if (have(c)) col(c) else lit(null).as(c)): _*)
        .select(col("kk"), struct(cols.map(col): _*).as("r"))
    }
    val j = aligned(a).as("a").join(aligned(b).as("b"),
      col("a.kk") === col("b.kk"), "full_outer")
    import spark.implicits._
    j.select(
        when(col("a.kk").isNull, array(struct(lit("insert").as("t"),
            col("b.kk").as("k"))))
        .when(col("b.kk").isNull, array(struct(lit("delete").as("t"),
            col("a.kk").as("k"))))
        .when(col("a.r") <=> col("b.r"), lit(null))
        .otherwise(array(
          struct(lit("update_preimage").as("t"), col("a.kk").as("k")),
          struct(lit("update_postimage").as("t"), col("b.kk").as("k"))))
          .as("c"))
      .select(explode(col("c")).as("c"))
      .select(col("c.t"), col("c.k"))
      .as[(String, Long)].collect().toSet
  }

  def feedOf(spark: SparkSession, root: String,
             v: Int): Set[(String, Long)] = {
    import spark.implicits._
    Versioned.changeFeed(spark, root, "k", v - 1, v)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
  }
}
