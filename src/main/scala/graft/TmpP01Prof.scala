package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

// throwaway: candidate-count diagnosis of p01's fuzzy stage at sf3
object TmpP01Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf3")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextAnalysis
    val st = graft.queries.PipelineQueries.chainInputsOnly(spark, dir)
    println("[diag] surv1: " + st.count())
    val sh = st.select(col("doc_id").as("id"),
        TextAnalysis.tokens(col("clean")).as("toks"))
      .select(col("id"),
        sort_array(transform(
          array_distinct(TextAnalysis.shinglesOf(col("toks"), 3)),
          s => xxhash64(s))).as("sh"))
      .withColumn("setSize", size(col("sh")))
      .cache()
    val inv = sh.select(col("id"), col("setSize"),
      explode(col("sh")).as("shingle"))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy("id").orderBy(col("dfreq"), col("shingle"))
    val eps = 1e-9
    val pre = inv.join(dfreq, Seq("shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("setSize") - ceil(col("setSize") * 0.5 - eps) + 1)
      .select("id", "shingle", "rn", "setSize")
      .cache()
    println("[diag] pre rows: " + pre.count())
    // prefix-shingle hotness: the join cost is sum over shingles of
    // (prefix count)^2
    val hot = pre.groupBy("shingle").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("sum_c2"), max("c").as("max_c"),
        count(lit(1)).as("n_shingles"))
    hot.show(false)
    val top = pre.groupBy("shingle").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(5).collect()
    top.foreach(r => println("[diag] hot shingle count: " + r.getLong(1)))
  }
}
