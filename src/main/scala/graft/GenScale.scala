package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1 scale-proof runs (round-8 task 1):
  * synthesizes `factor`x data from an existing harness SF directory by
  * unioning key-shifted copies — the TPC-H scaling model, where a
  * bigger SF means MORE customers each with their own orders, not
  * denser references to the same customers. Every copy's foreign keys
  * shift by the same stride, so join selectivity, group cardinality
  * per key, and graph degree distributions match the source SF
  * exactly while total volume grows by `factor`; measured runtimes
  * then isolate the engine's scaling behavior from density changes.
  *
  * Copy-distinguishing tweaks: document texts get a per-copy suffix
  * token (so near-dup structure is per-copy, like the source, instead
  * of every doc gaining `factor - 1` exact mirrors) and embeddings get
  * a tiny first-component nudge (no exact cross-copy cosine ties).
  * The dimension tables (region, nation) stay fixed, as TPC-H's do.
  *
  * Usage: runMain graft.GenScale <srcDir> <outDir> <factor>
  * (writes one parquet dir per table under outDir; Tables reads
  * `<name>.parquet` paths, so outputs use the same naming).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    val copies = spark.range(factor).toDF("__copy")

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[genscale] wrote $name x$factor")
    }

    def fanned(name: String): DataFrame =
      Tables(spark, src, name).crossJoin(copies)

    /** Shift the named long-key columns by `__copy * stride`, keep the
      * rest verbatim, drop the copy index. Asserts max(key) < stride
      * per shifted column: a source whose keys already reach the
      * stride (a larger source SF, or GenScale chained on its own
      * output) would silently collide keys ACROSS copies, corrupting
      * the join selectivity and dup structure this tool exists to
      * preserve — fail loudly instead.
      */
    def shifted(name: String, strides: Map[String, Long]): DataFrame = {
      val src0 = Tables(spark, src, name)
      val maxes = src0.select(strides.keys.toSeq.map(c =>
        max(col(c).cast("long")).as(c)): _*).head()
      strides.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((c, k), _) =>
        val m = maxes.getAs[Long](c)
        require(m < k,
          s"[genscale] $name.$c max key $m >= stride $k: copies would " +
            "collide; raise the stride or use an un-scaled source")
      }
      val df = fanned(name)
      df.select(df.columns.filter(_ != "__copy").map { c =>
        strides.get(c) match {
          case Some(k) => (col(c) + col("__copy") * k).as(c)
          case None => col(c)
        }
      }: _*)
    }

    // dimensions stay fixed (the TPC-H rule: nations don't multiply)
    write(Tables(spark, src, "region"), "region", 1)
    write(Tables(spark, src, "nation"), "nation", 1)

    val CUST = 1000000L; val SUPP = 100000L; val PART = 1000000L
    val ORD = 10000000L; val EVT = 10000000L; val USR = 100000L
    val DOC = 1000000L

    write(shifted("customer", Map("c_custkey" -> CUST)), "customer", 4)
    write(shifted("supplier", Map("s_suppkey" -> SUPP)), "supplier", 1)
    write(shifted("part", Map("p_partkey" -> PART)), "part", 4)
    write(shifted("orders",
      Map("o_orderkey" -> ORD, "o_custkey" -> CUST)), "orders", 8)
    write(shifted("lineitem",
      Map("l_orderkey" -> ORD, "l_partkey" -> PART,
        "l_suppkey" -> SUPP)), "lineitem", 32)
    write(shifted("events",
      Map("event_id" -> EVT, "user_id" -> USR)), "events", 8)

    // documents: shift ids, make texts per-copy distinct with a suffix
    // token (and keep n_chars = length(text) true). Same collision
    // guard as shifted(): doc/vec ids must fit under the DOC stride.
    for (tn <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id")) {
      val m = Tables(spark, src, tn._1)
        .agg(max(col(tn._2).cast("long"))).head().getLong(0)
      require(m < DOC,
        s"[genscale] ${tn._1}.${tn._2} max key $m >= stride $DOC: " +
          "copies would collide")
    }
    val docs = fanned("documents")
    write(docs.select(
      (col("doc_id") + col("__copy") * DOC).as("doc_id"),
      concat(col("text"), lit(" c"), col("__copy")).as("text"),
      col("lang"), col("source"),
      (col("n_chars") + lit(2) +
        length(col("__copy").cast("string"))).as("n_chars")),
      "documents", 8)

    // embeddings: shift ids, nudge the first component per copy so
    // cross-copy vectors are near- but not exactly identical
    val embs = fanned("embeddings")
    write(embs.select(
      (col("vec_id") + col("__copy") * DOC).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, (x + col("__copy").cast("float") * lit(0.001f))
          .cast("float")).otherwise(x)).as("embedding"),
      col("label")),
      "embeddings", 4)

    spark.stop()
  }
}
