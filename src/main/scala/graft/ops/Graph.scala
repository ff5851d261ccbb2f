package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge DataFrames — the
  * iterative-join family next to [[Dedup.connectedComponents]].
  * Reference has no graph ops; this is part of the beyond-reference
  * large-pipeline surface (e.g. domain-graph ranking for crawl
  * prioritization / source weighting in training-data curation).
  */
object Graph {

  /** PageRank with fixed iteration count and damping, over a directed
    * edge list `(src, dst)`. Every node must have out-degree >= 1
    * (symmetrize the edge list first for undirected graphs — that also
    * eliminates dangling-mass bookkeeping); nodes are whatever appears
    * as a source.
    *
    * Scale shape: each iteration is ONE src-keyed hash join of the
    * degree-annotated edge list against the current rank vector plus
    * ONE dst-keyed aggregation — the standard message-passing
    * formulation. The edge list (with degrees attached once) is cached
    * and reused every iteration; only the rank vector (|V| rows, two
    * columns) changes. Iteration count is fixed and small (ranking
    * stabilizes in a few passes); at large K, localCheckpoint the rank
    * vector per round like connectedComponents does to truncate
    * lineage. Float note: contribution sums are combine-order
    * dependent; compare ROUNDED ranks (the oracle replays the same
    * arithmetic and rounds identically).
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src").cache()
    val n = deg.count()
    val jump = (1.0 - damping) / n
    var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = ed
        .join(ranks, ed("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("pr") / col("deg")).as("m"))
        .withColumnRenamed("dst", "node")
      ranks = deg.select(col("src").as("node"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(jump) + lit(damping) * coalesce(col("m"), lit(0.0)))
            .as("pr"))
      it += 1
    }
    ranks
  }
}
