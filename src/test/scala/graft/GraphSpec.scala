package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-computed path graph") {
    // undirected path a - b - c, symmetrized: deg a=1, b=2, c=1
    // r0 = 1/3 each; contributions: b <- a + c = 2/3, a <- b/2 = 1/6,
    // c <- b/2 = 1/6; r1 = 0.05 + 0.85 * m
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 / 6)) < 1e-12)
  }

  test("pageRank conserves total mass and is partitioning-invariant") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 400)
      .map(_ => (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}"))
      .filter(e => e._1 != e._2).distinct
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 4)
    // on a symmetrized graph (no dangling mass) total rank stays 1
    val total = r.agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
    // mass flows toward high-degree nodes
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val top = r.join(deg, r("node") === deg("src"))
      .orderBy(desc("pr")).select("deg").head().getLong(0)
    val maxDeg = deg.agg(max("deg")).head().getLong(0)
    assert(top >= maxDeg / 2, s"top-rank node degree $top vs max $maxDeg")
    // rounded ranks are stable across input partitioning
    def rounded(parts: Int) =
      Graph.pageRank(edges.repartition(parts), iters = 4)
        .select($"node", round($"pr", 9).as("pr"))
        .as[(String, Double)].collect().toMap
    assert(rounded(3) == rounded(11))
  }

  test("bfsHops: hand-computed hops, multi-source min, hop bound, " +
      "unreachable nodes absent") {
    // two components: a-b-c-d chain (directed both ways) and x-y
    val base = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    def run(seeds: Seq[String], maxHops: Int) =
      Graph.bfsHops(edges, seeds.toDF("node"), maxHops)
        .as[(String, Long)].collect().toMap
    assert(run(Seq("a"), 3) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L,
      "d" -> 3L))
    // hop bound truncates; x/y component never appears
    assert(run(Seq("a"), 2) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // multi-source: hop = min over seeds; early-exit past the diameter
    assert(run(Seq("a", "d"), 9) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
    // seed with no out-edges is still reported at hop 0
    assert(run(Seq("y"), 1) == Map("y" -> 0L, "x" -> 1L))
  }
}
