package graft

import org.apache.spark.sql.functions._

import graft.ops.Spatial

/** Known-point gates for the HOF point-in-polygon spatial join (the
  * q72 oracle proves engine==DuckDB; this proves both are RIGHT on
  * unambiguous geography, including the multi-ring even-odd path).
  */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("pointInStateJoin tags unambiguous landmarks, multi-ring " +
      "states, and open water correctly") {
    val pts = Seq(
      (1L, -105.0, 39.7),  // Denver-ish, deep inside CO's rectangle
      (2L, -100.0, 44.4),  // central SD
      (3L, -88.0, 46.4),   // MI upper peninsula (ring 0)
      (4L, -84.5, 43.5),   // MI lower peninsula (ring 1)
      (5L, -130.0, 40.0),  // Pacific — no state
      (6L, -71.5, 43.5),   // NH-ish interior
      (7L, -97.0, 31.0))   // central TX
      .toDF("id", "lon", "lat")
    val got = Spatial.pointInStateJoin(pts, "id", "lon", "lat")
      .select($"id", $"state").as[(Long, String)].collect().toMap
    assert(got(1L) == "CO", got.toString)
    assert(got(2L) == "SD", got.toString)
    assert(got(3L) == "MI", got.toString)
    assert(got(4L) == "MI", got.toString)
    assert(got(5L) == "NONE", got.toString)
    assert(got(6L) == "NH", got.toString)
    assert(got(7L) == "TX", got.toString)
  }

  test("pointInStateJoin result is partitioning-invariant") {
    val pts = (0L until 200L).map(i =>
      (i, -125.0 + (i * 7 % 560) / 10.0, 25.0 + (i * 13 % 240) / 10.0))
      .toDF("id", "lon", "lat")
    def run(n: Int) = Spatial
      .pointInStateJoin(pts.repartition(n), "id", "lon", "lat")
      .select($"id", $"state").as[(Long, String)].collect().toSet
    assert(run(1) == run(7))
  }
}
