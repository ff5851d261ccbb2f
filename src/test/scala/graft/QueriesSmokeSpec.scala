package graft

/** Every registered query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is the driver's DuckDB gate at sf0.01 —
  * mirrored locally by tools/check_oracle.py.)
  */
class QueriesSmokeSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      assert(df.columns.forall(c => c == c.trim && c.nonEmpty))
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
