package graft

/** Driver-contract smoke: `entry` must return rows on sf0.001, and every
  * oracleSql key must correspond to a defined query. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracleSql keys ⊆ queries keys; all queries run on sf0.001") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        noException should be thrownBy fn(spark, "/root/testdata/sf0.001").schema
      }
    }
  }
}
