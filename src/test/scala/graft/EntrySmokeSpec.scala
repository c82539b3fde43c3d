package graft

/** Mirrors the driver's t1 smoke: entry() must produce rows on sf0.001
  * using a plain session (no events-table configs needed — entry touches
  * only millisecond-timestamp tables).
  */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("r_name", "n_name", "revenue", "n_items"))
  }

  test("every registered query has a unique name; every oracle key exists in queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
