package graft

import graft.operators.TrainPrep

/** VERDICT r9 #10: the flagship x26_fast near-dup pipeline rendered as pure
  * `spark.sql` text over the registered views must produce row-for-row the
  * same report as the DataFrame rendering — proving the SQL surface
  * (builtin xxhash64 minhash, higher-order shingling, window caps, md5
  * sample/split, packing windows) expresses the engine's hardest chain
  * end-to-end.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("neardupReportSql row-equals the x26_fast DataFrame rendering") {
    val sqlRows = TrainPrep.neardupReportSql(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    val dfRows = graft.operators.TrainPrep.x26_fast_neardup.run(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(sqlRows.nonEmpty, "SQL rendering returned no rows")
    assert(sqlRows == dfRows,
      s"SQL and DataFrame renderings diverge:\nSQL: $sqlRows\nDF:  $dfRows")
  }
}
