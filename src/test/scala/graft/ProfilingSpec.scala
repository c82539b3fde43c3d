package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Profiling

/** x45: the profiler's null/distinct/min-max accounting, pinned on a frame
  * with actual nulls (the testdata tables are fully populated, so the
  * oracle row alone never exercises the null path).
  */
class ProfilingSpec extends SparkSpec {

  test("profile counts nulls, exact distincts, and typed min/max per column") {
    val schema = StructType(Seq(
      StructField("n", DoubleType),
      StructField("s", StringType)))
    val rows = Seq(
      Row(1.0, "b"),
      Row(2.0, null),
      Row(null, "a"),
      Row(2.0, "a"),
      Row(null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val out = Profiling.profile(df, numCols = Seq("n"), strCols = Seq("s"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap

    val n = out("n")
    assert(n.getLong(1) === 5L)               // n_rows
    assert(n.getLong(2) === 2L)               // n_null
    assert(n.getLong(3) === 2L)               // n_distinct (1.0, 2.0)
    assert(n.getDouble(4) === 1.0 && n.getDouble(5) === 2.0) // min_d, max_d
    assert(n.isNullAt(6) && n.isNullAt(7))    // no string min/max for numerics

    val s = out("s")
    assert(s.getLong(2) === 2L)               // n_null
    assert(s.getLong(3) === 2L)               // n_distinct (a, b)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "b")
  }
}
