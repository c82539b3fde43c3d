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

  test("correlationCents: exact on a known line, partition-invariant, symmetric range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // y = 2x exactly -> r = 1; z = -x -> r(x,z) = -1, r(y,z) = -1
    val df = (1 to 1000).map(i => (i / 100.0, i / 50.0, -i / 100.0))
      .toDF("x", "y", "z")
    val r = Profiling.correlationCents(df, Seq("x", "y", "z"))
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r("x|y") === 1.0 && r("x|z") === -1.0 && r("y|z") === -1.0)
    // identical answers regardless of partitioning (the exact-sums point)
    val r1 = Profiling.correlationCents(df.repartition(1), Seq("x", "y", "z")).collect()
    val r7 = Profiling.correlationCents(df.repartition(7, col("x")), Seq("x", "y", "z")).collect()
    assert(r1.map(_.toString).sorted.sameElements(r7.map(_.toString).sorted))
  }
}
