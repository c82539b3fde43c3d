package graft

import graft.operators.Extras

/** Invariant tests for the rows-only extras (approx aggregates vs exact,
  * map override semantics).
  */
class ExtrasSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact; percentiles ordered") {
    import org.apache.spark.sql.functions._
    val rows = Extras.x11_approx_stats.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // exact distinct computed in its own aggregation — mixing it into x11
    // itself forces the Expand/non-codegen aggregate path (20x slower)
    val exactByFlag = Tables(spark, sf0001).lineitem
      .groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_orders")).toDouble
      val exact  = exactByFlag(r.getString(r.fieldIndex("l_returnflag"))).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"HLL error too big: $approx vs $exact")
      assert(r.getDouble(r.fieldIndex("p50_price")) <= r.getDouble(r.fieldIndex("p99_price")))
    }
  }

  test("map merge takes the override side (LAST_WIN), missing key -> null") {
    val rows = Extras.c13_map_ops.run(spark, sf0001).limit(5).collect()
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("source")) == "events")
      assert(r.getString(r.fieldIndex("k_value")) != "old") // override won
      assert(r.isNullAt(r.fieldIndex("missing_default")))
    }
  }
}
