package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, TemporalJoins}

/** x47/x48: the DQ gate's split contract and the snapshot diff's
  * partition/round-trip properties — the row-level halves the aggregate
  * oracles can't see.
  */
class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  test("dq split partitions the table; quarantine carries the failing rule names") {
    val orders = Tables(spark, sf0001).orders
    val (pass, quarantine) = DataQuality.split(orders, DataQuality.orderRules)

    assert(pass.count() + quarantine.count() === orders.count())
    // quarantine == rows the check counts as __quarantined
    val checked = DataQuality.check(orders, DataQuality.orderRules)
      .where(col("rule") === "__quarantined").select("n_fail").as[Long].head()
    assert(quarantine.count() === checked)
    // every quarantined row names at least one real rule
    val ruleNames = DataQuality.orderRules.map(_._1).toSet
    val named = quarantine.select(explode(col("failed_rules")).as("r")).as[String].collect()
    assert(named.nonEmpty && named.forall(ruleNames))
    // null input counts as a violation (constraint semantics, not WHERE semantics)
    val withNull = orders.limit(1).withColumn("o_totalprice", lit(null).cast("double"))
    val (p2, q2) = DataQuality.split(withNull, DataQuality.orderRules)
    assert(p2.count() === 0 && q2.count() === 1)
  }

  test("snapshot diff: identical snapshots diff to empty; classifications round-trip") {
    val orders = Tables(spark, sf0001).orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(TemporalJoins.snapshotDiff(orders, orders, "o_orderkey",
      Seq("o_orderstatus", "o_totalprice")).isEmpty)

    // applying the diff to the old snapshot reconstructs the new snapshot
    val newSnap = orders
      .where(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 1, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
    val diff = TemporalJoins.snapshotDiff(orders, newSnap, "o_orderkey",
      Seq("o_orderstatus", "o_totalprice"))
    val applied = orders
      .join(diff.select("o_orderkey", "change_type"), Seq("o_orderkey"), "left")
      .where(col("change_type").isNull || col("change_type") =!= "delete")
      .drop("change_type", "o_orderstatus", "o_totalprice")
      .join(
        newSnap.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        Seq("o_orderkey"))
    assert(applied.count() === newSnap.count())
    assert(diff.where(col("change_type") === "insert").isEmpty) // none synthesized here
    assert(diff.where(col("change_type") === "delete").count() ===
      orders.where(col("o_orderkey") % 7 === 0).count())
  }

  test("psi drift: identical populations score ~0, a shifted one scores higher") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "value")
    val bucket = least(greatest(floor(col("value") / 10).cast("long"), lit(0L)), lit(9L))
    // ref = cur (split by parity; both halves cycle the full 0-99 range
    // identically) -> every contribution ~0
    val same = DataQuality.psiByBucket(vals, col("id") % 2 === 0, bucket, 10)
      .agg(sum(abs(col("psi_contrib")))).as[Double].head()
    assert(same < 1e-6, s"identical populations scored $same")
    // shift the odd half up by 30 -> mass moves buckets, PSI > 0.1
    val shifted = vals.withColumn("value",
      when(col("id") % 2 === 1, least(col("value") + 30, lit(99.0))).otherwise(col("value")))
    val drift = DataQuality.psiByBucket(shifted, col("id") % 2 === 0, bucket, 10)
      .agg(sum(col("psi_contrib"))).as[Double].head()
    assert(drift > 0.1, s"shifted population scored only $drift")
    // counts conserve: n_ref + n_cur sums to the row count
    val counts = DataQuality.psiByBucket(shifted, col("id") % 2 === 0, bucket, 10)
      .agg(sum(col("n_ref") + col("n_cur"))).as[Long].head()
    assert(counts === 2000L)
  }
}
