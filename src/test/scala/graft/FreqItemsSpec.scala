package graft

import org.apache.spark.sql.functions._

import graft.plans.FreqItemsAgg.mg_freq

/** x46: Misra-Gries contract in both regimes.
  *
  * Exact regime (capacity >= |domain|): no decrement ever fires, the
  * sketch IS the group-by count — pinned against groupBy on real data.
  *
  * Saturated regime (capacity << |domain|): for every reported item,
  * true - n/(k+1) <= est <= true, and every item with true count
  * > n/(k+1) is reported — regardless of how the input is partitioned
  * (the mergeable-summaries property Spark's partial aggregation relies
  * on).
  */
class FreqItemsSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(items: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    items
      .agg(mg_freq(col("item"), k).as("m"))
      .select(explode(col("m")).as(Seq("item", "est")))
      .as[(String, Long)]
      .collect()
      .toMap

  test("exact regime: capacity above the domain reproduces groupBy counts") {
    val items = Tables(spark, sf0001).events
      .select(col("event_type").as("item"))
    val exact = items.groupBy("item").count().as[(String, Long)].collect().toMap
    assert(sketch(items.repartition(8), k = 64) === exact)
    assert(sketch(items.repartition(1), k = 64) === exact)
  }

  test("saturated regime: MG error envelope + heavy-hitter completeness, any partitioning") {
    // one hot item (500 rows) over a 64-item background (10 rows each)
    val rows = Seq.fill(500)("hot") ++ (1 to 64).flatMap(i => Seq.fill(10)(s"i$i"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n     = rows.size.toLong
    val k     = 8

    for (parts <- Seq(1, 7)) {
      val est = sketch(rows.toDF("item").repartition(parts), k)
      assert(est.nonEmpty && est.size <= k)
      est.foreach { case (item, e) =>
        val t = truth(item)
        assert(e <= t, s"$item overestimated: $e > $t")
        assert(e >= t - n / (k + 1), s"$item below envelope: $e < $t - ${n / (k + 1)}")
      }
      truth.foreach { case (item, t) =>
        if (t > n / (k + 1))
          assert(est.contains(item), s"heavy hitter $item (count $t > ${n / (k + 1)}) missing at parts=$parts")
      }
    }
  }
}
