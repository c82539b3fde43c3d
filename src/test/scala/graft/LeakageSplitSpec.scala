package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TrainPrep}

/** x78: the cluster-grain split must make near-dup straddling impossible,
  * and the spec proves the CONTRAST — on the same clustered corpus the
  * doc-grain deal (x14's, correct for iid docs) leaves clusters whose
  * members land in different splits, i.e. train/test contamination.
  */
class LeakageSplitSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("cluster-grain deal: zero components straddle a split boundary") {
    val labeled = TrainPrep.clusterLabeledDocs(tables)
    val straddling = labeled
      .withColumn("split", Curation.assignSplit(col("component")))
      .groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(straddling === 0L)
  }

  test("doc-grain deal on the same clusters DOES straddle (the leak x78 closes)") {
    val labeled = TrainPrep.clusterLabeledDocs(tables)
    val straddling = labeled
      .withColumn("split", Curation.assignSplit(col("doc_id")))
      .groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    // 7-member clusters dealt 80/10/10 at doc grain: P(uniform split) is
    // ~0.8^7 + eps per cluster, so straddlers are guaranteed in bulk
    assert(straddling > 0L)
  }

  test("x78 splits are exhaustive and component counts are consistent") {
    val res = TrainPrep.x78_leakage_split.run(spark, sf0001)
    val total = res.agg(sum("n_docs")).head().getLong(0)
    assert(total === tables.documents.count())
    // every component counted in exactly one split: summing the per-split
    // DISTINCT component counts over langs can overcount (a component can
    // span langs), so check at split grain against the true partition
    val labeled = TrainPrep.clusterLabeledDocs(tables)
      .withColumn("split", Curation.assignSplit(col("component")))
    val bySplit = labeled.select("component", "split").distinct().count()
    assert(bySplit === labeled.select("component").distinct().count())
  }
}
