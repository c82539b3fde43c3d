package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotQueries

/** m18/m19: the rows self-guard their machinery (schema shapes, exactly-once
  * rejection) with in-row requires; this spec pins the RESULT semantics the
  * oracle alone can't express as invariants — era coverage and exhaustiveness
  * for schema evolution, insert-only feed + completeness for the stream sink.
  */
class LakehouseRowsSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("m18: both eras survive evolution and the buckets are exhaustive") {
    val res = SnapshotQueries.m18_schema_evolution.run(spark, sf0001)
    val buckets = res.select("lang_bucket").collect().map(_.getString(0)).toSet
    assert(buckets.contains("_pre_evolution"))
    assert(buckets.size >= 3, s"expected pre-evolution + real langs, got $buckets")
    val total = res.agg(sum("n_docs")).head().getLong(0)
    assert(total === tables.documents.count())
    // the pre-evolution bucket is exactly the pre-evolution commit's rows
    val pre = res.filter(col("lang_bucket") === "_pre_evolution")
      .select("n_docs").head().getLong(0)
    assert(pre === tables.documents.filter(col("doc_id") < 300).count())
  }

  test("m19: the feed across the batch window is insert-only and complete") {
    val res = SnapshotQueries.m19_stream_sink.run(spark, sf0001)
    val feedRows = res.filter(col("bucket").startsWith("feed_")).collect()
    assert(feedRows.map(_.getString(0)).toSet === Set("feed_insert"),
      "appends must surface as inserts only — no updates/deletes in an append-only window")
    assert(feedRows.head.getLong(1) ===
      tables.documents.filter(col("doc_id") % 3 =!= 0).count())
    val finalTotal = res.filter(col("bucket").startsWith("final_"))
      .agg(sum("n_rows")).head().getLong(0)
    assert(finalTotal === tables.documents.count())
  }
}
