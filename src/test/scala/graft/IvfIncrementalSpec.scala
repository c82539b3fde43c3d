package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** x67 — incremental IVF maintenance must be indistinguishable from a full
  * rebuild (the x27 equivalence discipline applied to the ANN family), and
  * its cost must scale with the BATCH, not the corpus.
  */
class IvfIncrementalSpec extends SparkSpec {

  private def embeddings = Tables(spark, sf0001).embeddings

  test("incremental assignment union corpus lists equals the full rebuild's lists") {
    val corpus = embeddings.filter(col("vec_id") < 400)
    val batch  = embeddings.filter(col("vec_id") >= 400)
    val cents  = Similarity.trainFreeCentroids(corpus, 16)

    val incremental = Similarity.assignCells(corpus, cents)
      .unionByName(Similarity.assignBatchIncremental(batch, cents))
      .select("cell", "vec_id")
    val rebuild = Similarity.assignCells(embeddings, cents)
      .select("cell", "vec_id")

    val a = incremental.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val b = rebuild.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(a == b, "incremental lists diverge from full rebuild")
  }

  test("serving over incrementally-maintained lists equals ivfTopK over the full corpus") {
    val corpus = embeddings.filter(col("vec_id") < 400)
    val batch  = embeddings.filter(col("vec_id") >= 400)
    val cents  = Similarity.trainFreeCentroids(corpus, 16)
    val lists = Similarity.assignCells(corpus, cents)
      .unionByName(Similarity.assignBatchIncremental(batch, cents))
    val queries = embeddings.filter(col("vec_id") < 5)

    val served = Similarity.probeTopK(lists, queries, cents, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // full path with the SAME frozen centroids (assign everything at once)
    val full = Similarity.probeTopK(
      Similarity.assignCells(embeddings, cents), queries, cents, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == full, "incremental index serves different neighbors than a rebuild")
  }

  test("batch assignment probes only the batch: broadcast join, no corpus scan") {
    val batch = embeddings.filter(col("vec_id") >= 400)
    val cents = Similarity.trainFreeCentroids(
      embeddings.filter(col("vec_id") < 400), 16)
    val plan = Similarity.assignBatchIncremental(batch, cents)
      .queryExecution.executedPlan.toString
    // the centroid side broadcasts (|batch| x nCells work, corpus-free)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroids not broadcast:\n$plan")
    // exactly two parquet scans feed the plan: the batch and the centroid
    // sample — the corpus inverted lists are never re-read
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected 2 scans (batch + centroid sample), got $scans:\n$plan")
    // the batch-side scan pushes the vec_id cutoff down to parquet
    assert(plan.contains("GreaterThanOrEqual(vec_id,400)"), s"batch filter not pushed:\n$plan")
  }

  test("x95 rank-aware eval: recall agrees with x75; ndcg/mrr bounded and order-sensitive") {
    val x95 = Similarity.x95_retrieval_eval.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val x75 = Similarity.x75_ann_recall.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(x95.keySet === x75.keySet)
    x95.foreach { case (q, (hits, recall, ndcg, mrr)) =>
      assert(recall === x75(q), s"query $q: x95 recall diverged from x75")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"query $q: ndcg $ndcg out of range")
      assert(mrr >= 0.0 && mrr <= 1.0, s"query $q: mrr $mrr out of range")
      // nDCG sees what recall can't: a full-recall list in perfect order
      // scores exactly 1; any miss must pull nDCG strictly below 1
      if (hits == 5L && ndcg == 1.0) () // perfect list
      if (hits < 5L) assert(ndcg < 1.0, s"query $q: $hits/5 hits but ndcg=1")
      if (hits > 0L) assert(mrr > 0.0, s"query $q: hits but mrr=0")
    }
  }
}
