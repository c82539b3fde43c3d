package graft

import org.apache.spark.sql.functions._

import graft.operators.HybridRetrieval

/** x68 hybrid retrieval: the fusion contract and the broadcast plan shape.
  * The full numeric surface is oracle-checked by the driver; these pin the
  * properties a refactor could silently break.
  */
class HybridRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("RRF score is exactly the rank formula; output is top-10 per query") {
    val out = HybridRetrieval.x68_hybrid_topk.run(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every row's rrf recomputes from its own ranks
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      assert(lex.isDefined || vec.isDefined, "candidate in neither list")
      val expected = BigDecimal(
        lex.map(r0 => 1.0 / (60 + r0)).getOrElse(0.0) +
          vec.map(r0 => 1.0 / (60 + r0)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-9,
        s"rrf mismatch at $r: expected $expected")
      lex.foreach(v => assert(v >= 1 && v <= 30))
      vec.foreach(v => assert(v >= 1 && v <= 30))
      // self-retrieval excluded from both generators
      assert(r.getAs[Long]("doc_id") != r.getAs[Long]("query_id"))
    }
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getAs[Long]("count") <= 10))
    assert(perQuery.length == 10, s"expected 10 queries, got ${perQuery.length}")
    out.unpersist()
    ()
  }

  test("x68b (IVF generator) shares the fusion contract and overlaps the exact answer") {
    val exact = HybridRetrieval.x68_hybrid_topk.run(spark, dir)
      .select("query_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = HybridRetrieval.x68b_hybrid_ivf.run(spark, dir).cache()
    val rows = ivf.collect()
    // same fusion arithmetic as x68
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      val expected = BigDecimal(
        lex.map(r0 => 1.0 / (60 + r0)).getOrElse(0.0) +
          vec.map(r0 => 1.0 / (60 + r0)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-9)
    }
    // the probed-cells generator must land close to the exact fusion:
    // top-10 overlap across the 10 queries (IVF recall at nProbe=4 is
    // ~0.9-class on this corpus; fused with the identical lexical list,
    // the winners mostly survive)
    val got     = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    val overlap = (exact & got).size.toDouble / exact.size
    assert(overlap >= 0.5, f"IVF-fused top-10 overlaps exact by only $overlap%.2f")
    ivf.unpersist()
    ()
  }

  test("plan: term set and query vectors broadcast; corpus never broadcast") {
    val plan = HybridRetrieval.x68_hybrid_topk.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in x68 plan:\n$plan")
    // the corpus-sized sides (token explode, candidate scan) must arrive
    // via shuffle/stream, not broadcast: no broadcast exchange may sit
    // directly above a full documents/embeddings scan without a filter
    assert(!plan.contains("CartesianProduct"), s"cartesian in x68 plan:\n$plan")
  }
}
