package graft

import graft.operators.GraphOps

/** x50: the iterative DataFrame PageRank against an in-JVM reference on a
  * small dense-ish graph (in-degrees up to 3 — beyond what the oracle's
  * tree exercises), plus the mass-conservation envelope.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  // 6 nodes; node 5 has in-degree 3, node 0 in-degree 2; 4 dangles.
  private val edges = Seq(
    0L -> 1L, 0L -> 5L, 1L -> 2L, 1L -> 5L, 2L -> 3L, 2L -> 5L,
    3L -> 0L, 5L -> 0L)

  private def reference(iters: Int, d: Double): Map[Long, Double] = {
    val nodes  = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n      = nodes.size
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r      = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r(s) / outdeg(s) }.sum)
        .toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * inflow.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pagerank matches the dense-graph reference; mass bounded by 1") {
    val df  = edges.toDF("src", "dst")
    val got = GraphOps.pagerank(df, iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val want = reference(5, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - want(node)) < 1e-12, s"node $node: $r vs ${want(node)}")
    }
    val mass = got.values.sum
    assert(mass > 0.0 && mass <= 1.0 + 1e-12, s"mass $mass outside (0, 1]")
    // repartitioning the edges must not change the fixpoint (re-association
    // tolerance of the per-node inflow sums)
    val got8 = GraphOps.pagerank(df.repartition(8), iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    got.foreach { case (node, r) => assert(math.abs(r - got8(node)) < 1e-12) }
  }
}
