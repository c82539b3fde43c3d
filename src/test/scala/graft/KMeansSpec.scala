package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** x56 Lloyd iterations: monotone improvement, total assignment, and
  * agreement between the quantized-mean update and a plain float mean.
  */
class KMeansSpec extends SparkSpec {

  private def embeddings = Tables(spark, sf0001).embeddings

  private def seeds(k: Int) = embeddings.filter(col("vec_id") < k)
    .select(col("vec_id").as("cell"),
      transform(col("embedding"), v => v.cast("double")).as("centroid"))

  test("lloyd: every vector assigned each iteration; mean similarity never degrades") {
    import spark.implicits._
    val n = embeddings.count()
    val a1 = Similarity.lloyd(embeddings, seeds(8), iters = 1)
    val a2 = Similarity.lloyd(embeddings, seeds(8), iters = 2)
    val a3 = Similarity.lloyd(embeddings, seeds(8), iters = 3)
    assert(a1.count() === n && a2.count() === n && a3.count() === n)
    // Lloyd's invariant, rendered in cosine: the mean assignment
    // similarity is non-decreasing across iterations (each update step
    // recenters cells on their members, each assignment step only moves
    // vectors to strictly better cells; micro-quantization perturbs
    // below round-6 granularity, so allow 1e-5 slack).
    def meanSim(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("sim")).as[Double].head()
    val (s1, s2, s3) = (meanSim(a1), meanSim(a2), meanSim(a3))
    assert(s2 >= s1 - 1e-5, s"iteration 2 degraded: $s1 -> $s2")
    assert(s3 >= s2 - 1e-5, s"iteration 3 degraded: $s2 -> $s3")
    // no cell starves on this corpus, and cells partition the vectors
    assert(a2.select("cell").distinct().count() === 8)
    assert(a2.select("vec_id").distinct().count() === n)
  }

  test("quantized mean tracks the float mean within 1e-6 per component") {
    import spark.implicits._
    val assigned = Similarity.assignToCentroids(embeddings, seeds(4))
    val quant = Similarity.quantizedMeanCentroids(assigned)
      .select(col("cell"), posexplode(col("centroid")).as(Seq("pos", "qv")))
    val exact = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(avg(col("v").cast("double")).as("fv"))
    // centroids are in micro units (1e6 x) — scale-invariant for the
    // cosine assignment; rescale for the comparison
    val maxGap = quant.join(exact, Seq("cell", "pos"))
      .agg(max(abs(col("qv") / 1e6 - col("fv")))).as[Double].head()
    assert(maxGap < 1e-6, s"quantized mean diverged by $maxGap")
  }
}
