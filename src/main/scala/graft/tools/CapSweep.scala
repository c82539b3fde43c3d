package graft.tools

import org.apache.spark.sql.functions._

/** Sweep the shingle document-frequency cap on the x2_fast n-gram Jaccard
  * plan — the recall-vs-cost dial SCALE.md describes qualitatively: a
  * higher cap admits more boilerplate shingles into the candidate
  * self-join (worst key cost cap², more candidate pairs to verify) in
  * exchange for recall on pairs whose ONLY shared shingles are common.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.CapSweep
  * Prints, per cap: wall seconds (median of 3) and the emitted pair count
  * (the exact-Jaccard-over-capped-sets result, so pair deltas ARE the
  * recall effect of the cap, not noise).
  */
object CapSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, sfDir).documents

    // untimed warmup so the first swept cap doesn't absorb codegen/JIT
    graft.operators.Dedup.ngramJaccardPairs(docs, fingerprints = true, maxDf = 100)
      .write.format("noop").mode("overwrite").save()
    graft.Checkpoints.sweepAll(spark)

    for (cap <- Seq(50, 100, 200)) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Dedup.ngramJaccardPairs(docs, fingerprints = true, maxDf = cap)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.sweepAll(spark)
        dt
      }.sorted
      val pairs = graft.operators.Dedup
        .ngramJaccardPairs(docs, fingerprints = true, maxDf = cap).count()
      graft.Checkpoints.sweepAll(spark)
      println(f"CAPSWEEP maxDf=$cap%-4d median=${times(1)}%.3f s  spread=${times(2) - times(0)}%.3f  pairs=$pairs%d  ($sfDir)")
    }
    spark.stop()
  }
}
