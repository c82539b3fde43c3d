package graft.tools

import org.apache.spark.sql.functions._

/** Sweep the IVF probe grid against rank-aware quality — the tuning curve
  * x95's scaladoc promises: at 100 TB the nProbe/nCells tradeoff is set by
  * exactly this table (probe cost grows ~linearly in nProbe; recall/nDCG
  * saturate once the true neighbors' cells are covered), and the sweep is
  * run BEFORE queries degrade, on the same `Similarity.retrievalEval`
  * kernel the oracle-checked registry row pins at (10, 5, 16, 4).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.RetrievalSweep
  *        [nQueries] [k] [nCells] [nProbe,nProbe,...] [corpus|mixed]
  * Defaults: 40 queries, k=10, 16 cells, nProbe 1,2,4,8,16, corpus
  * probes. `mixed` probes are midpoints of far-apart corpus pairs
  * (vector i blended with vector i + N/2): on a tightly-clustered
  * corpus, corpus-member probes saturate recall from nProbe=1 (their
  * exact top-k cohabits their own cell), while a cross-cluster midpoint's
  * top-k straddles two cells — the query class the nProbe curve prices.
  * Prints, per nProbe: mean recall@k / nDCG@k / MRR over the query set
  * and the wall seconds (median of 3) of the full eval.
  */
object RetrievalSweep {
  def main(args: Array[String]): Unit = {
    val sfDir    = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nQueries = args.lift(0).map(_.toInt).getOrElse(40)
    val k        = args.lift(1).map(_.toInt).getOrElse(10)
    val nCells   = args.lift(2).map(_.toInt).getOrElse(16)
    val probesAt = args.lift(3).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8, 16))
    val mixed    = args.lift(4).contains("mixed")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, sfDir).embeddings

    val probes =
      if (!mixed) emb.filter(col("vec_id") < nQueries)
      else {
        val half = emb.agg(max("vec_id")).head().getLong(0) / 2
        val a = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id"), col("embedding").as("ea"))
        val b = emb.filter(col("vec_id") >= half && col("vec_id") < half + nQueries)
          .select((col("vec_id") - half).as("vec_id"), col("embedding").as("eb"))
        a.join(b, "vec_id").select(
          // ids far outside the corpus id space: self-exclusion no-ops
          (col("vec_id") + 1000000000L).as("vec_id"),
          zip_with(col("ea"), col("eb"),
            (x, y) => ((x + y) / lit(2.0)).cast("float")).as("embedding"))
        // deterministic by construction (no sampling), so safe to recompute
        // per repeat — a localCheckpoint here would be swept away by the
        // between-repeat Checkpoints.sweepAll
      }

    def eval(nProbe: Int) =
      graft.operators.Similarity.retrievalEvalProbes(emb, probes, k, nCells, nProbe)

    // untimed warmup so the first swept point doesn't absorb codegen/JIT
    eval(probesAt.head).write.format("noop").mode("overwrite").save()
    graft.Checkpoints.sweepAll(spark)

    probesAt.foreach { nProbe =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        eval(nProbe).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.sweepAll(spark)
        dt
      }.sorted
      val m = eval(nProbe)
        .agg(avg("recall").as("recall"), avg("ndcg").as("ndcg"), avg("mrr").as("mrr"))
        .head()
      graft.Checkpoints.sweepAll(spark)
      println(f"RETRIEVALSWEEP nProbe=$nProbe%-3d nCells=$nCells k=$k nQueries=$nQueries mode=${if (mixed) "mixed" else "corpus"} " +
        f"recall=${m.getDouble(0)}%.4f ndcg=${m.getDouble(1)}%.4f mrr=${m.getDouble(2)}%.4f " +
        f"median=${times(1)}%.3f s spread=${times(2) - times(0)}%.3f ($sfDir)")
    }
    spark.stop()
  }
}
