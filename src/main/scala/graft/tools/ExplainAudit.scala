package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * the scan pushdown (PushedFilters/ReadSchema), join strategy (broadcast
  * vs sort-merge), and WholeStageCodegen spans can be eyeballed per round.
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("f1_conjunctive_filter", "p1_index_projection", "j5_star_join",
        "a1_pricing_summary", "j3_prepost_correlate", "x3_minhash_lsh_pairs",
        "x10_ann_lsh_pairs", "o1_topk",
        // round 2: keyset pagination (pushdown + top-k), broadcast marker
        // join, label-blocked cosine pairs, nested sessionizer
        "o2b_keyset_pagination", "j6_marker_join", "x13_cosine_neardup",
        "st6_trace_turns",
        // round 5: curation family — broadcast decontamination, top-k
        // boilerplate mining, map-side verdicts, the full pipeline
        "x16_decontamination", "x19_curation_pipeline",
        "x22_boilerplate_ngrams", "x24_quality_verdicts")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLAN_DIR + SPARK_GRAFT_PLAN_SUFFIX write each plan to
    // <dir>/<query>_<suffix>.txt instead of stdout — the r15 optimization
    // round's before/after plan evidence (plans/r15/).
    val planDir    = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    names.foreach { n =>
      val df   = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      planDir match {
        case Some(dir) =>
          val f = new java.io.PrintWriter(s"$dir/${n}_$planSuffix.txt")
          try f.println(plan) finally f.close()
          println(s"wrote $dir/${n}_$planSuffix.txt")
        case None =>
          println(s"\n===================== $n =====================")
          println(plan)
      }
    }
    spark.stop()
  }
}
