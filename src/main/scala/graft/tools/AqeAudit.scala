package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Executes named registry queries and reports the join strategies in the
  * FINAL adaptive plan (ExplainAudit shows the pre-execution plan, which
  * under AQE is not what runs). Used to confirm the r10 verdict's
  * de-pinning task: growing-side frames carry no broadcast() hint, and at
  * test scale AQE still elects broadcast on its own — plan parity at sf0.1,
  * freedom to degrade to sort-merge at cluster scale.
  */
object AqeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("j1_join_group", "j5_star_join", "q2_min_cost_supplier",
        "q3_shipping_priority", "q9_product_profit")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // drive AQE to its final plan
      val finalPlan = df.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(df.queryExecution.executedPlan)
      val txt = finalPlan.toString
      def count(p: String) = p.r.findAllIn(txt).size
      println(f"$n%-28s broadcastHash=${count("BroadcastHashJoin")}%2d " +
        f"sortMerge=${count("SortMergeJoin")}%2d shuffledHash=${count("ShuffledHashJoin")}%2d " +
        f"nestedLoop=${count("BroadcastNestedLoopJoin")}%2d")
    }
    spark.stop()
  }
}
