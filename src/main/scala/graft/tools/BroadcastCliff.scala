package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The de-pinning exhibit (r10 verdict task 8): the j5 star join run two
  * ways against a grown-dims ScaleUp directory — (a) the registry plan,
  * where the corpus-growing customer side is unhinted and AQE picks the
  * join, and (b) the pre-r11 plan with customer pinned `broadcast()`.
  * Prints wall time and the final join strategies for both. At grown dims
  * the pinned variant must materialize an ever-growing broadcast on the
  * driver (hard-fails past spark's 8 GB broadcast limit on a real corpus);
  * the unhinted variant degrades to sort-merge instead.
  *
  * Usage: runMain graft.tools.BroadcastCliff <dir> [repeats]
  */
object BroadcastCliff {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale30xg")
    val repeats = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, dir)

    val revenue = sum(
      col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).cast(DoubleType)
    def j5(customer: DataFrame): DataFrame =
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")

    def measure(label: String, df: => DataFrame): Unit = {
      df.collect() // untimed warmup: codegen classes, parquet footers, JIT
      System.gc()  // and its debt cleared before the first timed window
      val times = (1 to repeats).map { _ =>
        val d = df
        val t0 = System.nanoTime()
        d.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        val finalPlan = d.queryExecution.executedPlan.collectFirst {
          case a: AdaptiveSparkPlanExec => a.executedPlan
        }.getOrElse(d.queryExecution.executedPlan).toString
        System.gc() // per-repeat isolation (the r11 bench-cadence lesson)
        (secs, "BroadcastHashJoin".r.findAllIn(finalPlan).size,
          "SortMergeJoin".r.findAllIn(finalPlan).size)
      }
      val med = times.map(_._1).sorted.apply(repeats / 2)
      println(f"$label%-22s median=$med%6.2f s  broadcastHash=${times.last._2}  sortMerge=${times.last._3}")
      if (sys.env.get("SPARK_GRAFT_PLAN").contains("1")) {
        val d = df
        d.collect()
        val p = d.queryExecution.executedPlan.collectFirst {
          case a: AdaptiveSparkPlanExec => a.executedPlan
        }.getOrElse(d.queryExecution.executedPlan).toString
        println(p.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet"))
          .mkString(s"--- $label final plan (joins/exchanges/scans) ---\n", "\n", "\n"))
      }
    }

    measure("j5 adaptive (registry)", j5(t.customer))
    measure("j5 pinned broadcast", j5(broadcast(t.customer)))
    spark.stop()
  }
}
