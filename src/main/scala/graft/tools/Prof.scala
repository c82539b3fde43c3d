package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: time variants of one query shape at a given sf dir.
  * Not part of the driver contract; used to attribute bench hotspots.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s ${times.min}%.3f s")
    }

    val li = t.lineitem
    time("x11_full") {
      li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_price"))
    }
    time("hll_only") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"))
    }
    time("hll_rsd05") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("approx_orders"))
    }
    time("countDistinct_only") {
      li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    }
    time("pctile_two_calls") {
      li.groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_price"))
    }
    time("pctile_one_array") {
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.99)), lit(1000)).as("ps"))
    }
    time("hll_plus_pctile_no_cd") {
      li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.99)), lit(1000)).as("ps"))
    }
    spark.stop()
  }
}
