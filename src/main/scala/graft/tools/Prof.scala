package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: time variants of one query shape at a given sf dir.
  * Not part of the driver contract; used to attribute bench hotspots.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, sfDir)

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // ===== x45 attribution: which column family drives the 2 s? =====
    import graft.operators.Profiling.profile
    time("x45_full") {
      profile(t.orders,
        numCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        strCols = Seq("o_orderstatus", "o_orderpriority", "o_orderdate"))
    }
    time("x45_numeric_only") {
      profile(t.orders, numCols = Seq("o_orderkey", "o_custkey", "o_totalprice"), strCols = Seq("o_orderstatus"))
    }
    time("x45_no_orderdate") {
      profile(t.orders,
        numCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        strCols = Seq("o_orderstatus", "o_orderpriority"))
    }
    time("x45_orderdate_only") {
      profile(t.orders, numCols = Seq("o_orderkey"), strCols = Seq("o_orderdate"))
    }
    // ===== x40 attribution: scan vs z-encode vs branches =====
    val li    = t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    time("x40_scan_only") { li.groupBy("l_orderkey").agg(count(lit(1)).as("n")) }
    time("x40_full") { graft.operators.LayoutOps.x40_zorder_merge.run(spark, sfDir) }
    spark.stop()
  }
}
