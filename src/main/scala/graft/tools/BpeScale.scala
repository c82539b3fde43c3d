package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Curation

/** The x80 realistic-k measurement (VERDICT r12 ask #4): shows the
  * driver-local BPE trainer's wall is bounded by the ONE corpus pass, not
  * by k — against the distributed per-round loop whose wall is k Spark
  * jobs. Prints wall seconds for (a) the corpus pass alone (k=0), (b) the
  * local trainer at k=12, (c) the local trainer at k=1024 (lenient — the
  * synthetic corpus's vocabulary exhausts first; the rounds actually run
  * are printed), and (d) the distributed per-round loop at k=12 for the
  * per-round cost baseline. Results land in SCALE.md.
  *
  * Usage: runMain graft.tools.BpeScale
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir).documents
    docs.count() // warm the scan

    def timed(label: String)(body: => Long): Unit = {
      val t0   = System.nanoTime()
      val rows = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$rows)")
    }
    timed("corpus pass only (k=0)") {
      Curation.bpeMergesLocal(docs, "text", 0).count()
    }
    timed("local k=12") {
      Curation.bpeMergesLocal(docs, "text", 12).count()
    }
    timed("local k=1024 (lenient)") {
      Curation.bpeMergesLocal(docs, "text", 1024, strict = false).count()
    }
    timed("distributed k=12") {
      Curation.bpeMerges(docs, "text", 12).count()
    }
    spark.stop()
  }
}
