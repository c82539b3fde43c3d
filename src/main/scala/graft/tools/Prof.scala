package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: time variants of one query shape at a given sf dir.
  * Not part of the driver contract; used to attribute bench hotspots.
  *
  * r15 pass 5: interleaved A/B of the descendants walk — bfs (cycle
  * tolerant, per-round distinct + visited anti-join) vs descendantsTree
  * (parent-pointer-tree contract, single broadcast-join wave per round) —
  * on the g3 cascade workload. Interleaved in ONE JVM so host drift can't
  * masquerade as a code delta.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, sfDir)
    import graft.operators.GraphOps

    def sweep(): Unit = { graft.Checkpoints.sweepAll(spark); System.gc() }

    val parentChild = t.documents
      .filter(col("doc_id") >= 1)
      .select(expr("(doc_id - 1) div 2").as("parent"), col("doc_id").as("child"))
    val roots = { import spark.implicits._; Seq(1L).toDF("node") }
    val all   = t.documents.select("doc_id")

    def viaBfs(): DataFrame = {
      val doomed = GraphOps.descendants(parentChild, roots).select(col("node").as("doc_id"))
      all.join(doomed, Seq("doc_id"), "left_anti").orderBy("doc_id")
    }
    def viaTree(): DataFrame = {
      val doomed = GraphOps.descendantsTree(parentChild, roots).select(col("node").as("doc_id"))
      all.join(doomed, Seq("doc_id"), "left_anti").orderBy("doc_id")
    }

    def once(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep(); dt
    }
    // warmup both
    once(viaBfs _); once(viaTree _)
    // interleaved 6 pairs
    val pairs = (1 to 6).map(_ => (once(viaBfs _), once(viaTree _)))
    val bs = pairs.map(_._1).sorted
    val ts = pairs.map(_._2).sorted
    pairs.foreach { case (b, tr) => println(f"PROF pair bfs=$b%.3f tree=$tr%.3f") }
    println(f"PROF g3 via bfs  med=${bs(bs.size / 2)}%.3f min=${bs.head}%.3f")
    println(f"PROF g3 via tree med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f")

    // result equality on the real workload
    val a = viaBfs().collect().map(_.getLong(0)).toSeq
    val b = viaTree().collect().map(_.getLong(0)).toSeq
    println(s"PROF survivors equal = ${a == b} (n=${a.size})")
    spark.stop()
  }
}
