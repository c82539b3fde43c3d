package graft.tools

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Focused repeat profiler for one registry query — the bistability
  * instrument the r10 verdict asked for (x2_fast_ngram_jaccard was the only
  * query stall-flagged in BOTH the r9 and r10 driver bench records; a
  * median-of-3/5 cannot say whether that is host noise or a genuinely
  * bimodal execution). Runs the query N consecutive times in one JVM under
  * the exact Bench protocol (noop sink, blocking checkpoint sweep between
  * repeats, full-registry warmup skipped — this tool wants the steady
  * state, so it warms up with 3 untimed repeats of the SAME query) and
  * prints per-repeat wall time alongside the two confound candidates:
  * the repeat's driver GC time (collector MX beans, delta per repeat) and
  * the block-manager storage footprint left after the sweep.
  *
  * Reading the output: a bimodal wall column with flat GC deltas = plan or
  * data-layout bistability (code); wall spikes that co-move with GC or
  * appear at random repeats with no mode structure = host/JVM noise. The
  * bhj/smj columns (join strategies in the FINAL adaptive plans of the
  * repeat, captured by a QueryExecutionListener) separate the two code
  * cases: a wall mode that co-moves with a join-count mode is AQE flipping
  * a near-threshold join between broadcast and sort-merge run to run.
  *
  * Usage: runMain graft.tools.Repeats <query>[,<query>...] [repeats]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_GC_EACH=1 to System.gc() between repeats (Bench's
  *      ISOLATE mode) — run both ways to separate GC cadence from code.
  */
object Repeats {
  def main(args: Array[String]): Unit = {
    val names   = args.headOption.getOrElse("x2_fast_ngram_jaccard").split(",").map(_.trim).toSeq
    val n       = if (args.length > 1) args(1).toInt else 10
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gcEach  = sys.env.get("SPARK_GRAFT_GC_EACH").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    def storageBytes: Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum

    // join strategies across every execution of the current repeat (a
    // localCheckpoint inside a query is its own execution — sum them all)
    val bhj = new java.util.concurrent.atomic.AtomicInteger
    val smj = new java.util.concurrent.atomic.AtomicInteger
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def count(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        val p = qe.executedPlan.toString
        bhj.addAndGet("BroadcastHashJoin".r.findAllIn(p).size)
        smj.addAndGet("SortMergeJoin".r.findAllIn(p).size)
      }
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = count(qe)
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = count(qe)
    })

    names.foreach { name =>
      val q = graft.SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query '$name'"))
      def rep(): (Double, Long, Long, Int, Int) = {
        val gc0 = gcMillis
        bhj.set(0); smj.set(0)
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftListenerBridge.flush(spark.sparkContext) // listener is async
        graft.Checkpoints.sweepAll(spark)
        if (gcEach) System.gc()
        (wall, gcMillis - gc0, storageBytes, bhj.get, smj.get)
      }
      (1 to 3).foreach(_ => rep()) // untimed warmup: codegen, parquet footers
      println(f"== $name  (repeats=$n, gcEach=$gcEach, sf=$sfDir)")
      val walls = (1 to n).map { i =>
        val (wall, gcDelta, stored, b, s) = rep()
        println(f"  rep $i%2d  wall=$wall%7.3f s  gcDelta=${gcDelta}%5d ms  storedAfterSweep=${stored / 1024 / 1024}%5d MB  bhj=$b%2d smj=$s%2d")
        wall
      }
      val s = walls.sorted
      println(f"  min=${s.head}%.3f  median=${s(n / 2)}%.3f  max=${s.last}%.3f  spread=${s.last - s.head}%.3f")
    }
    spark.stop()
  }
}
