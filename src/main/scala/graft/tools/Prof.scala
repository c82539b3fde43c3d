package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: time variants of one query shape at a given sf dir.
  * Not part of the driver contract; used to attribute bench hotspots.
  *
  * r15 pass 4: segment the m13 txn-ingest chain — probe vs commits vs
  * read-back — and the m15 bloom-lookup chain.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, sfDir)
    import graft.sources.MultiStore
    import graft.operators.Dedup

    def sweep(): Unit = { graft.Checkpoints.sweepAll(spark); System.gc() }
    def seg[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"  SEG $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    def tmpRoot(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(tag).toFile
      d.deleteOnExit(); d.toString
    }

    def m13run(tag: String): Unit = {
      println(s"== m13 segments ($tag)")
      val root   = tmpRoot("prof-m13")
      val slim   = Seq("doc_id", "lang", "n_chars").map(col)
      val corpus = t.documents.filter(col("doc_id") % 2 === 0)
      val batch  = t.documents.filter(col("doc_id") % 2 =!= 0)
      seg("corpus commit") {
        MultiStore.commit(root, Map("docs" -> corpus.select(slim: _*)))
      }
      val flagged = Dedup
        .incrementalSpans(batch, Dedup.corpusGramSet(corpus, 8, fingerprints = false),
          k = 8, fingerprints = false)
        .groupBy("doc_id").agg(max(col("span_words")).as("m"))
        .filter(col("m") >= 16).select("doc_id")
      val flaggedCp = seg("probe (flagged) compute+cp") { flagged.localCheckpoint() }
      val accepted    = batch.join(flaggedCp, Seq("doc_id"), "left_anti").select(slim: _*)
      val quarantined = batch.join(flaggedCp, Seq("doc_id"), "left_semi").select(slim: _*)
      seg("commitBatch applied") {
        MultiStore.commitBatch(root, "ingest", 0L, Map(
          "docs"       -> MultiStore.read(spark, root, "docs").unionByName(accepted),
          "quarantine" -> quarantined))
      }
      seg("commitBatch replay (no-op)") {
        MultiStore.commitBatch(root, "ingest", 0L, Map(
          "docs" -> t.documents.limit(5).select(slim: _*)))
      }
      seg("read-back aggregates + noop") {
        def summarize(store: String, bucket: String) =
          MultiStore.read(spark, root, store).agg(
            count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
            .select(lit(bucket).as("bucket"), col("n_docs"), col("chars"))
        summarize("docs", "accepted")
          .unionByName(summarize("quarantine", "quarantine"))
          .orderBy("bucket")
          .write.format("noop").mode("overwrite").save()
      }
      // file counts per version for the docs store
      val storeDir = new java.io.File(root, "docs")
      if (storeDir.exists()) storeDir.listFiles().filter(_.getName.startsWith("v=")).sortBy(_.getName).foreach { v =>
        val n = v.listFiles().count(_.getName.endsWith(".parquet"))
        println(s"  FILES docs/${v.getName}: $n parquet files")
      }
      sweep()
    }

    def m15run(tag: String): Unit = {
      println(s"== m15 segments ($tag)")
      val root = tmpRoot("prof-m15")
      seg("commit 16-file + bloom") {
        MultiStore.commit(root,
          Map("docs" -> t.documents.select("doc_id", "lang", "n_chars")
            .repartition(16, col("doc_id") * 2654435761L % 1000)),
          bloom = Map("docs" -> Seq("doc_id")))
      }
      val keys = Seq(7L, 113L, 229L, 331L, 433L)
      seg("5 x readPrunedEq single (old)") {
        keys.map { k =>
          val hit = MultiStore.readPrunedEq(spark, root, "docs", "doc_id", lit(k))
          require(hit.inputFiles.length <= 2, "bloom failed")
          hit
        }
      }
      val lookups = seg("readPrunedEqMulti batched (new)") {
        MultiStore.readPrunedEqMulti(spark, root, "docs", "doc_id", keys.map(lit(_)))
          .zip(keys).map { case (hit, k) =>
            require(hit.inputFiles.length <= 2, s"bloom failed: $k")
            hit
          }
      }
      seg("union + orderBy + noop") {
        lookups.reduce(_.unionByName(_)).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
    }

    // warmups then two measured runs each
    m13run("warmup"); m13run("run1"); m13run("run2")
    m15run("warmup"); m15run("run1"); m15run("run2")

    spark.stop()
  }
}
