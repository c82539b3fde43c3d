package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The persisted LSH band index: write -> re-read -> probe round trip
  * (the incremental-ingest layout Dedup's scaladoc promises), with the
  * probe's index scan partition-pruned, and the same index powering the
  * streaming daily-ingest path end-to-end.
  */
class BandIndexSpec extends SparkSpec {

  private def docs =
    spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")

  test("write -> probe equals the inline probe, and the index scan is partition-pruned") {
    val dir    = Files.createTempDirectory("bandidx").toString + "/idx"
    val corpus = docs.filter("doc_id % 2 = 0")
    // a SMALL daily batch — the case the sharded layout exists for: its
    // bucket set hashes into few shards, so most of the index is never read
    val batch = docs.filter("doc_id % 2 <> 0").orderBy("doc_id").limit(5)

    Dedup.writeBandIndex(Dedup.fastBandTable(corpus), dir)
    val batchBands = Dedup.fastBandTable(batch)

    def flags(df: org.apache.spark.sql.DataFrame): Set[(Long, Boolean)] =
      df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet

    val probed = Dedup.probePersistedIndex(batch.select("doc_id"), batchBands, spark, dir)
    val inline = Dedup.incrementalNeardupFlags(
      batch.select("doc_id"), batchBands, Dedup.fastBandTable(corpus))
    val probedRows = flags(probed) // action first, so scan metrics are populated
    assert(probedRows == flags(inline))

    // a NON-default shard modulus round-trips too: the probe reads the
    // layout constant from the index's _graft_shards marker, so the two
    // call sites can never silently disagree
    val dir16 = Files.createTempDirectory("bandidx16").toString + "/idx"
    Dedup.writeBandIndex(Dedup.fastBandTable(corpus), dir16, shards = 16)
    assert(Dedup.indexShards(spark, dir16) == 16)
    assert(flags(Dedup.probePersistedIndex(batch.select("doc_id"), batchBands, spark, dir16))
      == probedRows)

    // the index scan carries the shard list as a PARTITION filter…
    // (unwrap AQE: executed leaves live under AdaptiveSparkPlanExec)
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec       => leaves(q.plan)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec            => leaves(r.child)
        case other => other.collectLeaves().flatMap {
          case w @ (_: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec |
                    _: org.apache.spark.sql.execution.adaptive.QueryStageExec) => leaves(w)
          case l => Seq(l)
        }
      }
    val scan = leaves(probed.queryExecution.executedPlan).collectFirst {
      case s: FileSourceScanExec if s.metadata.get("Location").exists(_.contains("bandidx")) => s
    }.getOrElse(fail("no file scan over the band index in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket_shard")),
      s"no bucket_shard partition filter: ${scan.partitionFilters}")
    // …and the pruning is real: fewer files read than partitions written
    // (one file per shard dir by construction of writeBandIndex)
    val written = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket_shard="))
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < written,
      s"expected a pruned scan: read $read files of $written shard dirs")
  }

  test("daily-ingest stream: JSONL file stream probed against the parquet index, zero state under RocksDB") {
    // Composes the whole story the Dedup scaladoc claims: corpus banded and
    // written ONCE as the parquet index; arriving docs land as JSONL files;
    // a readStream bands them statelessly and stream-static-joins the
    // persisted index; flagged ids append to a parquet sink. No state store
    // is ever created — even with the RocksDB provider configured, the
    // stream-static semi-join keeps stateOperators empty, so ingest volume
    // never grows streaming state.
    val idxDir = Files.createTempDirectory("bandidx-s").toString + "/idx"
    val inDir  = Files.createTempDirectory("bandidx-in").toString
    val outDir = Files.createTempDirectory("bandidx-out").toString + "/flags"
    val ckpt   = Files.createTempDirectory("bandidx-ck").toString

    Dedup.writeBandIndex(Dedup.fastBandTable(docs.filter("doc_id % 2 = 0")), idxDir)
    val arriving      = docs.filter("doc_id % 2 <> 0")
    val Array(f1, f2) = arriving.randomSplit(Array(0.5, 0.5), seed = 7)

    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val prev         = spark.conf.getOption(providerConf)
    spark.conf.set(providerConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      f1.coalesce(1).write.mode("append").json(inDir)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .json(inDir)
      val query = Dedup
        .incrementalNeardupStream(stream, Dedup.readBandIndex(spark, idxDir))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        query.processAllAvailable()
        f2.coalesce(1).write.mode("append").json(inDir) // day 2 lands
        query.processAllAvailable()
        assert(query.lastProgress.stateOperators.isEmpty, "stream-static probe must hold no state")
      } finally query.stop()

      val streamed = spark.read.parquet(outDir)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      val expected = Dedup.x27_fast_incremental.run(spark, sf0001).collect()
        .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
      assert(streamed == expected)
    } finally prev match {
      case Some(v) => spark.conf.set(providerConf, v)
      case None    => spark.conf.unset(providerConf)
    }
  }
}
