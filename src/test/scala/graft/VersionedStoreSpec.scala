package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, Rollup}
import graft.sources.VersionedStore

/** The crash-safety contract of the self-maintained stores (VERDICT r8
  * "What's wrong" #2): a maintenance loop must never have a moment where
  * the only copy of its store is half-written. VersionedStore gives every
  * commit a fresh immutable dir + atomic repoint; these specs simulate the
  * crash windows directly (a partial version dir; a missing marker) and
  * prove the replay/restart behavior of both stores built on it.
  */
class VersionedStoreSpec extends SparkSpec {

  import spark.implicits._

  private def root(): String =
    Files.createTempDirectory("vstore").toString + "/store"

  test("write/read round trip with version advance and pruning") {
    val r = root()
    assert(!VersionedStore.exists(spark, r))
    assert(VersionedStore.write(Seq((1L, "a")).toDF("k", "v"), r) == 0L)
    assert(VersionedStore.write(Seq((2L, "b")).toDF("k", "v"), r) == 1L)
    assert(VersionedStore.write(Seq((3L, "c")).toDF("k", "v"), r) == 2L)
    assert(VersionedStore.read(spark, r).as[(Long, String)].collect().toSet == Set((3L, "c")))
    // keep=2: v=0 pruned, v=1 (rollback margin) and v=2 (live) remain
    val dirs = new java.io.File(r).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("v=1", "v=2"), s"unexpected version dirs: $dirs")
  }

  test("a crash mid-write (partial version dir, no _SUCCESS) leaves the live store intact") {
    val r = root()
    VersionedStore.write(Seq((1L, "a")).toDF("k", "v"), r)
    // simulate: the next writer died after creating files but before the
    // parquet job committed — a junk dir with no _SUCCESS
    val partial = new java.io.File(r, "v=1")
    partial.mkdirs()
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    assert(VersionedStore.currentVersion(spark, r).contains(0L))
    assert(VersionedStore.read(spark, r).as[(Long, String)].collect().toSet == Set((1L, "a")))
    // the next successful write claims v=1 (clearing the junk) and repoints
    assert(VersionedStore.write(Seq((2L, "b")).toDF("k", "v"), r) == 1L)
    assert(VersionedStore.read(spark, r).as[(Long, String)].collect().toSet == Set((2L, "b")))
  }

  test("a crash between data commit and repoint (marker missing/stale) falls back to highest committed") {
    val r = root()
    VersionedStore.write(Seq((1L, "a")).toDF("k", "v"), r)
    VersionedStore.write(Seq((2L, "b")).toDF("k", "v"), r)
    // simulate a crash in the repoint window: delete the marker entirely
    new java.io.File(r, "_graft_current").delete()
    assert(VersionedStore.currentVersion(spark, r).contains(1L))
    assert(VersionedStore.read(spark, r).as[(Long, String)].collect().toSet == Set((2L, "b")))
    // and a STALE marker (points at a pruned/never-committed version)
    java.nio.file.Files.write(
      new java.io.File(r, "_graft_current").toPath, "99".getBytes("UTF-8"))
    assert(VersionedStore.currentVersion(spark, r).contains(1L))
  }

  test("a claimed version is never reused: concurrent/crashed writers get distinct dirs") {
    val r = root()
    VersionedStore.write(Seq((1L, "a")).toDF("k", "v"), r)
    // simulate writer A in flight: it claimed v=1 (exclusive create) and has
    // not committed yet. Writer B computes the same next=1 but must lose the
    // claim race and bump — it may NOT Overwrite A's in-progress v=1 dir.
    java.nio.file.Files.write(
      new java.io.File(r, "_graft_claim_v=1").toPath, Array.emptyByteArray)
    assert(VersionedStore.write(Seq((2L, "b")).toDF("k", "v"), r) == 2L,
      "writer B reused a claimed version dir")
    assert(!new java.io.File(r, "v=1").exists(), "B wrote into A's claimed dir")
    assert(VersionedStore.read(spark, r).as[(Long, String)].collect().toSet == Set((2L, "b")))
    // A's crash leaves the claim orphaned: later writers keep skipping it
    assert(VersionedStore.write(Seq((3L, "c")).toDF("k", "v"), r) == 3L)
  }

  test("label store survives a crashed maintenance batch and replaying a batch is a no-op") {
    val r    = root()
    val base = Seq((1L, 2L), (4L, 5L)).toDF("src", "dst")
    VersionedStore.write(GraphOps.connectedComponents(base, spark), r)
    val before = VersionedStore.read(spark, r).as[(Long, Long)].collect().toMap

    // batch 1 applies
    GraphOps.foldLabelsBatch(Seq((2L, 4L)).toDF("src", "dst"), r)
    val after = VersionedStore.read(spark, r).as[(Long, Long)].collect().toMap
    assert(after.values.toSet.size == before.values.toSet.size - 1, "components merged")

    // crash during batch 2's write: partial dir appears, store unharmed
    val partial = new java.io.File(r, "v=9")
    partial.mkdirs()
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"), Array[Byte](0))
    assert(VersionedStore.read(spark, r).as[(Long, Long)].collect().toMap == after)

    // Structured Streaming replays batch 1 after a failure: same edges fold
    // to the identical labeling (a fresh version, same content)
    GraphOps.foldLabelsBatch(Seq((2L, 4L)).toDF("src", "dst"), r)
    val replayed = VersionedStore.read(spark, r).as[(Long, Long)].collect().toMap
    assert(replayed == after, "replaying a batch changed the labeling")
  }

  test("partials store: replaying a batch does not double-count (per-batch partition overwrite)") {
    val dir = Files.createTempDirectory("partials").toString + "/partials"
    val mk = (ids: Seq[Long]) => ids.toDF("user_id")
      .select(
        lit(java.sql.Timestamp.valueOf("2026-01-05 10:00:00")).as("ts"),
        lit("click").as("event_type"), col("user_id"), lit(2.5).as("value"))
    Rollup.foldPartialsBatch(mk(Seq(1L, 2L)), batchId = 0L, dir)
    Rollup.foldPartialsBatch(mk(Seq(2L, 3L)), batchId = 1L, dir)
    val once = Rollup.mergeRollup(spark.read.parquet(dir)).collect().toSeq.toString
    // replay batch 1 (mid-write failure then re-run): overwrite, not append
    Rollup.foldPartialsBatch(mk(Seq(2L, 3L)), batchId = 1L, dir)
    val twice = Rollup.mergeRollup(spark.read.parquet(dir)).collect().toSeq.toString
    assert(once == twice, s"replay double-counted: $once vs $twice")
    // sanity: the merge itself sees both batches' users
    val merged = Rollup.mergeRollup(spark.read.parquet(dir)).collect()(0)
    assert(merged.getAs[Long]("n_events") == 4L && merged.getAs[Long]("n_users") == 3L)
  }
}
