package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Maintenance.merge — the generic MERGE verb's physical contract:
  * (1) semantics = whenMatched update-all / whenNotMatched insert-all,
  * (2) only affected partitions are READ (PartitionFilters on the scan),
  * (3) only affected partitions are REWRITTEN (untouched partition files
  *     byte-identical, same names, same mtimes),
  * (4) replaying the same merge is idempotent (the crash-recovery story:
  *     a merge that died mid-swap is simply re-run).
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("merge-table").toString + "/t"
    Seq(
      (1L, "a", 10.0, "2024-01"),
      (2L, "b", 20.0, "2024-01"),
      (3L, "c", 30.0, "2024-02"),
      (4L, "d", 40.0, "2024-02"),
      (5L, "e", 50.0, "2024-03"),
    ).toDF("k", "s", "v", "month")
      .write.partitionBy("month").parquet(dir)
    dir
  }

  private def files(dir: String, part: String): Map[String, Long] = {
    val d = new java.io.File(dir, part)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("merge semantics + untouched partitions byte-untouched + pruned read") {
    val dir = mkTable()
    val before01 = files(dir, "month=2024-01")
    val before03 = files(dir, "month=2024-03")

    // batch: update k=3 (matched), insert k=6 (not matched), both 2024-02
    val batch = Seq((3L, "C!", 33.0, "2024-02"), (6L, "f", 60.0, "2024-02"))
      .toDF("k", "s", "v", "month")
    val parts = Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    assert(parts == Seq("2024-02"))

    val got = spark.read.parquet(dir).as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      (1L, "a", 10.0, "2024-01"), (2L, "b", 20.0, "2024-01"),
      (3L, "C!", 33.0, "2024-02"), (4L, "d", 40.0, "2024-02"),
      (5L, "e", 50.0, "2024-03"), (6L, "f", 60.0, "2024-02")))

    // untouched partitions: identical file names AND mtimes (never rewritten)
    assert(files(dir, "month=2024-01") == before01, "2024-01 was rewritten")
    assert(files(dir, "month=2024-03") == before03, "2024-03 was rewritten")

    // the read side of the merge partition-prunes: same filter shape as the
    // verb builds internally
    val plan = spark.read.parquet(dir).filter(col("month").isin("2024-02"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("month"),
      s"no partition pruning in merge's read:\n$plan")
    assert(!plan.contains("PartitionFilters: []"), s"empty partition filter:\n$plan")
  }

  test("replaying the same merge is idempotent (crash-recovery contract)") {
    val dir   = mkTable()
    val batch = Seq((3L, "C!", 33.0, "2024-02"), (6L, "f", 60.0, "2024-02"))
      .toDF("k", "s", "v", "month")
    Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    val once = spark.read.parquet(dir).as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toList
    Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    val twice = spark.read.parquet(dir).as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toList
    assert(once == twice, "replayed merge changed the table")
  }

  test("crash between set-aside and swap-in rolls back; no row is ever lost") {
    // Simulate the worst window: the live partition dir was renamed aside to
    // its _graft_old_ backup and the process died before staging renamed in.
    // A reader at that instant must not see the partition half-gone forever,
    // and a RE-RUN of the merge must produce the full merged content — the
    // exact scenario the r9 delete-then-rename protocol lost data in.
    val dir  = mkTable()
    val live = new java.io.File(dir, "month=2024-02")
    val bak  = new java.io.File(dir, "_graft_old_month=2024-02")
    assert(live.renameTo(bak), "test setup: could not simulate the crash window")

    val batch = Seq((3L, "C!", 33.0, "2024-02"), (6L, "f", 60.0, "2024-02"))
      .toDF("k", "s", "v", "month")
    Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    val got = spark.read.parquet(dir).as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      (1L, "a", 10.0, "2024-01"), (2L, "b", 20.0, "2024-01"),
      (3L, "C!", 33.0, "2024-02"), (4L, "d", 40.0, "2024-02"),
      (5L, "e", 50.0, "2024-03"), (6L, "f", 60.0, "2024-02")),
      "recovery lost the pre-crash rows of the set-aside partition")
    assert(!bak.exists(), "backup dir not cleaned up after recovery")
  }

  test("crash after swap-in but before backup cleanup drops the stale backup") {
    val dir = mkTable()
    // Simulate: swap committed (live dir is current) but the backup remains.
    val stale = new java.io.File(dir, "_graft_old_month=2024-01")
    assert(stale.mkdir())
    Files.write(new java.io.File(stale, "orphan.parquet").toPath, Array[Byte](1, 2, 3))

    val batch = Seq((6L, "f", 60.0, "2024-02")).toDF("k", "s", "v", "month")
    Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    assert(!stale.exists(), "completed-swap backup not dropped on recovery")
    assert(spark.read.parquet(dir).count() == 6)
  }

  test("a NULL partition value in the batch fails fast instead of silently dropping") {
    val dir = mkTable()
    val batch = Seq((6L, "f", 60.0, Option("2024-02")), (7L, "g", 70.0, Option.empty[String]))
      .toDF("k", "s", "v", "month")
    val e = intercept[IllegalArgumentException] {
      Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    }
    assert(e.getMessage.contains("NULL month"), e.getMessage)
    // table untouched
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("a batch with extra or missing columns fails fast instead of silently dropping data") {
    val dir = mkTable()
    // extra column: would be silently dropped by the projection — data loss
    val extra = Seq((6L, "f", 60.0, "new!", "2024-02")).toDF("k", "s", "v", "w", "month")
    val e1 = intercept[IllegalArgumentException] {
      Maintenance.merge(spark, dir, extra, Seq("k"), "month")
    }
    assert(e1.getMessage.contains("extra [w]"), e1.getMessage)
    // missing column: cannot express update-all
    val missing = Seq((6L, 60.0, "2024-02")).toDF("k", "v", "month")
    val e2 = intercept[IllegalArgumentException] {
      Maintenance.merge(spark, dir, missing, Seq("k"), "month")
    }
    assert(e2.getMessage.contains("missing [s]"), e2.getMessage)
    assert(spark.read.parquet(dir).count() == 5, "failed merges touched the table")
  }

  test("a second concurrent merge fails loudly on the lock; takeover reclaims it") {
    val dir  = mkTable()
    val lock = new java.io.File(dir, "_graft_merge_lock")
    Files.write(lock.toPath, Array.emptyByteArray) // first writer holds the lock
    val batch = Seq((6L, "f", 60.0, "2024-02")).toDF("k", "s", "v", "month")
    val e = intercept[IllegalStateException] {
      Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    }
    assert(e.getMessage.contains("merge lock held"), e.getMessage)
    assert(spark.read.parquet(dir).count() == 5, "failed merge touched the table")
    // operator confirmed no live writer: takeover runs and releases the lock
    Maintenance.merge(spark, dir, batch, Seq("k"), "month", takeoverLock = true)
    assert(spark.read.parquet(dir).count() == 6)
    assert(!lock.exists(), "lock not released on commit")
  }

  test("a batch spanning several partitions swaps exactly those") {
    val dir   = mkTable()
    val before02 = files(dir, "month=2024-02")
    val batch = Seq((1L, "A!", 11.0, "2024-01"), (5L, "E!", 55.0, "2024-03"))
      .toDF("k", "s", "v", "month")
    val parts = Maintenance.merge(spark, dir, batch, Seq("k"), "month")
    assert(parts.toSet == Set("2024-01", "2024-03"))
    assert(files(dir, "month=2024-02") == before02, "2024-02 was rewritten")
    val got = spark.read.parquet(dir).filter(col("k").isin(1L, 5L))
      .as[(Long, String, Double, String)].collect().sortBy(_._1).toList
    assert(got == List((1L, "A!", 11.0, "2024-01"), (5L, "E!", 55.0, "2024-03")))
  }
}
