package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe swap for self-maintained parquet stores.
  *
  * The failure mode this closes (VERDICT r8 "What's wrong" #2): a
  * maintenance loop that reads its store, merges a batch, and `Overwrite`s
  * the SAME directory has a window — after the overwrite deletes the old
  * files, before the new ones commit — where a crash loses the only copy.
  * The reference's own discipline for its JSONL stores is write-to-tmp then
  * atomic rename (sessions/manager.py:519-522); this is that discipline for
  * a directory-of-parquet store:
  *
  *   - every write lands in a FRESH immutable version dir `root/v=<n>`
  *     (never touching the live one),
  *   - a `_graft_current` marker file names the live version, updated by
  *     tmp-file + rename (atomic on local FS and HDFS),
  *   - readers resolve the marker; if a crash landed between the data
  *     commit and the repoint, they fall back to the highest version dir
  *     whose `_SUCCESS` exists — either way they see a COMPLETE store,
  *   - old versions are pruned only after the repoint, keeping `keep`
  *     generations as the rollback margin.
  *
  * At 100 TB this is the same object-store-friendly pattern as
  * Iceberg/Delta's root pointer: versions are immutable directories, the
  * commit is one small-file rename, and no reader ever observes a
  * half-written store.
  */
object VersionedStore {

  private val Marker = "_graft_current"

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionPath(root: String, n: Long): String =
    root.stripSuffix("/") + s"/v=$n"

  /** Versions with a committed `_SUCCESS`, ascending. */
  private def committedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = hfs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
        .sorted
        .filter(n => fs.exists(new org.apache.hadoop.fs.Path(versionPath(root, n), "_SUCCESS")))
  }

  private def markerVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, _) = hfs(spark, root)
    val m = new org.apache.hadoop.fs.Path(root, Marker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](64)
        var n   = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        Some(new String(buf.toByteArray, "UTF-8").trim.toLong)
      } catch { case _: Exception => None } finally in.close()
    }
  }

  /** The live version: the marker if it names a committed dir, else the
    * highest committed dir (covers a crash between data commit and
    * repoint), else None (empty store).
    */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val committed = committedVersions(spark, root)
    markerVersion(spark, root).filter(committed.contains) match {
      case some @ Some(_) => some
      case None           => committed.lastOption
    }
  }

  def exists(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root).isDefined

  /** Read the live store. Throws if no committed version exists. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val n = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"VersionedStore at $root has no committed version"))
    spark.read.parquet(versionPath(root, n))
  }

  private def claimPath(root: String, n: Long) =
    new org.apache.hadoop.fs.Path(root, s"_graft_claim_v=$n")

  /** Commit `df` as the next version and atomically repoint. Returns the
    * new version number. The previous version's files are never touched by
    * the write; pruning (after the repoint) keeps the last `keep`
    * generations.
    *
    * Concurrency: version numbers are CLAIMED before writing — an
    * exclusive `_graft_claim_v=<n>` create (atomic on local FS and HDFS).
    * A second writer that lands on the same number loses the create and
    * bumps to the next free one, so two in-flight writers can never
    * Overwrite the same `v=<n>` dir and commit a corrupt `_SUCCESS`-stamped
    * version. This serializes DIRECTORIES, not transactions: concurrent
    * writers each commit a complete version and the marker rename makes the
    * last repoint win (single-table last-writer-wins, the same level as a
    * root-pointer swap — not multi-writer snapshot isolation). A claim
    * orphaned by a crash is simply skipped forever and removed by prune.
    */
  def write(df: DataFrame, root: String, keep: Int = 2): Long = {
    val spark = df.sparkSession
    val (fs0, rootP) = hfs(spark, root)
    if (!fs0.exists(rootP)) fs0.mkdirs(rootP)
    var next  = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    var tries = 0
    // AtomicFs.claim: the local-FS "exclusive" create is check-then-act
    // (see AtomicFs scaladoc) — two writers could both claim one version
    // and overwrite each other's v= dir.
    while (!AtomicFs.claim(fs0, claimPath(root, next))) {
      tries += 1
      if (tries > 1000)
        throw new IllegalStateException(
          s"VersionedStore at $root: could not claim a version after $tries attempts")
      next += 1
    }
    // fresh dir: Overwrite only clears a leftover PARTIAL v=<next> from a
    // crashed attempt (it cannot be the live version — no _SUCCESS/marker)
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(versionPath(root, next))
    // atomic repoint: tmp file + rename
    val (fs, _) = hfs(spark, root)
    val tmp  = new org.apache.hadoop.fs.Path(root, s"$Marker.tmp")
    val mark = new org.apache.hadoop.fs.Path(root, Marker)
    val out  = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(mark)) fs.delete(mark, false) // window covered by fallback scan
    if (!fs.rename(tmp, mark))
      throw new java.io.IOException(s"could not repoint $mark to v=$next")
    // prune: only after the repoint, never the live version. Claim files
    // of pruned (and orphaned sub-live) versions go with them.
    committedVersions(spark, root).filter(_ <= next - keep)
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(versionPath(root, n)), true))
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("_graft_claim_v=") => s.stripPrefix("_graft_claim_v=").toLong }
      .filter(_ <= next - keep)
      .foreach(n => fs.delete(claimPath(root, n), false))
    next
  }
}
