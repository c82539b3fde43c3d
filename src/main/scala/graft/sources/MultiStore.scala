package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, xxhash64}

/** Multi-table snapshot commits over VersionedStore-style parquet stores —
  * the transaction-log shape a lakehouse user expects when two
  * self-maintained stores must advance TOGETHER (e.g. the x53 CC label
  * store and its companion edge/partials store: a reader must never see
  * new labels beside old partials).
  *
  * Layout under one `root`:
  *
  *   root/<store>/v=<n>/...       immutable data versions per store
  *   root/_graft_manifest_m=<m>   numbered manifest files, each the FULL
  *                                snapshot: one `store=version` line per
  *                                store
  *   root/<store>/_graft_claim_v=<n>  exclusive version claims (as in
  *                                [[VersionedStore]])
  *
  * The commit is ONE atomic rename of a tmp file into the next numbered
  * manifest name — readers resolve the highest complete manifest, so a
  * crash anywhere in a multi-store commit (after any subset of data
  * writes, before the manifest lands) leaves every reader on the previous
  * manifest: all-old or all-new, never mixed. Numbered manifests (rather
  * than one mutable pointer file) remove the delete-then-rename window a
  * single pointer would reintroduce for the multi-store case, and make
  * concurrent committers conflict LOUDLY: rename onto an existing
  * manifest name fails, and the committer retries against the refreshed
  * snapshot (bounded attempts), giving last-writer-wins at manifest grain
  * with no torn state. This is structurally Iceberg's root-pointer commit
  * generalized to N tables under one root — what a transaction log does.
  * Writers that must not lose updates use [[commitIf]] (compare-and-swap
  * on the stores they read: conflicts on the SAME store throw, disjoint
  * stores rebase automatically); plain [[commit]] keeps last-writer-wins
  * for refresh-style writers whose output does not depend on the previous
  * version. Reference anchor: the session-store tmp+rename discipline
  * (sessions/manager.py:519-522) promoted from one file to one snapshot.
  *
  * Scale: a commit writes only the stores it changes; unchanged stores
  * are carried forward in the manifest by reference (a text line, not a
  * data copy). Manifest files are bytes-sized; data versions are pruned
  * only when no retained manifest references them.
  */
object MultiStore {

  private val ManifestPrefix = "_graft_manifest_m="

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestNumbers(fs: org.apache.hadoop.fs.FileSystem,
                              rootP: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(rootP)) Seq.empty
    else
      fs.listStatus(rootP).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith(ManifestPrefix) => s.stripPrefix(ManifestPrefix).toLong }
        .sorted

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           rootP: org.apache.hadoop.fs.Path, m: Long): Map[String, Long] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(rootP, ManifestPrefix + m))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n   = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, "UTF-8").split("\n").iterator
        .map(_.trim).filter(_.nonEmpty)
        .map { line =>
          val i = line.lastIndexOf('=')
          line.substring(0, i) -> line.substring(i + 1).toLong
        }
        .toMap
    } finally in.close()
  }

  /** The live snapshot: {store -> version} of the highest manifest, or
    * empty before the first commit.
    */
  def snapshot(spark: SparkSession, root: String): Map[String, Long] = {
    val (fs, rootP) = hfs(spark, root)
    manifestNumbers(fs, rootP).lastOption
      .map(readManifest(fs, rootP, _))
      .getOrElse(Map.empty)
  }

  /** Read one store at the live snapshot. */
  def read(spark: SparkSession, root: String, store: String): DataFrame = {
    val v = snapshot(spark, root).getOrElse(
      store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    spark.read.parquet(s"${root.stripSuffix("/")}/$store/v=$v")
  }

  /** Retained manifest numbers, ascending — the snapshot HISTORY. Each is
    * a complete, immutable, readable snapshot until pruning drops it
    * (keep=N retains the last N), which is the whole time-travel contract
    * of a root-pointer table format: old snapshots stay queryable because
    * commits never mutate data, only publish new pointers.
    */
  def manifests(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootP) = hfs(spark, root)
    manifestNumbers(fs, rootP)
  }

  /** The full {store -> version} snapshot as of manifest `m`. */
  def snapshotAt(spark: SparkSession, root: String, m: Long): Map[String, Long] = {
    val (fs, rootP) = hfs(spark, root)
    require(manifestNumbers(fs, rootP).contains(m),
      s"MultiStore at $root: manifest m=$m is not retained (history: ${manifestNumbers(fs, rootP).mkString(",")})")
    readManifest(fs, rootP, m)
  }

  /** Time-travel read: one store as of manifest `m`. */
  def readAt(spark: SparkSession, root: String, store: String, m: Long): DataFrame = {
    val v = snapshotAt(spark, root, m).getOrElse(
      store,
      throw new IllegalStateException(s"MultiStore at $root: store '$store' absent at manifest m=$m"))
    spark.read.parquet(s"${root.stripSuffix("/")}/$store/v=$v")
  }

  // ---- row-level deletes (merge-on-read equality deletes) -----------------

  /** The delete set of `store` is itself a store named `<store>.deletes`,
    * whose rows ARE the equality-delete keys (its schema records the key
    * columns, so readers need no side channel). Everything a store already
    * has — atomic multi-table commits, snapshot isolation, time travel,
    * version pruning, the claim protocol — applies to the delete set for
    * free, and a delete commits BOTH stores' pointers in one manifest.
    */
  private def deletesStore(store: String): String = store + ".deletes"

  /** Delete rows matching `cond` WITHOUT rewriting the data — the
    * merge-on-read half of a lakehouse DELETE (Iceberg's equality-delete
    * files): the matched rows' `keyCols` values are appended to the
    * store's delete set (a tiny parquet of keys), and [[readMerged]]
    * subtracts them with an anti-join at read time. At 100 TB this is the
    * difference between deleting 0.1% of rows by writing KBs of keys
    * versus rewriting the table; the read-time anti-join stays cheap
    * because the delete side is broadcast-sized until [[compactDeletes]]
    * folds it in. Rows whose key columns are NULL are never matched by the
    * anti-join (equality-delete semantics) — use non-null keys.
    *
    * Concurrency: the read-modify-write of the delete set runs through
    * [[commitIf]] pinned to the delete-set version it read, so a
    * concurrent deleteWhere cannot be silently overwritten (the classic
    * lost update of last-writer-wins): the loser's CAS throws, the keys
    * are re-derived from the winner's snapshot, and the retry commits the
    * UNION — both deletes land.
    */
  def deleteWhere(spark: SparkSession, root: String, store: String,
                  cond: Column, keyCols: Seq[String], keep: Int = 2): Map[String, Long] = {
    require(keyCols.nonEmpty, "deleteWhere: at least one key column")
    var attempts = 0
    while (true) {
      val delVersion = snapshot(spark, root).get(deletesStore(store))
      val newKeys = readMerged(spark, root, store)
        .filter(cond).select(keyCols.map(col): _*).distinct()
      val allKeys = delVersion match {
        case Some(_) =>
          val existing = read(spark, root, deletesStore(store))
          require(existing.columns.sorted.toSeq == keyCols.sorted,
            s"deleteWhere: key columns ${keyCols.mkString(",")} differ from the " +
              s"store's existing delete schema ${existing.columns.mkString(",")}")
          existing.unionByName(newKeys).distinct()
        case None => newKeys
      }
      try return commitIf(root, Map(deletesStore(store) -> allKeys),
        Map(deletesStore(store) -> delVersion), keep)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > 20) throw e // live delete contention — surface it
      }
    }
    sys.error("unreachable")
  }

  /** Read one store at the live snapshot with its delete set applied —
    * what a SELECT sees after [[deleteWhere]]. No delete set committed =
    * plain [[read]].
    */
  def readMerged(spark: SparkSession, root: String, store: String): DataFrame =
    mergeDeletes(read(spark, root, store), spark, root, store,
      snapshot(spark, root))

  /** Time-travel [[readMerged]]: the data AND the delete set as of
    * manifest `m` — a delete is as time-travel-visible as a write.
    */
  def readMergedAt(spark: SparkSession, root: String, store: String, m: Long): DataFrame =
    mergeDeletes(readAt(spark, root, store, m), spark, root, store,
      snapshotAt(spark, root, m), Some(m))

  private def mergeDeletes(data: DataFrame, spark: SparkSession, root: String,
                           store: String, snap: Map[String, Long],
                           at: Option[Long] = None): DataFrame =
    snap.get(deletesStore(store)) match {
      case None => data
      case Some(_) =>
        val del = at match {
          case Some(m) => readAt(spark, root, deletesStore(store), m)
          case None    => read(spark, root, deletesStore(store))
        }
        data.join(del, del.columns.toSeq, "left_anti")
    }

  /** Fold the delete set into the data: rewrite the store as its merged
    * view and reset the delete set to empty, in ONE snapshot commit (a
    * reader time-traveling to any manifest still sees a consistent
    * data-minus-deletes pair). This is the maintenance pass that keeps the
    * read-time anti-join side broadcast-sized — run it when the delete set
    * grows past broadcast scale or on a compaction schedule.
    */
  def compactDeletes(spark: SparkSession, root: String, store: String,
                     keep: Int = 2,
                     stats: Map[String, Seq[String]] = Map.empty): Map[String, Long] = {
    val snap = snapshot(spark, root)
    require(snap.contains(deletesStore(store)),
      s"compactDeletes: store '$store' has no delete set to fold in")
    val emptyKeys = read(spark, root, deletesStore(store)).filter(lit(false))
    commit(root, Map(
      store                -> readMerged(spark, root, store),
      deletesStore(store)  -> emptyKeys), keep, stats = stats)
  }

  /** Idempotent micro-batch commit — the streaming→transaction-log bridge
    * (Delta's `txn` appId/version marker, expressed as a store): `writes`
    * land together with a one-row `<sinkId>.txn` marker store holding the
    * batch id, in ONE manifest, so "did batch N apply?" is answered by the
    * same atomic pointer that published its data. Structured Streaming's
    * `foreachBatch` re-delivers a batch after a crash-restart; replaying
    * an id at-or-below the marker returns false and writes NOTHING, which
    * upgrades at-least-once delivery to exactly-once application. The
    * marker advance goes through [[commitIf]] pinned to the marker version
    * read, so two racing sinks with the same sinkId cannot both apply one
    * batch — the CAS loser re-reads and sees the batch already applied.
    *
    * Batch ids must be monotonically increasing per sinkId (foreachBatch's
    * contract). Returns true iff this call applied the batch.
    */
  def commitBatch(root: String, sinkId: String, batchId: Long,
                  writes: Map[String, DataFrame], keep: Int = 2,
                  stats: Map[String, Seq[String]] = Map.empty): Boolean = {
    require(writes.nonEmpty, "commitBatch: no stores to write")
    val spark    = writes.head._2.sparkSession
    val txnStore = sinkId + ".txn"
    import spark.implicits._
    var attempts = 0
    while (true) {
      val snap       = snapshot(spark, root)
      val txnVersion = snap.get(txnStore)
      val lastId = txnVersion.map(_ =>
        read(spark, root, txnStore).head().getLong(0))
      if (lastId.exists(_ >= batchId)) return false // already applied
      try {
        commitIf(root,
          writes + (txnStore -> Seq(batchId).toDF("batch_id")),
          Map(txnStore -> txnVersion), keep, stats = stats)
        return true
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > 20) throw e // live same-sink contention — surface it
      }
    }
    sys.error("unreachable")
  }

  // ---- stats-driven file pruning (zone maps) -------------------------------

  /** The per-file zone map of `store`'s live version: one row per data
    * file — `file`, `min_<c>`/`max_<c>` per stats column, `n_rows`.
    * Present only for versions committed with `stats` naming the store.
    */
  def fileStats(spark: SparkSession, root: String, store: String): DataFrame = {
    val v = snapshot(spark, root).getOrElse(store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    spark.read.parquet(s"${root.stripSuffix("/")}/$store/stats_v=$v")
  }

  /** Range read that opens ONLY the files whose `[min_c, max_c]` zone
    * intersects `[lo, hi]` — file skipping from commit-time stats, the
    * scan path a lakehouse query planner takes before parquet footers are
    * even opened. The residual predicate is still applied (zones are a
    * superset); on a range-clustered table (writer used
    * `repartitionByRange(c)`) the skip rate approaches the selectivity.
    * The file list is driver-side metadata: one row per FILE, bounded by
    * layout, never by row count.
    */
  def readPruned(spark: SparkSession, root: String, store: String,
                 c: String, lo: Column, hi: Column): DataFrame =
    readPrunedRanges(spark, root, store, Seq((c, lo, hi)))

  /** Conjunctive multi-column zone pruning: a file survives only if EVERY
    * range intersects its zone. Pairs naturally with a Z-ordered writer
    * (`LayoutOps.clusterByZ` interleaves the dimensions, so each file's
    * per-column min/max boxes are tight in all of them simultaneously) —
    * the zone map turns the Z-layout into genuine multi-dimensional file
    * skipping, the Delta/Iceberg `ZORDER BY` + stats combination.
    */
  def readPrunedRanges(spark: SparkSession, root: String, store: String,
                       ranges: Seq[(String, Column, Column)]): DataFrame = {
    require(ranges.nonEmpty, "readPrunedRanges: at least one range")
    val v = snapshot(spark, root).getOrElse(store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    val dir   = s"${root.stripSuffix("/")}/$store/v=$v"
    val zones = spark.read.parquet(s"${root.stripSuffix("/")}/$store/stats_v=$v")
    val zonePred = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    val files = zones.filter(zonePred).select("file").collect().map(_.getString(0))
    val residual = ranges.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false))
    else
      spark.read.parquet(files.toIndexedSeq: _*).filter(residual)
  }

  // ---- OPTIMIZE (bin-packing compaction) + bloom point-lookup pruning ----

  /** Per-file Bloom sketch sizing for `commit(bloom = ...)` sidecars:
    * 2^20 bits = 128 KiB per (file, column) sketch, ~1e-4 false-positive
    * rate at 64 K distinct keys per file. A sidecar row per data file —
    * metadata-sized at any corpus scale (a 100 TB store at 1 GB/file is
    * ~100 K sidecar rows ≈ 13 GB of sketches, read file-list-wise, never
    * joined to data).
    */
  val BloomNumBits: Long       = 1L << 20
  val BloomExpectedItems: Long = BloomNumBits / 16

  /** OPTIMIZE — the small-file bin-packing compaction every lakehouse
    * needs once streaming/batch ingest has fragmented a store: rewrite the
    * live data version's ROWS (unchanged) into `targetFiles` files,
    * range-clustered by `clusterBy` when given (so zone maps stay tight —
    * the `ZORDER`-lite layout half of the Delta OPTIMIZE verb), and commit
    * the rewrite as a NEW version with fresh `stats`/`bloom` sidecars.
    * Old manifests still reference the fragmented version — time travel is
    * unaffected, and retention eventually sweeps it.
    *
    * Runs through [[commitIf]] pinned to the version it read: an OPTIMIZE
    * racing a data commit must LOSE (throw, caller re-runs over the fresh
    * snapshot) rather than silently publish a rewrite of stale data over
    * the winner — rewrites that change no rows still change pointers.
    */
  def optimize(spark: SparkSession, root: String, store: String,
               targetFiles: Int, clusterBy: Seq[String] = Nil,
               stats: Seq[String] = Nil, bloom: Seq[String] = Nil,
               keep: Int = 2): Map[String, Long] = {
    require(targetFiles > 0, "optimize: targetFiles must be positive")
    val v = snapshot(spark, root).getOrElse(store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    val data = read(spark, root, store)
    val shaped =
      if (clusterBy.nonEmpty)
        data.repartitionByRange(targetFiles, clusterBy.map(col): _*)
      else data.repartition(targetFiles)
    commitIf(root, Map(store -> shaped), Map(store -> Some(v)), keep,
      stats = if (stats.nonEmpty) Map(store -> stats) else Map.empty,
      bloom = if (bloom.nonEmpty) Map(store -> bloom) else Map.empty)
  }

  /** RESTORE (Delta's `RESTORE TABLE ... TO VERSION`): roll `store` back
    * to its state at retained manifest `m` — data pointer AND
    * equality-delete-set pointer together, since the visible table state
    * is their merge — by publishing a NEW manifest. Pointer-only: no data
    * is rewritten or deleted, so a 100 TB restore costs one manifest file;
    * the bad commits stay in history (still time-travel-queryable) and the
    * restored version is re-referenced by the new head, which is what
    * keeps the pruner protecting its files. A delete set that did not
    * exist at `m` is REMOVED from the new snapshot (its rows come back);
    * stores other than `store` are carried forward untouched. Restoring
    * past the retention horizon is refused — `m` must still be retained
    * (Delta's "cannot restore beyond VACUUM" rule), validated at snapshot
    * AND re-validated before every publish attempt, since a concurrent
    * commit's prune can drop m (and sweep the target version dirs) after
    * the first check.
    *
    * Concurrency: last-writer-wins through the same manifest-name race as
    * [[commit]] — a concurrent commit landing first forces a re-read of
    * its snapshot, so the restore never silently rolls back pointers it
    * merely carried forward (the doCommit lost-update lesson).
    */
  def restore(spark: SparkSession, root: String, store: String, m: Long,
              keep: Int = 2, pruneGraceMs: Long = DefaultPruneGraceMs): Map[String, Long] = {
    val (fs, rootP) = hfs(spark, root)
    val target      = snapshotAt(spark, root, m) // validates m is retained
    require(target.contains(store),
      s"MultiStore at $root: store '$store' absent at manifest m=$m — nothing to restore")
    val touched = Seq(store, deletesStore(store))
    var attempts = 0
    while (true) {
      val baseNums = manifestNumbers(fs, rootP)
      // Re-validate INSIDE the retry loop (time-of-check/time-of-use): a
      // concurrent commit that won a race may have pruned manifest m — and
      // swept the target version dirs it alone protected — between our
      // snapshotAt above and this publish attempt. Publishing then would
      // resurrect pointers to deleted files; fail loudly instead (the
      // caller re-reads history and decides, same as losing commitIf).
      require(baseNums.contains(m),
        s"MultiStore at $root: manifest m=$m fell past the retention horizon " +
          "during restore (a concurrent commit pruned it) — aborting")
      touched.foreach { s =>
        target.get(s).foreach { v =>
          require(fs.exists(new org.apache.hadoop.fs.Path(rootP, s"$s/v=$v")),
            s"MultiStore at $root: restore target $s/v=$v was swept by a " +
              "concurrent prune — aborting")
        }
      }
      val base     = baseNums.lastOption.map(readManifest(fs, rootP, _)).getOrElse(Map.empty[String, Long])
      val snap     = (base -- touched) ++ touched.flatMap(s => target.get(s).map(s -> _))
      val mNext    = baseNums.lastOption.getOrElse(-1L) + 1
      val tmp = new org.apache.hadoop.fs.Path(rootP,
        s".manifest_attempt_${mNext}_${attempts}_${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(snap.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      if (AtomicFs.publish(fs, tmp, new org.apache.hadoop.fs.Path(rootP, ManifestPrefix + mNext))) {
        prune(fs, rootP, root, keep, pruneGraceMs)
        return snap
      }
      attempts += 1
      if (attempts > 100)
        throw new IllegalStateException(
          s"MultiStore at $root: lost the manifest race $attempts times during restore")
    }
    sys.error("unreachable")
  }

  /** The per-file Bloom sidecar of `store`'s live version: one row per
    * data file — `file`, `bloom_<c>` (serialized sketch) per bloom
    * column, `n_rows`. Present only for versions committed with `bloom`
    * naming the store.
    */
  def fileBlooms(spark: SparkSession, root: String, store: String): DataFrame = {
    val v = snapshot(spark, root).getOrElse(store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    spark.read.parquet(s"${root.stripSuffix("/")}/$store/bloom_v=$v")
  }

  /** Equality (point-lookup) read that opens ONLY the files whose Bloom
    * sketch might contain `value` — the Delta "bloom filter index" path
    * for high-cardinality columns where min/max zones are useless (a
    * hash-distributed id intersects every file's range, but lands in ~one
    * file's sketch). The sketch check runs on the DRIVER over the per-file
    * sidecar rows (one row per file, bounded by layout) using the same
    * Catalyst [[BloomFilterMightContain]] the scan-side runtime filter
    * uses; false positives are stripped by the residual equality filter,
    * so the result equals the plain filter by construction.
    */
  def readPrunedEq(spark: SparkSession, root: String, store: String,
                   c: String, value: Column): DataFrame =
    readPrunedEqMulti(spark, root, store, c, Seq(value)).head

  /** Batched point lookup: [[readPrunedEq]] for several probe values of
    * the SAME column against the SAME live version, returning one pruned
    * frame per value (order preserved). The snapshot resolution, data-dir
    * schema read, probe hashing, and the per-file Bloom sidecar collect
    * are paid ONCE for the whole batch instead of once per key — the
    * sidecar is KB-per-file metadata, but each re-read was a full driver
    * job (r15 measurement: m15's five single-key lookups spent ~1.5 s, of
    * which ~1.2 s was five repeats of identical sidecar/schema work; guide
    * §1.2 "don't compute things you throw away"). Per-key semantics are
    * UNCHANGED: each returned frame opens only the files whose sketch
    * might contain its value, with the residual equality filter on top.
    */
  def readPrunedEqMulti(spark: SparkSession, root: String, store: String,
                        c: String, values: Seq[Column]): Seq[DataFrame] = {
    val v = snapshot(spark, root).getOrElse(store,
      throw new IllegalStateException(s"MultiStore at $root has no committed store '$store'"))
    val dir = s"${root.stripSuffix("/")}/$store/v=$v"
    // hash each probe value through the SAME expression the commit-side
    // sketch hashed the column with (a one-row local-relation projection —
    // constant-folded, no cluster job). xxhash64 is TYPE-sensitive: an INT
    // 7 and a BIGINT 7 hash differently, and a mistyped probe would give
    // bloom false NEGATIVES (files never opened — unrecoverable by the
    // residual filter). Cast the probes to the stored column's type first.
    val schema     = spark.read.parquet(dir).schema
    val storedType = schema(c).dataType
    val hRow = spark.range(1)
      .select(values.zipWithIndex.map { case (value, i) =>
        xxhash64(value.cast(storedType)).as(s"h$i")
      }: _*)
      .head()
    val sidecar = spark.read.parquet(s"${root.stripSuffix("/")}/$store/bloom_v=$v")
      .select(col("file"), col(s"bloom_$c")).collect()
    values.zipWithIndex.map { case (value, i) =>
      require(!hRow.isNullAt(i), s"readPrunedEq: value for '$c' must be a non-null literal")
      val h = Literal(hRow.getLong(i))
      val files = sidecar
        .filter { r =>
          val sketch = r.getAs[Array[Byte]](1)
          sketch != null &&
            BloomFilterMightContain(
              Literal(sketch, org.apache.spark.sql.types.BinaryType), h)
              .eval(null).asInstanceOf[Boolean]
        }
        .map(_.getString(0))
      if (files.isEmpty) {
        // a genuinely file-less empty frame (schema only), so callers
        // counting inputFiles see the zero files the sketch check opened
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else spark.read.parquet(files.toIndexedSeq: _*).filter(col(c) === value)
    }
  }

  /** Commit `writes` as ONE snapshot: every data version lands first (each
    * in a fresh claimed dir, never touching live data), then a single
    * rename publishes the manifest that names them all plus every
    * unchanged store carried forward. Returns the committed snapshot.
    *
    * `stats` names, per store, the columns to zone-map: after the data
    * lands, one extra aggregation pass over the written files records each
    * file's per-column min/max (plus its row count) in a `stats_v=<n>`
    * parquet sidecar NEXT TO the version dir — a sibling, not a child,
    * because Spark's scan planner skips underscore/dot-prefixed paths, and
    * a sidecar inside the version dir would be readable only through a
    * warned-but-tolerated hidden-path read. The sidecar lives and dies
    * with its version (prune sweeps them together). [[readPruned]]
    * consults it to open only the files whose range intersects a
    * predicate — the Delta/Iceberg file-skipping story: at 100 TB a
    * date-range query over a range-clustered table touches the manifest
    * stats (KB) and the few matching files, not every footer of every
    * file. Stats are computed before the manifest publish, so a crash
    * mid-commit never publishes a stats-less version.
    */
  def commit(root: String, writes: Map[String, DataFrame], keep: Int = 2,
             pruneGraceMs: Long = DefaultPruneGraceMs,
             stats: Map[String, Seq[String]] = Map.empty,
             bloom: Map[String, Seq[String]] = Map.empty): Map[String, Long] =
    doCommit(root, writes, keep, pruneGraceMs, stats, bloom, expected = None)

  /** Compare-and-swap commit — the conflict-DETECTING half a transaction
    * log adds over last-writer-wins: the commit publishes only if every
    * store in `expected` still resolves to the stated version (`None` =
    * "store must not exist yet") at publish time. A concurrent writer who
    * bumped one of those stores makes this commit throw
    * [[java.util.ConcurrentModificationException]] instead of silently
    * recommitting over the winner — the caller re-derives its writes from
    * the fresh snapshot and retries, which is exactly what read-modify-
    * write maintainers ([[deleteWhere]]) do. Stores NOT named in
    * `expected` are unconstrained; concurrent commits to DISJOINT stores
    * therefore rebase and land automatically (serializable at store
    * grain). Data written before a detected conflict is an unreferenced
    * version; the grace-window prune sweeps it like any dead orphan.
    */
  def commitIf(root: String, writes: Map[String, DataFrame],
               expected: Map[String, Option[Long]], keep: Int = 2,
               pruneGraceMs: Long = DefaultPruneGraceMs,
               stats: Map[String, Seq[String]] = Map.empty,
               bloom: Map[String, Seq[String]] = Map.empty): Map[String, Long] =
    doCommit(root, writes, keep, pruneGraceMs, stats, bloom, Some(expected))

  private def doCommit(root: String, writes: Map[String, DataFrame], keep: Int,
                       pruneGraceMs: Long, stats: Map[String, Seq[String]],
                       bloom: Map[String, Seq[String]],
                       expected: Option[Map[String, Option[Long]]]): Map[String, Long] = {
    require(writes.nonEmpty, "MultiStore.commit: no stores to write")
    val spark       = writes.head._2.sparkSession
    val (fs, rootP) = hfs(spark, root)
    if (!fs.exists(rootP)) fs.mkdirs(rootP)

    var attempts = 0
    var done: Option[Map[String, Long]] = None
    while (done.isEmpty) {
      // Base snapshot AND the manifest number it came from are read in ONE
      // listing: the publish below targets exactly base-manifest + 1, so a
      // concurrent commit landing in between makes our rename FAIL (name
      // taken) instead of us publishing a stale base on top of it. Reading
      // the number again at publish time is the lost-update hole the
      // concurrent-deleteWhere race test caught: a loser that re-lists
      // after the winner's publish gets a FRESH number, renames cleanly,
      // and silently rolls back every pointer the winner advanced that
      // this commit merely carried forward.
      val baseNums = manifestNumbers(fs, rootP)
      val base     = baseNums.lastOption.map(readManifest(fs, rootP, _)).getOrElse(Map.empty[String, Long])
      // 0. CAS validation — checked against every refreshed snapshot, so a
      // conflict that lands during a manifest-race retry is caught too;
      // the publish-time rename keeps the check authoritative (a conflict
      // arriving between here and the rename forces a retry, which
      // re-validates before trying again)
      expected.foreach { exp =>
        exp.foreach { case (store, want) =>
          val cur = base.get(store)
          if (cur != want)
            throw new java.util.ConcurrentModificationException(
              s"MultiStore at $root: store '$store' is at version " +
                s"${cur.fold("<absent>")(_.toString)}, expected " +
                s"${want.fold("<absent>")(_.toString)} — a concurrent commit won; " +
                "re-derive writes from the fresh snapshot and retry")
        }
      }
      // 1. data first: claim + write a fresh immutable version per store
      val newVersions = writes.map { case (store, df) =>
        val storeRoot = s"${root.stripSuffix("/")}/$store"
        val (sfs, sp) = hfs(spark, storeRoot)
        if (!sfs.exists(sp)) sfs.mkdirs(sp)
        val existing = sfs.listStatus(sp).toSeq.map(_.getPath.getName)
          .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
        var next = (existing :+ base.getOrElse(store, -1L)).max + 1
        // AtomicFs.claim, not fs.create(overwrite=false): the local-FS
        // "exclusive" create is check-then-act, and two committers that
        // both claim one version number proceed to write the SAME v= dir —
        // the lost-update / _temporary-collision the concurrent-deleteWhere
        // race test caught before this went through O_EXCL.
        while (!AtomicFs.claim(sfs, new org.apache.hadoop.fs.Path(sp, s"_graft_claim_v=$next")))
          next += 1
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$storeRoot/v=$next")
        stats.get(store).foreach { cols =>
          val written = spark.read.parquet(s"$storeRoot/v=$next")
          val aggs = cols.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
            count(lit(1)).as("n_rows")
          written.groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*)
            .coalesce(1) // one row per data FILE — KB-sized at any scale
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$storeRoot/stats_v=$next")
        }
        bloom.get(store).foreach { cols =>
          val written = spark.read.parquet(s"$storeRoot/v=$next")
          val aggs = cols.map(c =>
            GraftColumnBridge.column(new BloomFilterAggregate(
              GraftColumnBridge.expression(xxhash64(col(c))),
              Literal(BloomExpectedItems), Literal(BloomNumBits))
              .toAggregateExpression())
              .as(s"bloom_$c")) :+ count(lit(1)).as("n_rows")
          written.groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*)
            .coalesce(1) // one (file, sketch...) row per data FILE
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$storeRoot/bloom_v=$next")
        }
        store -> next
      }
      // 2. one atomic publish: tmp file renamed into the next manifest name
      val snap = base ++ newVersions
      val m    = baseNums.lastOption.getOrElse(-1L) + 1
      // tmp name must be unique PER COMMITTER, not just per (m, attempt):
      // two committers racing the same manifest number would share one tmp
      // file — the winner's publish consumes it out from under the loser
      val tmp = new org.apache.hadoop.fs.Path(rootP,
        s".manifest_attempt_${m}_${attempts}_${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out  = fs.create(tmp, true)
      try out.write(snap.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      // AtomicFs.publish, not fs.rename: local-FS rename's fail-if-exists
      // is an exists() check before rename(2) — two concurrent publishes
      // to one manifest name could BOTH report success, the second
      // silently replacing the first committer's manifest. The publish
      // must be a genuinely atomic install-iff-absent (link(2) locally,
      // native rename on HDFS), or the manifest race detection that the
      // whole retry/CAS story rests on has a hole exactly under contention.
      if (AtomicFs.publish(fs, tmp, new org.apache.hadoop.fs.Path(rootP, ManifestPrefix + m))) {
        prune(fs, rootP, root, keep, pruneGraceMs)
        done = Some(snap)
      } else {
        // a concurrent committer took manifest m: retry over its snapshot
        attempts += 1
        if (attempts > 100)
          throw new IllegalStateException(
            s"MultiStore at $root: lost the manifest race $attempts times — live contention")
      }
    }
    done.get
  }

  /** A retrying committer re-claims a FRESH version on every attempt, so
    * its manifest, when it finally lands, never references a version a
    * concurrent pruner could have seen unreferenced. The one thing it
    * relies on (the retention floor): the gap between writing a data
    * version and publishing the manifest that references it must stay
    * inside this grace window, because a concurrent committer's prune
    * sweeps unreferenced versions only once their files are older than
    * the grace. 15 min covers any realistic write-to-publish gap; tests
    * pass 0 to make orphan sweeps immediate.
    */
  val DefaultPruneGraceMs: Long = 15 * 60 * 1000L

  /** Drop manifests beyond the last `keep` and any data version no
    * retained manifest references — REGARDLESS of version number: a
    * committer that lost the manifest race (or crashed after claiming and
    * writing) leaves an orphan version that may be numbered ABOVE every
    * retained reference, so a below-the-minimum sweep alone leaks it
    * forever (r10 ADVICE). The age guard (`graceMs`) is what keeps the
    * wider sweep safe: an IN-FLIGHT commit's freshly written version is
    * also unreferenced until its manifest rename lands, and is
    * distinguishable from a dead orphan only by file age.
    */
  private def prune(fs: org.apache.hadoop.fs.FileSystem,
                    rootP: org.apache.hadoop.fs.Path, root: String, keep: Int,
                    graceMs: Long): Unit = {
    val all      = manifestNumbers(fs, rootP)
    val retained = all.takeRight(keep)
    // References of the manifests being dropped, read BEFORE deleting them:
    // a version one of them names was PUBLISHED (it cannot be an in-flight
    // write), so once no retained manifest references it either, it is
    // sweepable immediately — the keep=N retention semantics. Versions no
    // manifest ever named are indistinguishable from a commit mid-publish
    // and get only the age-guarded sweep below.
    val droppedRefs: Map[String, Set[Long]] = all.dropRight(keep)
      .flatMap(m => readManifest(fs, rootP, m).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    all.dropRight(keep).foreach(m =>
      fs.delete(new org.apache.hadoop.fs.Path(rootP, ManifestPrefix + m), false))
    val referenced: Map[String, Set[Long]] = retained
      .flatMap(m => readManifest(fs, rootP, m).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(rootP).toSeq.filter(_.isDirectory).foreach { st =>
      val store = st.getPath.getName
      referenced.get(store).foreach { keepVersions =>
        val superseded = droppedRefs.getOrElse(store, Set.empty)
        fs.listStatus(st.getPath).toSeq.foreach { entry =>
          val name = entry.getPath.getName
          // A dropped manifest's reference was committed — sweep it the
          // moment retention drops it. A version NO manifest ever named may
          // be a concurrent committer's write in flight (it claims its
          // number before any publish — the pre-r12 below-the-minimum
          // "nothing can be in-flight" shortcut was false exactly here: a
          // later committer can publish a HIGHER version while an earlier
          // claim is still writing, and an unguarded sweep then deletes the
          // write out from under its job), hence the age guard.
          def sweepable(v: Long, mtime: Long): Boolean =
            !keepVersions.contains(v) && (superseded.contains(v) || mtime < cutoff)
          if (name.startsWith("v=")) {
            val v = name.stripPrefix("v=").toLong
            if (sweepable(v, entry.getModificationTime)) {
              fs.delete(entry.getPath, true)
              val claim = new org.apache.hadoop.fs.Path(st.getPath, s"_graft_claim_v=$v")
              if (fs.exists(claim)) fs.delete(claim, false)
              // the zone-map/bloom sidecars live and die with their version
              Seq(s"stats_v=$v", s"bloom_v=$v").foreach { side =>
                val p = new org.apache.hadoop.fs.Path(st.getPath, side)
                if (fs.exists(p)) fs.delete(p, true)
              }
            }
          } else if (name.startsWith("stats_v=") || name.startsWith("bloom_v=")) {
            // sidecar whose data dir is already gone (e.g. a committer
            // crashed between stats write and data write ordering, or an
            // earlier prune predates sidecar-aware sweeping)
            val v = name.dropWhile(_ != '=').tail.toLong
            if (sweepable(v, entry.getModificationTime) &&
                !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, s"v=$v")))
              fs.delete(entry.getPath, true)
          } else if (name.startsWith("_graft_claim_v=")) {
            // claim with no data dir: a committer died between claim and
            // write — same rules before reclaiming the name
            val v = name.stripPrefix("_graft_claim_v=").toLong
            if (sweepable(v, entry.getModificationTime) &&
                !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, s"v=$v")))
              fs.delete(entry.getPath, false)
          }
        }
      }
    }
  }
}
