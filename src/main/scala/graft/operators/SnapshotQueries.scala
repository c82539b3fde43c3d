package graft.operators

import org.apache.spark.sql.functions._

import graft.Q

/** Driver-stamped snapshot-store machinery (the r10 extension of the m9
  * MERGE story toward a table format): m10_time_travel runs TWO real
  * [[graft.sources.MultiStore]] commits — an initial rollup snapshot and
  * a full-refresh second snapshot — then TIME-TRAVELS back to the first
  * manifest and reports the before/after/delta per group. The store root,
  * version dirs, numbered manifests, atomic publishes, history listing,
  * and `readAt` all execute for real on every run (a fresh temp root per
  * invocation, deleted before the query returns — the tiny result is
  * eagerly checkpointed first so nothing re-reads the store); only the
  * CONTENT is what
  * DuckDB replays, since both snapshots are pure functions of the orders
  * table and a fixed cutoff. A broken commit, a torn manifest, or a
  * time-travel read resolving the wrong version all break the hash.
  * Reference anchor: the session-store versioned read-back
  * (sessions/manager.py:502-525) promoted to snapshot grain.
  */
object SnapshotQueries {

  val m10_time_travel = Q(
    "m10_time_travel",
    """WITH b AS (
      |  SELECT o_orderpriority AS priority, count(*) AS n_before
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
      |a AS (SELECT o_orderpriority AS priority, count(*) AS n_after FROM orders GROUP BY 1)
      |SELECT a.priority, COALESCE(b.n_before, 0) AS n_before, a.n_after,
      |       a.n_after - COALESCE(b.n_before, 0) AS delta
      |FROM a LEFT JOIN b ON a.priority = b.priority
      |ORDER BY a.priority""".stripMargin,
  ) { t =>
    val spark = t.spark
    import graft.sources.MultiStore
    val root = java.nio.file.Files.createTempDirectory("graft-timetravel").toString + "/snap"
    val cutoff = lit("1998-01-01").cast("timestamp")
    // snapshot 1: the pre-cutoff rollup
    MultiStore.commit(root, Map("rollup" ->
      t.orders.filter(col("o_orderdate") < cutoff)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))))
    // snapshot 2: the full refresh (a later maintenance pass)
    MultiStore.commit(root, Map("rollup" ->
      t.orders
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))))
    val history = MultiStore.manifests(spark, root)
    val before  = MultiStore.readAt(spark, root, "rollup", history.head)
      .select(col("priority"), col("n").as("n_before"))
    val after = MultiStore.readAt(spark, root, "rollup", history.last)
      .select(col("priority"), col("n").as("n_after"))
    val result = after.join(before, Seq("priority"), "left")
      .select(
        col("priority"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        col("n_after"),
        (col("n_after") - coalesce(col("n_before"), lit(0L))).as("delta"))
      .orderBy("priority")
      // eager checkpoint (priority-count-sized, a handful of rows)
      // truncates the lineage so the temp store can be deleted NOW —
      // bench repeats were accumulating orphan graft-timetravel dirs in
      // /tmp across rounds (r10 ADVICE)
      .localCheckpoint(true)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(root).getParent)
    result
  }

  /** Shared temp-store harness: build a fresh MultiStore root, run `body`,
    * eagerly checkpoint the (small) result so the store can be deleted
    * before the query returns — no temp dirs accumulate across bench
    * repeats (the m10 lesson, r10 ADVICE).
    */
  private def withTempStore(prefix: String)(
      body: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tmp  = java.nio.file.Files.createTempDirectory(prefix)
    val root = tmp.toString + "/store"
    try body(root).localCheckpoint(true)
    finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(tmp)
    }
  }

  /** m11: merge-on-read row-level DELETE — the lakehouse delete path that
    * rewrites NOTHING: the matched doc_ids land in an equality-delete key
    * store (KB-sized), the data version is untouched, and the read
    * subtracts the keys with an anti-join. Every run executes the real
    * machinery — a data commit, a deleteWhere commit, a merged read, PLUS
    * a time-travel read back to the pre-delete manifest whose count guards
    * that the delete never touched the data version. DuckDB replays the
    * end state as a plain NOT-filter, and the pre-delete count as an
    * unfiltered count.
    */
  val m11_row_delete = Q(
    "m11_row_delete",
    """WITH kept AS (
      |  SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM documents WHERE NOT (n_chars < 200) GROUP BY lang),
      |tot AS (SELECT count(*) AS n_before FROM documents)
      |SELECT lang, n_docs, chars, tot.n_before
      |FROM kept, tot ORDER BY lang""".stripMargin,
  ) { t =>
    val spark = t.spark
    import graft.sources.MultiStore
    withTempStore("graft-rowdelete") { root =>
      MultiStore.commit(root, Map("docs" ->
        t.documents.select("doc_id", "lang", "n_chars")))
      val preDelete = MultiStore.manifests(spark, root).last
      MultiStore.deleteWhere(spark, root, "docs",
        col("n_chars") < lit(200L), Seq("doc_id"))
      // the pre-delete snapshot must still hold EVERY row (deletes are
      // key files, not data rewrites — a rewrite would break this count
      // and with it the hash)
      val before = MultiStore.readMergedAt(spark, root, "docs", preDelete)
        .agg(count(lit(1)).as("n_before"))
      MultiStore.readMerged(spark, root, "docs")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .crossJoin(before)
        .orderBy("lang")
    }
  }

  /** m12: stats-driven file pruning — a range-clustered commit records
    * per-file min/max zone maps; the range read opens only intersecting
    * files. The result must equal the plain filter (pruning is a superset
    * + residual), which is exactly what the oracle checks; the spec
    * (MultiStoreSpec) additionally asserts the file-skip actually
    * happened — fewer files opened than committed.
    */
  val m12_stats_pruning = Q(
    "m12_stats_pruning",
    """SELECT o_orderpriority AS priority, count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <= TIMESTAMP '1997-06-30'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { t =>
    val spark = t.spark
    import graft.sources.MultiStore
    withTempStore("graft-statsprune") { root =>
      MultiStore.commit(root,
        Map("orders" -> t.orders.repartitionByRange(8, col("o_orderdate"))),
        stats = Map("orders" -> Seq("o_orderdate")))
      MultiStore.readPruned(spark, root, "orders", "o_orderdate",
          lit("1997-01-01").cast("timestamp"), lit("1997-06-30").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          // decimal-exact sum, then one cast: addition order cannot move
          // the double (the float-sum determinism rule every money row
          // in Relational follows)
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("priority")
    }
  }

  val all: Seq[Q] = Seq(m10_time_travel, m11_row_delete, m12_stats_pruning)
}
