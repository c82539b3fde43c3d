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

  val all: Seq[Q] = Seq(m10_time_travel)
}
