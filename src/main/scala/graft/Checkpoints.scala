package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Lifecycle management for `localCheckpoint` blocks.
  *
  * `Dataset.localCheckpoint()` persists the checkpointed rows in the block
  * manager, and — unlike a plain `persist` — those blocks are the ONLY copy
  * of the data: the lineage is truncated, so Spark can never recompute them
  * and therefore never evicts them on its own. They die only when the
  * ContextCleaner notices the RDD object is unreachable, which requires a
  * driver-side GC — something a busy benchmark or service JVM may not run
  * for minutes. An iterative query that checkpoints every round (the graph
  * loops in [[graft.operators.GraphOps]]) would otherwise leak one round's
  * blocks per iteration for the lifetime of the JVM; across a 119-query
  * registry in one JVM that pressure lands as eviction/GC stalls on
  * whichever query runs next (the round-6 g7 bench spike: 7.4 s median,
  * 9.9 s spread, on code unchanged since round 5).
  *
  * A `Scope` tracks every checkpoint taken through it and releases the ones
  * that are no longer reachable from the frames the caller says are still
  * live. The returned frame of an iterative operator keeps its final
  * checkpoint blocks (callers consume them); whole-query cleanup between
  * benchmark/verify queries stays the harness's job (blocking sweep of
  * `getPersistentRDDs` in Bench/Verify).
  */
object Checkpoints {

  /** Tracks the block-manager RDDs behind `localCheckpoint` calls made
    * through [[checkpoint]], keyed by the checkpointed frame, so dead
    * intermediates can be released mid-query with [[retain]].
    *
    * Not thread-safe; one Scope per (single-threaded) driver loop.
    */
  final class Scope(spark: SparkSession) {
    // The checkpointed Dataset object -> the persistent-RDD ids its blocks
    // live under. Reference identity (Dataset does not override equals).
    private val byFrame = mutable.Map.empty[DataFrame, Set[Int]]
    private val rdds    = mutable.Map.empty[Int, RDD[_]]

    /** Eagerly localCheckpoint `df`, remembering the backing RDD. The id is
      * recovered by diffing `getPersistentRDDs` around the call —
      * localCheckpoint registers exactly the internal RDD it persists, and
      * the call is synchronous (eager), so in a single-threaded loop the
      * diff is precise.
      */
    def checkpoint(df: DataFrame): DataFrame = {
      val sc     = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val cp     = df.localCheckpoint()
      val added  = sc.getPersistentRDDs.view.filterKeys(id => !before(id)).toMap
      byFrame(cp) = added.keySet.toSet
      rdds ++= added
      cp
    }

    /** Release every tracked checkpoint NOT backing one of `live`. Safe to
      * call right after a new checkpoint materializes: eager checkpointing
      * has already read whatever upstream blocks it needed, so the old
      * generation is garbage the moment the new one exists.
      */
    def retain(live: DataFrame*): Unit = {
      val keep = live.flatMap(df => byFrame.getOrElse(df, Set.empty)).toSet
      val dead = rdds.view.filterKeys(id => !keep(id)).toMap
      // non-blocking: the loop continues while the block manager drains;
      // harness-level sweeps (Bench/Verify) are the blocking backstop
      dead.values.foreach(_.unpersist(false))
      dead.keys.foreach(rdds.remove)
      byFrame.filterInPlace((df, ids) => live.exists(_ eq df) || ids.exists(keep))
    }
  }

  def scope(spark: SparkSession): Scope = new Scope(spark)

  /** Blocking whole-JVM sweep of every persistent RDD — for harnesses
    * (bench, verify) at points where no prior query's frame will be read
    * again. Blocking so the next query starts with the block manager
    * actually empty, not draining.
    */
  def sweepAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
}
