package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, Maintenance}

/** Typed entity models mirroring the reference's Pydantic records
  * (SURVEY §1.2; amplifier_library/models/sessions.py:45-84,
  * models/automations.py:65-117).
  */
object model {
  final case class Session(
      session_id: String,
      name: Option[String],
      parent_session_id: Option[String],
      amplified_dir: String,
      status: String, // created|active|completed|failed|terminated
      created_at: java.sql.Timestamp,
      ended_at: Option[java.sql.Timestamp],
      profile_name: String,
      message_count: Long,
      token_usage: Option[Long],
      is_unread: Boolean,
  )

  final case class Message(
      session_id: String,
      timestamp: java.sql.Timestamp,
      role: String,
      content: String,
      agent: Option[String],
      token_count: Option[Long],
  )

  final case class Automation(
      id: String,
      project_id: String,
      name: String,
      schedule_type: String, // cron|interval|once
      schedule_value: String,
      enabled: Boolean,
  )

  final case class ExecutionRecord(
      automation_id: String,
      session_id: String,
      executed_at: java.sql.Timestamp,
      status: String, // success|failed
      error: Option[String],
  )
}

/** The reference's endpoint families as a typed Dataset facade — the API a
  * reference user would switch to (SURVEY §7.1). Each method is one of the
  * §3 query lifecycles re-expressed as a single declarative plan; the
  * index/hydrate split of the reference disappears (columnar scan +
  * pushdown IS the index — SURVEY §4.1).
  */
final case class SessionStore(sessions: Dataset[model.Session]) {
  import model.Session

  /** GET /sessions with filters (§3.1): conjunctive filters -> sort ->
    * limit. One scan, predicates pushed; TakeOrderedAndProject for the
    * top-n — no global sort materializes.
    */
  def list(
      status: Option[String] = None,
      profileName: Option[String] = None,
      amplifiedDir: Option[String] = None,
      since: Option[java.sql.Timestamp] = None,
      parentSessionId: Option[String] = None,
      limit: Int = 50,
  ): Dataset[Session] = {
    val preds = Seq(
      status.map(col("status") === _),
      profileName.map(col("profile_name") === _),
      amplifiedDir.map(col("amplified_dir") === _),
      since.map(col("created_at") >= _),
      parentSessionId.map(col("parent_session_id") === _),
    ).flatten
    preds.foldLeft(sessions.toDF())((d, p) => d.filter(p))
      .orderBy(col("created_at").desc, col("session_id"))
      .limit(limit)
      .as[Session](sessions.encoder)
  }

  /** A1: unread counts per project (routers/sessions.py:774-785). */
  def unreadCounts: DataFrame =
    sessions.filter(col("is_unread"))
      .groupBy(col("amplified_dir"))
      .agg(count(lit(1)).as("unread_count"))

  /** J1/O7: roots with children attached, newest-activity-first
    * (RecentSessionsTable.tsx:38-92).
    */
  def recentWithChildren(limit: Int = 20): DataFrame = {
    val df       = sessions.toDF()
    val children = df.filter(col("parent_session_id").isNotNull)
    val roots    = df.filter(col("parent_session_id").isNull)
    val kids = children
      .groupBy(col("parent_session_id").as("session_id"))
      .agg(
        sort_array(collect_list(struct(col("created_at"), col("session_id").as("child_id"))), asc = false)
          .as("children"),
        max(col("created_at")).as("latest_child_at"))
    roots
      .join(kids, Seq("session_id"), "left")
      .withColumn("sort_key", greatest(col("created_at"), coalesce(col("latest_child_at"), col("created_at"))))
      .orderBy(col("sort_key").desc, col("session_id"))
      .limit(limit)
  }

  /** J2: orphaned children (parent id points nowhere). */
  def orphans: DataFrame = GraphOps.orphans(sessions.toDF(), "session_id", "parent_session_id")

  /** G3: ids removed by a cascade delete of `rootId`. */
  def cascadeDeleteIds(rootId: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val edges = sessions.toDF()
      .filter(col("parent_session_id").isNotNull)
      .select(col("parent_session_id").as("parent"), col("session_id").as("child"))
    // parent_session_id is a scalar -> parent-pointer tree; the tree walk
    // skips bfs's per-round cycle-tolerance shuffles (GraphOps r15 note)
    GraphOps.descendantsTree(edges, Seq(rootId).toDF("node"))
  }

  /** M3: retention sweep survivors (30-day default, protected statuses). */
  def retentionSurvivors(cutoff: java.sql.Timestamp, protectedStatuses: Seq[String] = Seq("active")): Dataset[Session] =
    Maintenance.retentionSweep(
      sessions.toDF(), "ended_at", "created_at", lit(cutoff), "status", protectedStatuses)
      .as[Session](sessions.encoder)

  /** G2: recursive subtree clone — new rows for `rootId` and every
    * descendant, ids deterministically remapped (`<old>_<suffix>`; the
    * reference suffixes only the root name but generates fresh uuids for
    * every node — routers/sessions.py:368-516), parent links re-pointed
    * into the clone. Returns only the cloned rows; union with the original
    * table to materialize.
    */
  def cloneSubtree(rootId: String, suffix: String)(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val df = sessions.toDF()
    val doomed = GraphOps.descendantsTree(
      df.filter(col("parent_session_id").isNotNull)
        .select(col("parent_session_id").as("parent"), col("session_id").as("child")),
      Seq(rootId).toDF("node")).select(col("node").as("session_id"))
    df.join(doomed, Seq("session_id"), "left_semi")
      .withColumn("session_id", concat(col("session_id"), lit("_"), lit(suffix)))
      .withColumn(
        "parent_session_id",
        when(col("session_id") === s"${rootId}_$suffix", col("parent_session_id")) // root keeps its parent
          .otherwise(concat(col("parent_session_id"), lit("_"), lit(suffix))))
      .as[Session](sessions.encoder)
  }

  /** ST7: conditional side-effect — mark sessions unread only when they
    * have no active subscriber AND are not already unread (routers/
    * messages.py:249-271). Pure set algebra: the conditional upsert a
    * foreachBatch sink applies per micro-batch.
    */
  def markUnreadIfUnobserved(completedSessionIds: DataFrame, activeSubscribers: DataFrame): Dataset[Session] = {
    val eligible = sessions.toDF()
      .join(completedSessionIds.select(col("session_id")), Seq("session_id"), "left_semi")
      .join(activeSubscribers.select(col("session_id")), Seq("session_id"), "left_anti")
      .filter(!col("is_unread"))
      .withColumn("is_unread", lit(true))
    Maintenance.upsert(sessions.toDF(), eligible, Seq("session_id"))
      .as[Session](sessions.encoder)
  }
}

final case class TranscriptStore(messages: Dataset[model.Message]) {
  import model.Message

  /** W3: last-N messages per session, returned in ascending order
    * (sessions/manager.py:343-345).
    */
  def tail(sessionId: String, n: Int): Dataset[Message] = {
    val w = Window.partitionBy("session_id").orderBy(col("timestamp").desc)
    messages.filter(col("session_id") === sessionId)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
      .orderBy("timestamp")
      .as[Message](messages.encoder)
  }

  /** P2/W4: history = all but the most recent message per session. */
  def historyWithoutLast(sessionId: String): Dataset[Message] = {
    val w = Window.partitionBy("session_id").orderBy(col("timestamp").desc)
    messages.filter(col("session_id") === sessionId)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .drop("__rn")
      .orderBy("timestamp")
      .as[Message](messages.encoder)
  }

  /** A9: per-session counters recomputed from the log (manager.py:286-291). */
  def metrics: DataFrame =
    messages.groupBy(col("session_id"))
      .agg(count(lit(1)).as("message_count"), sum(col("token_count")).as("token_usage"))
}

final case class AutomationStore(
    automations: Dataset[model.Automation],
    executions: Dataset[model.ExecutionRecord]) {

  /** F7: filtered listing. */
  def list(projectId: Option[String] = None, enabledOnly: Boolean = false): Dataset[model.Automation] = {
    val preds: Seq[Column] = Seq(
      projectId.map(col("project_id") === _),
      if (enabledOnly) Some(col("enabled")) else None).flatten
    preds.foldLeft(automations.toDF())((d, p) => d.filter(p)).as(automations.encoder)
  }

  /** J7/W5: each automation with its latest execution. */
  def withLatestExecution: DataFrame = {
    val w = Window.partitionBy("automation_id").orderBy(col("executed_at").desc, col("session_id").desc)
    val latest = executions.toDF()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("status", "last_status")
      .withColumnRenamed("executed_at", "last_executed_at")
    automations.toDF().join(latest, col("id") === col("automation_id"), "left")
      .drop("automation_id")
  }

  /** M6: duplicate (project, name) guard before insert. */
  def nameTaken(projectId: String, name: String)(implicit spark: SparkSession): Boolean = {
    import spark.implicits._
    Maintenance.existsByKey(
      automations.toDF(), Seq((projectId, name)).toDF("project_id", "name"),
      Seq("project_id", "name"))
  }

  /** F8: execution history, newest first with offset/limit pagination (O2). */
  def history(automationId: String, limit: Int, offset: Int = 0): Dataset[model.ExecutionRecord] = {
    // Partition by automation_id: post-filter there is exactly one partition value,
    // so results are unchanged, but the plan stays shardable if the filter is lifted
    // and Spark no longer warns about a partition-less window.
    val w = Window.partitionBy(col("automation_id"))
      .orderBy(col("executed_at").desc, col("session_id").desc)
    executions.filter(col("automation_id") === automationId)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset && col("__rn") <= offset + limit)
      .drop("__rn")
      .as(executions.encoder)
  }
}
