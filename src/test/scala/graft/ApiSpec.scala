package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.{AutomationStore, SessionStore, TranscriptStore, model}

/** Facade API over synthesized reference-shaped fixtures (FIXTURES B3/B4):
  * a 3-level session tree + orphan, unread rows across 2 dirs, automations
  * with execution history.
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")

  private lazy val sessions = Seq(
    model.Session("root1", Some("r1"), None, "proj/a", "completed", ts(1), Some(ts(2)), "default", 4, Some(100), is_unread = true),
    model.Session("root1-00_helper", None, Some("root1"), "proj/a", "completed", ts(3), Some(ts(3)), "helper", 2, Some(10), is_unread = false),
    model.Session("root1-00_helper-01_sub", None, Some("root1-00_helper"), "proj/a", "failed", ts(4), None, "helper", 1, None, is_unread = false),
    model.Session("root2", None, None, "proj/b", "active", ts(5), None, "default", 0, None, is_unread = true),
    model.Session("orphan1", None, Some("ghost"), "proj/b", "created", ts(6), None, "default", 0, None, is_unread = true),
  ).toDS()

  private lazy val store = SessionStore(sessions)

  test("list: conjunctive filters + desc sort + limit (§3.1 lifecycle)") {
    val got = store.list(status = Some("completed"), amplifiedDir = Some("proj/a")).collect()
    assert(got.map(_.session_id).toSeq == Seq("root1-00_helper", "root1"))
    assert(store.list(since = Some(ts(5))).collect().map(_.session_id).toSet == Set("root2", "orphan1"))
    assert(store.list(limit = 2).collect().length == 2)
  }

  test("unreadCounts groups per project dir (A1 minimum slice)") {
    val got = store.unreadCounts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("proj/a" -> 1L, "proj/b" -> 2L))
  }

  test("recentWithChildren: children nested under roots, sorted by latest activity") {
    val rows = store.recentWithChildren().collect()
    val ids  = rows.map(_.getAs[String]("session_id")).toSeq
    // root1's latest child activity (day 4) < root2 (day 5) < orphan... orphan has a parent -> not a root
    assert(ids == Seq("root2", "root1"))
    val root1 = rows.find(_.getAs[String]("session_id") == "root1").get
    assert(root1.getSeq[org.apache.spark.sql.Row](root1.fieldIndex("children")).map(_.getString(1)) ==
      Seq("root1-00_helper")) // only direct children, newest first
  }

  test("orphans finds the dangling parent reference (J2)") {
    assert(store.orphans.select("session_id").as[String].collect().toSeq == Seq("orphan1"))
  }

  test("cascadeDeleteIds walks the transitive tree (G3)") {
    val ids = store.cascadeDeleteIds("root1").select("node").as[String].collect().toSet
    assert(ids == Set("root1", "root1-00_helper", "root1-00_helper-01_sub"))
  }

  test("retentionSurvivors: old+unprotected dropped, active kept regardless of age (M3/F10)") {
    val survivors = store.retentionSurvivors(ts(5), Seq("active")).collect().map(_.session_id).toSet
    // cutoff day5: root1 (ended day2) and helper (day3) + sub (created day4) drop; root2 active kept; orphan created day6 kept
    assert(survivors == Set("root2", "orphan1"))
  }

  test("cloneSubtree remaps ids and parent links across the whole tree (G2)") {
    val clones = store.cloneSubtree("root1", "c1").collect().sortBy(_.session_id)
    assert(clones.map(_.session_id).toSeq == Seq(
      "root1-00_helper-01_sub_c1", "root1-00_helper_c1", "root1_c1"))
    val byId = clones.map(s => s.session_id -> s.parent_session_id).toMap
    assert(byId("root1_c1").isEmpty) // root keeps its (absent) parent
    assert(byId("root1-00_helper_c1").contains("root1_c1"))
    assert(byId("root1-00_helper-01_sub_c1").contains("root1-00_helper_c1"))
  }

  test("markUnreadIfUnobserved: only observed/already-unread sessions are skipped (ST7)") {
    import org.apache.spark.sql.functions.col
    val completed   = Seq("root1-00_helper", "root1-00_helper-01_sub", "root2").toDF("session_id")
    val subscribers = Seq("root1-00_helper").toDF("session_id")
    val after = store.markUnreadIfUnobserved(completed, subscribers)
      .collect().map(s => s.session_id -> s.is_unread).toMap
    assert(!after("root1-00_helper"))          // active subscriber -> untouched
    assert(after("root1-00_helper-01_sub"))    // unobserved + was read -> flipped
    assert(after("root2"))                     // already unread -> unchanged
    assert(after.size == 5)                    // untouched rows survive the upsert
  }

  test("transcript tail + history-without-last (W3/W4)") {
    val msgs = Seq(
      model.Message("s", ts(1), "user", "m1", None, Some(1)),
      model.Message("s", ts(2), "assistant", "m2", None, Some(2)),
      model.Message("s", ts(3), "user", "m3", None, Some(3)),
      model.Message("other", ts(4), "user", "x", None, None),
    ).toDS()
    val t = TranscriptStore(msgs)
    assert(t.tail("s", 2).collect().map(_.content).toSeq == Seq("m2", "m3"))
    assert(t.historyWithoutLast("s").collect().map(_.content).toSeq == Seq("m1", "m2"))
    val m = t.metrics.collect().map(r => r.getString(0) -> (r.getLong(1), r.get(2))).toMap
    assert(m("s")._1 == 3L)
  }

  test("automations: latest execution join, duplicate guard, paged history (J7/M6/O2)") {
    val autos = Seq(
      model.Automation("a1", "p1", "daily", "cron", "0 9 * * *", enabled = true),
      model.Automation("a2", "p1", "hourly", "interval", "1h", enabled = false),
    ).toDS()
    val execs = Seq(
      model.ExecutionRecord("a1", "auto_1", ts(1), "success", None),
      model.ExecutionRecord("a1", "auto_2", ts(3), "failed", Some("boom")),
      model.ExecutionRecord("a1", "auto_3", ts(2), "success", None),
    ).toDS()
    val s = AutomationStore(autos, execs)

    assert(s.list(enabledOnly = true).collect().map(_.id).toSeq == Seq("a1"))
    val latest = s.withLatestExecution.collect().map(r =>
      r.getAs[String]("id") -> Option(r.getAs[String]("last_status"))).toMap
    assert(latest("a1").contains("failed")) // newest by executed_at wins
    assert(latest("a2").isEmpty)            // left join keeps execution-less rows
    assert(s.nameTaken("p1", "daily"))
    assert(!s.nameTaken("p1", "nope"))
    assert(s.history("a1", limit = 2).collect().map(_.session_id).toSeq == Seq("auto_2", "auto_3"))
    assert(s.history("a1", limit = 2, offset = 2).collect().map(_.session_id).toSeq == Seq("auto_1"))
  }
}
