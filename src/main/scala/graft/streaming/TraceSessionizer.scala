package graft.streaming

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{RawEvent, TraceThinking, TraceTool, TraceTurn}

/** The reference's turn state machine (SURVEY W1/ST6; reference:
  * amplifierd/amplifierd/services/trace_aggregator.py:56-211) as one pure
  * function shared by the batch and streaming paths — the edge semantics
  * must be bit-exact in both (SURVEY §7.4):
  *
  *   - `prompt:submit` opens a turn; an already-open turn is force-closed
  *     as `completed` with no endTime (trace_aggregator.py:100-103).
  *   - `tool:pre` appends a `running` tool (`:112-132`); lowercase name
  *     "task" marks a sub-agent and captures `tool_input.agent`.
  *   - `tool:post` matches the FIRST open tool with the same
  *     (tool_name, parallel_group_id) and status in {starting, running}
  *     (`:134-155`); computes duration only when startTime is nonzero;
  *     dict results route success→result / failure→error with 1000-char
  *     truncation (`:157-179`); unmatched posts are dropped (`:180-183`).
  *   - `thinking:delta` appends to the open turn (`:185-192`).
  *   - `session:end` completes the open turn with endTime (`:194-199`).
  *   - EOF with an open turn emits it still `active` (`:201-204`).
  *   - Events before any `prompt:submit` are dropped (every handler guards
  *     on `current_turn is not None`).
  *
  * Scale: the state is one open turn per session — bounded by turn width,
  * not log length. Batch groups shuffle once on session_id; streaming holds
  * the same state in the state store via flatMapGroupsWithState.
  */
object TraceSessionizer {

  private val mapper = new ObjectMapper()

  /** How many idle windows an eviction tombstone (which preserves turn
    * numbering for resumed sessions) survives before its state is dropped.
    */
  val TombstoneGraceFactor = 10L

  /** ISO-8601 (tz-aware) -> epoch ms; malformed -> 0
    * (reference: trace_aggregator.py:24-38, naive stamps read as UTC).
    */
  def parseTimestampMs(ts: String): Long =
    try {
      java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli
    } catch {
      case _: Exception =>
        try {
          java.time.LocalDateTime.parse(ts).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        } catch { case _: Exception => 0L }
    }

  /** `text[:1000] + "... (truncated)"` (reference: trace_aggregator.py:41-53). */
  def truncate(text: String, maxLength: Int = 1000): String =
    if (text.length <= maxLength) text else text.substring(0, maxLength) + "... (truncated)"

  private def str(n: JsonNode, field: String, default: String = ""): String = {
    val v = n.get(field)
    if (v == null || v.isNull) default
    else if (v.isTextual) v.asText()
    else v.toString // non-string payloads render as compact JSON
  }

  private def parseData(data: String): JsonNode =
    try {
      val n = mapper.readTree(if (data == null) "" else data)
      if (n == null || !n.isObject) mapper.createObjectNode() else n
    } catch { case _: Exception => mapper.createObjectNode() }

  /** The extracted-field view of one event payload — every field the state
    * machine reads (the reference's access surface,
    * trace_aggregator.py:94-199: `data["prompt"]`, `data["tool_name"]`,
    * `data["parallel_group_id"]`, `data["tool_input"]`,
    * `data["result"]{success, output, error.message}`, `data["delta"]`).
    * `step` consumes ONLY this view, so the state machine has exactly one
    * definition with two front-ends: [[fieldsOf]] (Jackson over the raw
    * JSON string — the byte-exact historical path the golden tests pin)
    * and the scan-side shredded-VARIANT projection (st6_variant_turns),
    * where each of these fields arrives as a typed column extracted at the
    * parquet scan and NO per-event JSON parse happens anywhere.
    */
  final case class EventFields(
      prompt: String = "",
      toolName: String = "",
      groupId: String = "",
      toolInputJson: Option[String] = None,
      subAgentName: Option[String] = None,
      resultIsObject: Boolean = false,
      resultRaw: String = "",
      resultSuccess: Boolean = true,
      resultOutput: String = "",
      resultErrorMsg: String = "{}",
      childSessionId: Option[String] = None,
      delta: String = "",
  )

  /** Jackson front-end: raw JSON payload string -> [[EventFields]],
    * preserving every historical edge semantic (non-object results render
    * raw, a failure result's missing error node reads as "{}", non-string
    * error payloads render as compact JSON — a documented deviation from
    * Python's str(dict) repr; quotes/spacing differ, content identical).
    */
  def fieldsOf(dataJson: String): EventFields = {
    val data  = parseData(dataJson)
    val name  = str(data, "tool_name")
    val input = data.get("tool_input")
    val isSub = name.toLowerCase == "task"
    val result = data.get("result")
    val resultIsObject = result != null && result.isObject
    val (success, output, errMsg, childId) =
      if (resultIsObject) {
        val childId =
          if (isSub && result.has("output") && result.get("output").isObject &&
            result.get("output").has("session_id"))
            Some(str(result.get("output"), "session_id"))
          else None
        val success = !result.has("success") || result.get("success").asBoolean(true)
        val err = result.get("error")
        val msg =
          if (err == null || err.isNull) "{}"
          else if (err.isObject && err.has("message")) str(err, "message")
          else if (err.isTextual) err.asText()
          else err.toString
        (success, str(result, "output"), msg, childId)
      } else (true, "", "{}", None)
    EventFields(
      prompt = str(data, "prompt"),
      toolName = name,
      groupId = str(data, "parallel_group_id"),
      toolInputJson = Option(input).filter(n => n != null && !n.isNull).map(_.toString),
      subAgentName =
        if (isSub && input != null && input.isObject && input.has("agent"))
          Some(str(input, "agent"))
        else None,
      resultIsObject = resultIsObject,
      resultRaw =
        if (result == null || result.isNull) ""
        else if (result.isTextual) result.asText()
        else result.toString,
      resultSuccess = success,
      resultOutput = output,
      resultErrorMsg = errMsg,
      childSessionId = childId,
      delta = str(data, "delta"))
  }

  /** Mutable per-session state: the currently open turn, if any. */
  final case class OpenTurn(
      var turn: TraceTurn,
      tools: ArrayBuffer[TraceTool],
      thinking: ArrayBuffer[TraceThinking],
  ) {
    def closed(status: String, endTime: Option[Long]): TraceTurn =
      turn.copy(status = status, endTime = endTime, tools = tools.toSeq, thinking = thinking.toSeq)
  }

  /** Feed one event through the state machine. Returns (completed turn if
    * one closed, new open state). Pure aside from buffer mutation inside
    * the passed state. Delegates to [[stepFields]] after one Jackson parse
    * of the payload — the only place the string path touches JSON.
    */
  def step(
      state: Option[OpenTurn],
      e: RawEvent,
      turnIndex: Int,
  ): (Option[TraceTurn], Option[OpenTurn], Int) =
    stepFields(state, e.sessionId, parseTimestampMs(e.ts), e.event, e.lineNo,
      fieldsOf(e.data), turnIndex)

  /** The state machine proper, over the extracted-field view — shared
    * verbatim by the string path ([[step]]) and the shredded-VARIANT path
    * (st6_variant_turns / aggregateTyped), so the two renderings cannot
    * drift: there is one transition function and the front-ends differ
    * only in WHERE the payload fields were extracted (per-event Jackson
    * parse vs typed columns read off the parquet scan).
    */
  def stepFields(
      state: Option[OpenTurn],
      sessionId: String,
      ms: Long,
      event: String,
      lineNo: Long,
      f: EventFields,
      turnIndex: Int,
  ): (Option[TraceTurn], Option[OpenTurn], Int) = {
    event match {
      case "prompt:submit" =>
        // force-close any unclosed turn (completed, no endTime)
        val flushed = state.map(_.closed("completed", None))
        val opened = OpenTurn(
          TraceTurn(
            id = s"$sessionId:t$turnIndex",
            sessionId = sessionId,
            userMessage = f.prompt,
            status = "active",
            startTime = ms),
          ArrayBuffer.empty,
          ArrayBuffer.empty)
        (flushed, Some(opened), turnIndex + 1)

      case "tool:pre" if state.isDefined =>
        state.get.tools += TraceTool(
          id = if (f.groupId.nonEmpty) f.groupId else s"$sessionId:l$lineNo",
          name = f.toolName,
          parallelGroupId = f.groupId,
          status = "running",
          startTime = ms,
          arguments = f.toolInputJson,
          isSubAgent = f.toolName.toLowerCase == "task",
          subAgentName = f.subAgentName)
        (None, state, turnIndex)

      case "tool:post" if state.isDefined =>
        val tools = state.get.tools
        val idx = tools.indexWhere(t =>
          t.name == f.toolName && t.parallelGroupId == f.groupId &&
            (t.status == "starting" || t.status == "running"))
        if (idx >= 0) {
          val t       = tools(idx)
          val endTime = ms
          val dur     = if (t.startTime != 0) Some((endTime - t.startTime).toDouble) else None
          val updated =
            if (f.resultIsObject) {
              val childId = if (t.isSubAgent) f.childSessionId else None
              if (f.resultSuccess)
                t.copy(
                  status = "completed", endTime = Some(endTime), duration = dur,
                  childSessionId = childId,
                  result = Some(truncate(f.resultOutput)))
              else
                t.copy(
                  status = "error", endTime = Some(endTime), duration = dur,
                  childSessionId = childId, error = Some(truncate(f.resultErrorMsg)))
            } else
              t.copy(status = "completed", endTime = Some(endTime), duration = dur,
                result = Some(truncate(f.resultRaw)))
          tools.update(idx, updated)
        } // else: unmatched post, dropped (reference logs at debug)
        (None, state, turnIndex)

      case "thinking:delta" if state.isDefined =>
        state.get.thinking += TraceThinking(
          id = s"$sessionId:l$lineNo",
          content = f.delta,
          timestamp = ms)
        (None, state, turnIndex)

      case "session:end" if state.isDefined =>
        val done = state.get.closed("completed", Some(ms))
        (Some(done), None, turnIndex)

      case _ => (None, state, turnIndex) // unknown types / events before first turn
    }
  }

  /** Pure batch assembly over one session's ordered events — the exact
    * reference loop including the EOF flush of an active turn.
    */
  def assemble(events: Iterator[RawEvent]): Seq[TraceTurn] = {
    val out                    = ArrayBuffer.empty[TraceTurn]
    var state: Option[OpenTurn] = None
    var idx                    = 0
    events.foreach { e =>
      val (done, next, nextIdx) = step(state, e, idx)
      done.foreach(out += _)
      state = next
      idx = nextIdx
    }
    state.foreach(out += _.closed("active", None)) // EOF: still in progress
    out.toSeq
  }

  /** Batch sessionization: one shuffle on session_id, in-memory sort of each
    * session's events by lineNo — the reference processes a session's JSONL
    * strictly in FILE order (trace_aggregator.py reads line by line), so
    * lineNo alone is the correct order key; sorting by parsed timestamp
    * first would hoist malformed-timestamp events (parsed as 0) to the
    * front. A session's log is bounded (one conversation), so the per-group
    * sort is safe at any table scale.
    */
  def aggregate(events: Dataset[RawEvent])(implicit spark: SparkSession): Dataset[TraceTurn] = {
    import spark.implicits._
    events
      .groupByKey(_.sessionId)
      .flatMapGroups { (_, it) =>
        val sorted = it.toArray.sortBy(_.lineNo)
        assemble(sorted.iterator)
      }
  }

  /** One pre-extracted event for the parse-free sessionizer path: the
    * payload arrives as typed COLUMNS (each an [[EventFields]] member the
    * state machine reads), not as a JSON string. Built by a scan-side
    * projection over a shredded-VARIANT event table, where
    * `pushVariantIntoScan` has rewritten every extraction into a struct
    * column read — so between parquet and the state machine NO JSON text
    * exists at all. `ms` is the already-parsed timestamp for the same
    * reason. The contract narrows `data` to the reference's documented
    * payload shape (`result` is a dict when present; sub-agent fields ride
    * `tool_input`) — heterogeneous/adversarial payloads stay on the
    * string path, and TraceSessionizerSpec asserts the two paths agree on
    * the trace family's event stream.
    */
  final case class TypedEvent(
      sessionId: String,
      ms: Long,
      event: String,
      lineNo: Long,
      prompt: String = "",
      toolName: String = "",
      groupId: String = "",
      subAgentName: Option[String] = None,
      hasResult: Boolean = false,
      resultSuccess: Boolean = true,
      resultOutput: String = "",
      resultErrorMsg: String = "{}",
      delta: String = "",
  ) {
    def fields: EventFields = EventFields(
      prompt = prompt, toolName = toolName, groupId = groupId,
      toolInputJson = None, subAgentName = subAgentName,
      resultIsObject = hasResult, resultRaw = "",
      resultSuccess = resultSuccess, resultOutput = resultOutput,
      resultErrorMsg = resultErrorMsg, childSessionId = None, delta = delta)
  }

  /** [[assemble]] over pre-extracted events — same loop, same EOF flush,
    * zero parses.
    */
  def assembleTyped(events: Iterator[TypedEvent]): Seq[TraceTurn] = {
    val out                     = ArrayBuffer.empty[TraceTurn]
    var state: Option[OpenTurn] = None
    var idx                     = 0
    events.foreach { e =>
      val (done, next, nextIdx) = stepFields(state, e.sessionId, e.ms, e.event, e.lineNo, e.fields, idx)
      done.foreach(out += _)
      state = next
      idx = nextIdx
    }
    state.foreach(out += _.closed("active", None)) // EOF: still in progress
    out.toSeq
  }

  /** [[aggregate]] for the parse-free path: identical shuffle/sort/state
    * machine, consuming [[TypedEvent]]s whose payload fields were
    * extracted once at the parquet scan.
    */
  def aggregateTyped(events: Dataset[TypedEvent])(implicit spark: SparkSession): Dataset[TraceTurn] = {
    import spark.implicits._
    events
      .groupByKey(_.sessionId)
      .flatMapGroups { (_, it) =>
        val sorted = it.toArray.sortBy(_.lineNo)
        assembleTyped(sorted.iterator)
      }
  }

  /** Per-session streaming state: serialized open turn + next turn index.
    * `tombstoned` marks state already granted its numbering-preservation
    * grace window — only such state may be dropped on expiry. Without the
    * flag, a session whose last turn completed normally (open=None via the
    * event branch) is indistinguishable from a spent tombstone and would be
    * removed on its FIRST idle expiry, restarting `<session>:tN` numbering
    * for a resume after just one idle window.
    *
    * STATE SCHEMA v2: adding `tombstoned` changed the
    * flatMapGroupsWithState state encoder schema, so a stream restarted
    * from a checkpoint written before this field existed fails Spark's
    * state-schema compatibility check — start a fresh checkpoint directory
    * when upgrading across it (pre-release break, called out in the docs
    * per round-4 ADVICE).
    */
  final case class SessionState(
      open: Option[TraceTurn],
      openTools: Seq[TraceTool],
      openThinking: Seq[TraceThinking],
      nextIndex: Int,
      tombstoned: Boolean = false,
  )

  /** Live sessionizer (SURVEY ST6): the same state machine inside
    * flatMapGroupsWithState. Completed turns are emitted per micro-batch
    * (Append mode); the open turn persists in the state store. The
    * reference has no watermark (it rescans the file per query); here the
    * state is bounded to one open turn per session. With `idleTimeoutMs`
    * set, sessions quiet for that long flush their open turn as `active`
    * and evict their state — the M4 idle-runner eviction (1h default in
    * the reference) made a state-store TTL.
    */
  def aggregateStream(
      events: Dataset[RawEvent],
      idleTimeoutMs: Option[Long] = None,
      tombstoneTtlMs: Option[Long] = None,
  )(implicit spark: SparkSession): Dataset[TraceTurn] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.sessionId)
      .flatMapGroupsWithState[SessionState, TraceTurn](OutputMode.Append(), timeoutConf) {
        (_: String, batch: Iterator[RawEvent], gs: GroupState[SessionState]) =>
          if (gs.hasTimedOut) {
            val prior = gs.get
            if (prior.open.isEmpty && prior.tombstoned) {
              // second, quiet expiry: the tombstone already protected turn
              // numbering for one grace period and the session never spoke
              // again — drop the state entirely. Without this, every session
              // ever seen would keep store state forever (unbounded growth
              // in a long-running stream).
              gs.remove()
              Iterator.empty
            } else {
              // idle eviction: surface the in-progress turn (if any), keep a
              // tombstone carrying nextIndex (open=None, a few bytes) so a
              // session that resumes soon after eviction continues turn
              // numbering and ids `<session>:tN` stay unique. Completed-turn
              // state (open=None, not yet tombstoned) gets the SAME grace
              // window — its nextIndex is equally load-bearing. The tombstone
              // re-arms a longer timeout (TombstoneGraceFactor x idle) and
              // is removed on its own expiry; a session resuming after
              // idle + grace windows restarts numbering at 0 — documented
              // trade for bounded state.
              val flushed = prior.open.map(t =>
                t.copy(status = "active", tools = prior.openTools, thinking = prior.openThinking))
              gs.update(SessionState(None, Nil, Nil, prior.nextIndex, tombstoned = true))
              idleTimeoutMs.foreach(ms =>
                gs.setTimeoutDuration(tombstoneTtlMs.getOrElse(ms * TombstoneGraceFactor)))
              flushed.iterator
            }
          } else {
            val prior = gs.getOption.getOrElse(SessionState(None, Nil, Nil, 0))
            var state: Option[OpenTurn] = prior.open.map { t =>
              OpenTurn(t, ArrayBuffer.from(prior.openTools), ArrayBuffer.from(prior.openThinking))
            }
            var idx = prior.nextIndex
            val out = ArrayBuffer.empty[TraceTurn]
            batch.toArray.sortBy(_.lineNo).foreach { e =>
              val (done, next, nextIdx) = step(state, e, idx)
              done.foreach(out += _)
              state = next
              idx = nextIdx
            }
            gs.update(SessionState(state.map(_.turn), state.map(_.tools.toSeq).getOrElse(Nil),
              state.map(_.thinking.toSeq).getOrElse(Nil), idx))
            idleTimeoutMs.foreach(gs.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
