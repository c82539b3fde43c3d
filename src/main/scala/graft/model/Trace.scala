package graft.model

/** Trace view models mirroring the reference's execution-trace output
  * (reference: amplifierd/amplifierd/models/trace.py:15-56). `arguments`
  * stays a raw JSON string — tool inputs are arbitrarily nested and schema-
  * free, exactly like the reference's `dict[str, Any]`.
  *
  * Deviation from the reference (documented): ids are deterministic
  * (`<session>:t<idx>` / parallel-group ids) instead of uuid4, so golden
  * tests and re-runs are stable. The reference only needs uniqueness.
  */
final case class TraceTool(
    id: String = "",
    name: String = "",
    parallelGroupId: String = "",
    status: String = "starting",
    startTime: Long = 0L,
    endTime: Option[Long] = None,
    duration: Option[Double] = None,
    arguments: Option[String] = None,
    result: Option[String] = None,
    error: Option[String] = None,
    isSubAgent: Boolean = false,
    subAgentName: Option[String] = None,
    childSessionId: Option[String] = None,
)

final case class TraceThinking(
    id: String = "",
    content: String = "",
    timestamp: Long = 0L,
)

final case class TraceTurn(
    id: String = "",
    sessionId: String = "",
    userMessage: String = "",
    status: String = "active",
    startTime: Long = 0L,
    endTime: Option[Long] = None,
    tools: Seq[TraceTool] = Seq.empty,
    thinking: Seq[TraceThinking] = Seq.empty,
)

/** One raw line of a session event log (events.jsonl), pre-parsed just far
  * enough to drive the sessionizer: `data` is the raw JSON payload string.
  * `lineNo` preserves file position — the reference's implicit order — as
  * the tiebreaker for equal timestamps (SURVEY §7.4).
  */
final case class RawEvent(
    sessionId: String,
    ts: String,
    event: String,
    data: String,
    lineNo: Long,
)
