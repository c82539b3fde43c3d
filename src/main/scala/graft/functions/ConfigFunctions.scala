package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Config-document operators (SURVEY M7/G4/C6): deep merge of nested
  * config JSON, dependency topo-sort, cron next-fire. These mirror the
  * reference's profile-compilation layer; merge is exposed as a UDF for
  * data-plane use (generic StructType merge is not expressible with
  * built-ins — SURVEY §2.12), topo-sort/cron are driver-side utilities
  * (config-sized inputs, orchestration concerns).
  */
object ConfigFunctions {

  private val mapper = new ObjectMapper()

  /** Recursive dict merge with override-wins, lists REPLACED not
    * concatenated (reference: profile_compilation.py:511-554).
    */
  def deepMergeNodes(base: JsonNode, override_ : JsonNode): JsonNode =
    if (base != null && base.isObject && override_ != null && override_.isObject) {
      val out = base.deepCopy[ObjectNode]()
      val names = override_.fieldNames()
      while (names.hasNext) {
        val k = names.next()
        out.set(k, deepMergeNodes(out.get(k), override_.get(k)))
      }
      out
    } else if (override_ == null) base
    else override_

  def deepMergeJson(base: String, override_ : String): String =
    try mapper.writeValueAsString(
      deepMergeNodes(mapper.readTree(base), mapper.readTree(override_)))
    catch { case _: Exception => override_ }

  /** UDF form: (base_json, override_json) -> merged_json. */
  val deep_merge: UserDefinedFunction = udf((a: String, b: String) => deepMergeJson(a, b))

  /** G4: Kahn topological sort with deterministic tie-breaking (lexical),
    * cycle -> Left("cycle: ..."), unknown dependency -> Left("unknown: ...")
    * (reference: profile_compilation.py:297-368).
    */
  def topoSort(deps: Map[String, Seq[String]]): Either[String, Seq[String]] = {
    val unknown = deps.values.flatten.toSet -- deps.keySet
    if (unknown.nonEmpty) return Left(s"unknown dependency: ${unknown.toSeq.sorted.mkString(",")}")
    var inDeg   = deps.map { case (k, v) => k -> v.size }
    val rdeps   = deps.toSeq.flatMap { case (k, vs) => vs.map(_ -> k) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out     = scala.collection.mutable.ArrayBuffer.empty[String]
    var ready   = inDeg.collect { case (k, 0) => k }.toSeq.sorted
    while (ready.nonEmpty) {
      val n = ready.head
      ready = ready.tail
      out += n
      rdeps.getOrElse(n, Nil).foreach { m =>
        inDeg = inDeg.updated(m, inDeg(m) - 1)
        if (inDeg(m) == 0) ready = (ready :+ m).sorted
      }
    }
    if (out.size == deps.size) Right(out.toSeq)
    else Left(s"cycle involving: ${(deps.keySet -- out.toSet).toSeq.sorted.mkString(",")}")
  }

  /** C6: next fire time of a 5-field cron (min hour dom mon dow) strictly
    * after `after`, UTC. Supports star, star-slash-n steps, a-b ranges,
    * comma lists; dow 0=Sunday (7 normalized to 0); dom/dow combine with OR
    * when both are restricted (standard cron semantics). Returns None for
    * invalid expressions or no match within 4 years.
    */
  def cronNextFire(expr: String, after: java.time.Instant): Option[java.time.Instant] = {
    def parseField(f: String, lo: Int, hi: Int): Option[Set[Int]] = {
      def one(part: String): Option[Seq[Int]] = {
        val stepSplit = part.split("/", 2)
        val (rangePart, step) = (stepSplit(0),
          if (stepSplit.length == 2) stepSplit(1).toIntOption.getOrElse(return None) else 1)
        if (step < 1) return None
        val range: Option[Seq[Int]] = rangePart match {
          case "*" => Some(lo to hi)
          case r if r.contains("-") =>
            val ab = r.split("-", 2)
            for (a <- ab(0).toIntOption; b <- ab(1).toIntOption if a <= b) yield a to b
          case n => n.toIntOption.map(v => Seq(v))
        }
        range.map(_.filter(v => v >= lo && v <= hi).grouped(1).flatten.toSeq)
          .map(vs => vs.zipWithIndex.collect { case (v, i) if i % step == 0 => v })
      }
      val parts = f.split(",").toSeq.map(one)
      if (parts.exists(_.isEmpty)) None else Some(parts.flatMap(_.get).toSet)
    }
    val fields = expr.trim.split("\\s+")
    if (fields.length != 5) return None
    val spec = for {
      mins  <- parseField(fields(0), 0, 59)
      hours <- parseField(fields(1), 0, 23)
      doms  <- parseField(fields(2), 1, 31)
      mons  <- parseField(fields(3), 1, 12)
      dows  <- parseField(fields(4), 0, 7).map(_.map(_ % 7)) // 7 == Sunday == 0
    } yield (mins, hours, doms, mons, dows)
    spec.flatMap { case (mins, hours, doms, mons, dows) =>
      val domAny = fields(2) == "*"
      val dowAny = fields(4) == "*"
      var t = java.time.ZonedDateTime
        .ofInstant(after, java.time.ZoneOffset.UTC)
        .plusMinutes(1).withSecond(0).withNano(0)
      val limit = t.plusYears(4)
      var found: Option[java.time.Instant] = None
      // Field-granular skipping instead of +1-minute stepping: a failed
      // month check jumps to the 1st of the next month, a failed day check
      // to the next midnight, a failed hour to the next o'clock — each
      // coarser condition depends only on its own field, so no candidate is
      // skipped. Bounds the no-match worst case (e.g. "29 2 30 2 *",
      // Feb 30) to ~hundreds of steps instead of ~2M.
      while (found.isEmpty && t.isBefore(limit)) {
        val dow     = t.getDayOfWeek.getValue % 7 // java Mon=1..Sun=7 -> Sun=0
        lazy val dayHits =
          if (domAny && dowAny) true
          else if (domAny) dows(dow)
          else if (dowAny) doms(t.getDayOfMonth)
          else doms(t.getDayOfMonth) || dows(dow)
        if (!mons(t.getMonthValue))
          t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
        else if (!dayHits)
          t = t.plusDays(1).withHour(0).withMinute(0)
        else if (!hours(t.getHour))
          t = t.plusHours(1).withMinute(0)
        else if (!mins(t.getMinute))
          t = t.plusMinutes(1)
        else
          found = Some(t.toInstant)
      }
      found
    }
  }
}
