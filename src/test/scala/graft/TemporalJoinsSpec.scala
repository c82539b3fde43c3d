package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.StreamOps

/** Semantics + plan shape for the temporal join operators. The driver
  * oracle (x32 vs DuckDB's native ASOF JOIN, x33 vs its IEJoin range
  * predicate, x34 vs its window SQL) pins testdata behavior; these pin the
  * EDGES testdata never hits — equal-ts inclusivity, tie-breaking,
  * intervals longer than the grid width — and the one-shuffle plan
  * contracts the scaladocs promise.
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.collect()
    // AQE's toString prints the final plan AND the pre-adaptive initial
    // plan; exchange COUNTS must only see the plan that actually ran.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  // ---- as-of join semantics ------------------------------------------------

  private def lefts(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "event_id", "ms")
  private def rights(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "event_id", "ms")

  test("asOfJoin: latest at-or-before match, inclusive at equal ts, null when none") {
    val l = lefts((1L, 100L, 50L), (1L, 101L, 10L), (2L, 200L, 99L))
    val r = rights((1L, 900L, 20L), (1L, 901L, 50L), (3L, 902L, 1L))
    val out = TemporalJoins.asOfJoin(l, r, "user_id", "ms", "event_id")
      .select($"event_id", $"matched.event_id".as("m"))
      .as[(Long, Option[Long])].collect().toMap
    // left@50 matches right@50 (inclusive), not right@20
    assert(out(100L) === Some(901L))
    // left@10 predates every right for the key -> null
    assert(out(101L) === None)
    // key 2 has no rights at all -> null (key 3's rights invisible)
    assert(out(200L) === None)
  }

  test("asOfJoin: equal (key, ts) rights tie-break to the greatest tiebreak") {
    val l = lefts((1L, 100L, 50L))
    val r = rights((1L, 900L, 50L), (1L, 950L, 50L), (1L, 925L, 50L))
    val out = TemporalJoins.asOfJoin(l, r, "user_id", "ms", "event_id")
      .select($"matched.event_id").as[Long].collect()
    assert(out.toSeq === Seq(950L))
  }

  test("asOfJoin plan: one hash exchange, a window, and no join operator") {
    // The scalable rendering's whole point: point-in-time match WITHOUT a
    // range join. The plan must be union -> ONE shuffle on the key ->
    // sort -> running window; any Join operator or second hash exchange
    // means the rendering regressed to the theta-join it exists to avoid.
    val e = Tables(spark, sf0001).events
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
        $"event_type")
    val p = plan(TemporalJoins.asOfJoin(
      e.filter($"event_type" === "purchase").drop("event_type"),
      e.filter($"event_type" === "click").drop("event_type"),
      "user_id", "ms", "event_id"))
    assert(p.split("Exchange hashpartitioning").length - 1 === 1,
      s"expected exactly one hash exchange:\n$p")
    assert(p.contains("Window"), s"expected the running window:\n$p")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
  }

  // ---- bucketed range join -------------------------------------------------

  test("bucketedRangeJoin equals the naive range join, including intervals spanning many cells") {
    // width 10 << interval lengths: the sequence() explosion must cover
    // every cell an interval touches, and because a point maps to exactly
    // one cell, each qualifying pair must appear exactly once (count
    // equality catches both misses and duplicates).
    val pts = Seq((1L, 1L, 5L), (1L, 2L, 17L), (1L, 3L, 42L), (2L, 4L, 17L))
      .toDF("k", "pid", "ms")
    val ivs = Seq((1L, 10L, 0L, 45L), (1L, 11L, 17L, 18L), (2L, 12L, 20L, 30L))
      .toDF("k", "iid", "start_ms", "end_ms")
    val bucketed = TemporalJoins.bucketedRangeJoin(
      pts, ivs, "k", "ms", "start_ms", "end_ms", widthMs = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, Seq("k"))
      .filter($"ms" >= $"start_ms" && $"ms" < $"end_ms")
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(naive.length === naive.toSet.size)
    assert(bucketed === naive.toSet)
    assert(bucketed === Set((1L, 10L), (2L, 10L), (3L, 10L), (2L, 11L)))
  }

  test("x33 plan: the range join runs as a keyed equi-join, never nested-loop") {
    val p = plan(TemporalJoins.x33_range_join.run(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range predicate must not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    assert(p.contains("Join"), s"expected the (key, cell) equi-join:\n$p")
  }

  // ---- scd2 ----------------------------------------------------------------

  test("scd2: runs collapse, validity chains are contiguous, last row current") {
    val e = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "a", 20L), (1L, 3L, "b", 30L),
      (1L, 4L, "a", 40L), (2L, 5L, "x", 5L))
      .toDF("user_id", "event_id", "state", "ms")
    val out = TemporalJoins.scd2(e, "user_id", "state", "ms", "event_id")
      .orderBy("user_id", "valid_from_ms")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 10L, Some(30L), false),  // the 20L repeat collapsed
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "x", 5L, None, true)))
  }

  test("scd2Merge equals from-scratch rebuild, batch-boundary collapse included") {
    // key 1: batch opens with the SAME state the dim is current in -> the
    // boundary rows must collapse to one version (the merge's hardest
    // edge). key 2: untouched by the batch. key 3: new key only in batch.
    val old = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L), (2L, 3L, "x", 15L))
      .toDF("user_id", "event_id", "state", "ms")
    val batch = Seq(
      (1L, 4L, "b", 30L), (1L, 5L, "c", 40L), (3L, 6L, "z", 35L))
      .toDF("user_id", "event_id", "state", "ms")
    val dim = TemporalJoins.versionedScd2(old, "user_id", "state", "ms", "event_id")
    val merged = TemporalJoins.scd2Merge(dim, batch, "user_id", "state", "ms", "event_id")
      .drop("version_id")
    val rebuilt = TemporalJoins.scd2(old.unionByName(batch), "user_id", "state", "ms", "event_id")
    val m = merged.orderBy("user_id", "valid_from_ms")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(m === rebuilt.orderBy("user_id", "valid_from_ms")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq)
    // the boundary collapse happened: key 1 has versions a,b,c - not a,b,b,c
    assert(m.filter(_._1 == 1L).map(_._2) === Seq("a", "b", "c"))
    // untouched key 2 passed through with its original open row
    assert(m.filter(_._1 == 2L) === Seq((2L, "x", 15L, None, true)))
  }

  test("scd2Merge plan: untouched dimension rows bypass the window entirely") {
    // The merge's scale contract: only affected keys replay through the
    // windows; the untouched branch is an anti-join feeding the final
    // union directly. With the window above the union the merge would
    // re-window the whole dimension and the incremental path would be
    // pointless - so the Union must sit ABOVE the Window in the plan.
    val e = Tables(spark, sf0001).events
      .select($"user_id", $"event_id", $"event_type".as("state"),
        unix_millis($"ts").as("ms"))
    val dim = TemporalJoins.versionedScd2(
      e.filter($"ms" < 1706140800000L), "user_id", "state", "ms", "event_id")
    val p = plan(TemporalJoins.scd2Merge(
      dim, e.filter($"ms" >= 1706140800000L), "user_id", "state", "ms", "event_id"))
    val unionAt  = p.indexOf("Union")
    val windowAt = p.indexOf("Window")
    assert(unionAt >= 0 && windowAt >= 0 && unionAt < windowAt,
      s"untouched rows must not pass through the window:\n$p")
  }

  test("scd2 plan: both windows ride one exchange") {
    // lag (change detection) and lead (validity horizon) both partition on
    // the key: the second window must reuse the first's exchange, or the
    // build pays a pointless second shuffle at every scale.
    val e = Tables(spark, sf0001).events
      .select($"user_id", $"event_id", $"event_type".as("state"),
        unix_millis($"ts").as("ms"))
    val p = plan(TemporalJoins.scd2(e, "user_id", "state", "ms", "event_id"))
    assert(p.split("Exchange hashpartitioning").length - 1 === 1,
      s"expected exactly one hash exchange:\n$p")
  }

  // ---- randomized brute-force equivalence (seeded, deterministic) ----------

  test("asOfJoin equals brute force over randomized keyed streams (seeded)") {
    // duplicate-heavy ts space (15 values across 6 keys) exercises the
    // equal-ts inclusive match and the tiebreak ordering far harder than
    // the pinned edge cases can
    val rng = new scala.util.Random(421)
    (1 to 4).foreach { round =>
      val left  = (1 to 60).map(i => (rng.nextInt(6).toLong, rng.nextInt(15).toLong, (1000 + i).toLong))
      val right = (1 to 50).map(i => (rng.nextInt(6).toLong, rng.nextInt(15).toLong, (2000 + i).toLong))
      val out = TemporalJoins.asOfJoin(
          left.toDF("k", "ms", "event_id"), right.toDF("k", "ms", "event_id"),
          key = "k", ts = "ms", tiebreak = "event_id")
        .select($"event_id", $"matched.event_id")
        .as[(Long, Option[Long])].collect().toMap
      left.foreach { case (k, ms, id) =>
        val expect = right.filter(r => r._1 == k && r._2 <= ms)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(out(id) == expect, s"round $round, left row $id (k=$k, ms=$ms)")
      }
    }
  }

  test("bucketedRangeJoin equals brute force over randomized intervals (seeded)") {
    // interval lengths 1..25 across widths 3/7/10: cells-per-interval from
    // 1 to ~9, boundary-inclusive starts, exclusive ends
    val rng = new scala.util.Random(77)
    Seq(3L, 7L, 10L).foreach { width =>
      val pts = (1 to 80).map(i => (rng.nextInt(5).toLong, rng.nextInt(60).toLong, (100 + i).toLong))
      val ivs = (1 to 40).map { i =>
        val s = rng.nextInt(60).toLong
        (rng.nextInt(5).toLong, s, s + 1 + rng.nextInt(25), (500 + i).toLong)
      }
      val out = TemporalJoins.bucketedRangeJoin(
          pts.toDF("k", "ms", "pid"), ivs.toDF("k", "start_ms", "end_ms", "iid"),
          key = "k", ptMs = "ms", startMs = "start_ms", endMs = "end_ms", widthMs = width)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      val expect = (for {
        (pk, ms, pid) <- pts; (ik, s, e, iid) <- ivs
        if pk == ik && ms >= s && ms < e
      } yield (pid, iid)).toSet
      assert(out.length == expect.size, s"width $width: duplicate or missing pairs")
      assert(out.toSet == expect, s"width $width")
    }
  }

  // ---- x38: SCD2 serving composition --------------------------------------

  test("scd2Serve drops zero-length versions, leaving (key, valid_from) unique") {
    // three changes inside one ms: the first two versions are zero-length
    // and must not be servable (an as-of bind at that ms must see the LAST)
    val e = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 10L), (1L, 3L, "c", 10L),
      (1L, 4L, "d", 20L))
      .toDF("user_id", "event_id", "state", "ms")
    val out = TemporalJoins.scd2Serve(e, "user_id", "state", "ms", "event_id")
      .orderBy("valid_from_ms")
      .select("state", "valid_from_ms").as[(String, Long)].collect().toSeq
    assert(out === Seq(("c", 10L), ("d", 20L)))
  }

  test("streaming pointInTimeLookup agrees with the batch as-of bind (x38 semantics)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Tables(spark, sf0001).events
      .select($"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms"))
    val dim = TemporalJoins.scd2Serve(
      e.filter($"event_type" =!= "purchase")
        .select($"user_id", $"event_id", $"event_type".as("state"), $"ms"),
      "user_id", "state", "ms", "event_id")
    val facts = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ms")
      .as[(Long, Long, Long)].collect().toSeq
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.pointInTimeLookup(
        input.toDS().toDF("user_id", "event_id", "ms"), dim, "user_id", "ms")
      .select($"user_id", $"event_id", $"state", $"valid_from_ms")
      .writeStream.format("memory").queryName("pit_out").outputMode("append").start()
    try {
      val (a, b) = facts.splitAt(facts.size / 3)
      Seq(a, b).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0), "lookup must keep no state")
      val streamed = spark.table("pit_out")
        .as[(Long, Long, Option[String], Option[Long])].collect().toSet
      val batch = TemporalJoins.x38_scd2_serve.run(spark, sf0001)
        .select($"user_id", $"p_event_id", $"dim_state", $"dim_from_ms")
        .as[(Long, Long, Option[String], Option[Long])].collect().toSet
      assert(streamed.size == batch.size && streamed == batch,
        s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
    } finally q.stop()
  }

  test("x38 plan: dimension build + as-of bind, all keyed shuffles, no range join") {
    val p = plan(TemporalJoins.x38_scd2_serve.run(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"the as-of bind must be the union+window, not a join:\n$p")
    // exactly two hash exchanges — the dimension build's window shuffle on
    // user_id and the as-of union's on __k (user_id renamed); the only
    // other exchange is the presentation sort's range partitioning
    val keyedEx = "Exchange hashpartitioning\\((user_id|__k)".r.findAllIn(p).size
    val allHashEx = p.split("Exchange hashpartitioning").length - 1
    assert(allHashEx == 2 && keyedEx == allHashEx,
      s"expected 2 keyed shuffles on the user key ($keyedEx of $allHashEx):\n$p")
  }
}
