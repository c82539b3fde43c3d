package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.functions.ConfigFunctions
import graft.operators.ScaleJoins

/** Deep merge (M7), topo sort (G4), cron next-fire (C6), and the scale
  * join utilities (salting, bucketing).
  */
class ConfigScaleSpec extends SparkSpec {
  import spark.implicits._

  test("deep merge: nested override wins, lists replaced, disjoint keys union") {
    val base = """{"a":{"x":1,"y":[1,2],"z":{"k":"old"}},"b":2}"""
    val over = """{"a":{"y":[9],"z":{"k":"new","extra":true}},"c":3}"""
    val got  = ConfigFunctions.deepMergeJson(base, over)
    val n    = new com.fasterxml.jackson.databind.ObjectMapper().readTree(got)
    assert(n.at("/a/x").asInt == 1)                // kept from base
    assert(n.at("/a/y").toString == "[9]")          // list replaced, not merged
    assert(n.at("/a/z/k").asText == "new")          // nested override wins
    assert(n.at("/a/z/extra").asBoolean)            // nested addition
    assert(n.at("/b").asInt == 2 && n.at("/c").asInt == 3)
  }

  test("deep_merge UDF works over columns") {
    val df = Seq(("""{"a":1}""", """{"b":2}""")).toDF("base", "over")
    val out = df.select(ConfigFunctions.deep_merge($"base", $"over")).as[String].collect().head
    assert(out == """{"a":1,"b":2}""")
  }

  test("topo sort: dependency order, deterministic ties, cycle + unknown errors") {
    val ok = ConfigFunctions.topoSort(Map(
      "c" -> Seq("a", "b"), "b" -> Seq("a"), "a" -> Nil, "d" -> Nil))
    assert(ok == Right(Seq("a", "b", "c", "d"))) // smallest-ready-first Kahn
    assert(ConfigFunctions.topoSort(Map("a" -> Seq("b"), "b" -> Seq("a"))).isLeft)
    assert(ConfigFunctions.topoSort(Map("a" -> Seq("ghost"))).swap.exists(_.contains("unknown")))
  }

  test("cron next-fire: daily, steps, ranges, dow, invalid") {
    val after = Instant.parse("2026-08-12T10:30:00Z")
    assert(ConfigFunctions.cronNextFire("0 9 * * *", after)
      .contains(Instant.parse("2026-08-13T09:00:00Z")))
    assert(ConfigFunctions.cronNextFire("*/15 * * * *", after)
      .contains(Instant.parse("2026-08-12T10:45:00Z")))
    assert(ConfigFunctions.cronNextFire("0 0 1 1 *", after)
      .contains(Instant.parse("2027-01-01T00:00:00Z")))
    // 2026-08-12 is a Wednesday (dow 3); next Sunday is 2026-08-16
    assert(ConfigFunctions.cronNextFire("0 12 * * 0", after)
      .contains(Instant.parse("2026-08-16T12:00:00Z")))
    assert(ConfigFunctions.cronNextFire("not a cron", after).isEmpty)
    assert(ConfigFunctions.cronNextFire("0 9 * *", after).isEmpty) // 4 fields
  }

  test("cron next-fire: impossible dates return None fast (field-granular skipping)") {
    val after = Instant.parse("2026-08-12T10:30:00Z")
    val t0    = System.nanoTime()
    assert(ConfigFunctions.cronNextFire("29 2 30 2 *", after).isEmpty) // Feb 30 never exists
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 100, s"no-match scan took ${ms}ms — skipping regressed to minute stepping")
    // skipping preserves exact semantics across field boundaries
    assert(ConfigFunctions.cronNextFire("30 14 29 2 *", after) // next leap day
      .contains(Instant.parse("2028-02-29T14:30:00Z")))
    assert(ConfigFunctions.cronNextFire("59 23 31 12 *", after)
      .contains(Instant.parse("2026-12-31T23:59:00Z")))
    // dom/dow OR rule still honored: 2026-09-01 is a Tuesday (dow 2)
    assert(ConfigFunctions.cronNextFire("0 0 15 9 2", after)
      .contains(Instant.parse("2026-09-01T00:00:00Z")))
  }

  test("salted join matches plain join results on a skewed key") {
    val left  = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("key", "v")
    val right = Seq(("hot", 10), ("k901", 20)).toDF("key", "w")
    val plain  = left.join(right, Seq("key")).agg(sum($"v" * $"w")).first().getLong(0)
    val salted = ScaleJoins.saltedJoin(left, right, "key", col("v"), 8)
      .agg(sum($"v" * $"w")).first().getLong(0)
    assert(plain == salted)
  }

  test("salted join shuffles on (key, salt) so a hot key spreads over reducers") {
    val left  = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("key", "v")
    val right = Seq(("hot", 10), ("k901", 20)).toDF("key", "w")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.saltedJoin(left, right, "key", col("v"), 8)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(key[#\\d]*, __salt".r.findFirstIn(plan).isDefined,
        s"shuffle must key on (key, __salt):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bucketed join plans without an exchange on either side") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").format("parquet").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").format("parquet").saveAsTable("bk_b")
    // disable broadcast so the plan exercises the bucketed sort-merge path
    // (at real fact-fact scale neither side would broadcast anyway)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(spark, "bk_a", "bk_b", "k")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
