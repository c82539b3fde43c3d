package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFunctions

/** Scalar-function layer (SURVEY.md §2.8): hashing, truncation, timestamp
  * formatting, interval parsing, string surgery, JSON access — each C-row
  * exercised as an oracle-checked query over the test tables. All are pure
  * per-row expressions: they stay inside whole-stage codegen and add no
  * shuffle beyond the final presentation ORDER BY.
  */
object ScalarFuncs {

  val c2_content_hash = Q(
    "c2_content_hash",
    """SELECT doc_id, sha256(text) AS content_hash,
      |       substring(sha256(source || '/' || CAST(doc_id AS VARCHAR)), 1, 8) AS ref_key
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C2: SHA-256 content addressing (content_deduplicator.py:78-88)
    // + 8-hex-prefix cache keys (ref_resolution.py:384-400). Spark sha2 and
    // DuckDB sha256 both emit lowercase hex.
    t.documents
      .select(
        col("doc_id"),
        sha2(col("text"), 256).as("content_hash"),
        substring(sha2(concat(col("source"), lit("/"), col("doc_id").cast("string")), 256), 1, 8)
          .as("ref_key"))
      .orderBy("doc_id")
  }

  val c3_truncate_marker = Q(
    "c3_truncate_marker",
    """SELECT doc_id,
      |       CASE WHEN length(text) > 100
      |            THEN substring(text, 1, 100) || '... (truncated)'
      |            ELSE text END AS preview,
      |       length(text) > 100 AS was_truncated
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C3: payload truncation with marker (trace_aggregator.py:41-53).
    // Applied before any exchange in real pipelines — bounds shuffle width.
    t.documents
      .select(
        col("doc_id"),
        when(
          length(col("text")) > 100,
          concat(substring(col("text"), 1, 100), lit("... (truncated)")))
          .otherwise(col("text"))
          .as("preview"),
        (length(col("text")) > 100).as("was_truncated"))
      .orderBy("doc_id")
  }

  val c4_time_format = Q(
    "c4_time_format",
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin,
  ) { t =>
    // SURVEY C4: timestamp formatting in the session timezone (UTC)
    // (automation_scheduler.py:360-369).
    t.orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n"))
      .orderBy("order_month")
  }

  val c5_interval_parse = Q(
    "c5_interval_parse",
    """SELECT interval_str,
      |       CAST(regexp_extract(interval_str, '^([0-9]+)([smhd])$', 1) AS BIGINT)
      |       * CASE regexp_extract(interval_str, '^([0-9]+)([smhd])$', 2)
      |           WHEN 's' THEN 1 WHEN 'm' THEN 60 WHEN 'h' THEN 3600 ELSE 86400 END AS seconds,
      |       count(*) AS n
      |FROM (SELECT CAST(p_size AS VARCHAR)
      |             || CASE p_size % 4 WHEN 0 THEN 's' WHEN 1 THEN 'm' WHEN 2 THEN 'h' ELSE 'd' END
      |             AS interval_str FROM part)
      |GROUP BY 1, 2 ORDER BY interval_str""".stripMargin,
  ) { t =>
    // SURVEY C5: "30m"/"2h"/"1d" interval parsing (automation_scheduler.py:
    // 286-318). Interval strings synthesized deterministically from p_size.
    val istr = concat(
      col("p_size").cast("string"),
      when(col("p_size") % 4 === 0, "s")
        .when(col("p_size") % 4 === 1, "m")
        .when(col("p_size") % 4 === 2, "h")
        .otherwise("d"))
    val num  = regexp_extract(col("interval_str"), "^([0-9]+)([smhd])$", 1).cast("long")
    val unit = regexp_extract(col("interval_str"), "^([0-9]+)([smhd])$", 2)
    val secs = num * when(unit === "s", 1L).when(unit === "m", 60L)
      .when(unit === "h", 3600L).otherwise(86400L)
    t.part
      .select(istr.as("interval_str"))
      .select(col("interval_str"), secs.as("seconds"))
      .groupBy("interval_str", "seconds")
      .agg(count(lit(1)).as("n"))
      .orderBy("interval_str")
  }

  val c9_string_surgery = Q(
    "c9_string_surgery",
    """SELECT c_custkey,
      |       split_part(c_name, '#', 1) AS name_prefix,
      |       CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_number,
      |       substring(c_name, length(c_name) - 2, 3) AS name_tail
      |FROM customer ORDER BY c_custkey""".stripMargin,
  ) { t =>
    // SURVEY C9: split/strip/suffix string surgery (mentions.py:100-104,
    // ref_resolution.py:103-115). substring_index == split_part here.
    t.customer
      .select(
        col("c_custkey"),
        substring_index(col("c_name"), "#", 1).as("name_prefix"),
        substring_index(col("c_name"), "#", -1).cast("long").as("name_number"),
        substring(col("c_name"), -3, 3).as("name_tail"))
      .orderBy("c_custkey")
  }

  val c11_json_access = Q(
    "c11_json_access",
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { t =>
    // SURVEY C11: dynamic JSON field extraction — event.data.tool_name
    // style access (trace_aggregator.py:94-96) over the props JSON column.
    t.events
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val c1_mentions = Q(
    "c1_mentions",
    """WITH src AS (
      |  SELECT doc_id,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'ping @alice and @"bob file.md" ok'
      |      WHEN 1 THEN 'code `@nope` then @u' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN 'email a@b.com and @mention plus @real'
      |      WHEN 3 THEN 'say "quoted @hidden" then @vis'
      |      WHEN 4 THEN 'plain ''single @gone'' and @kept'
      |      ELSE 'no mentions here'
      |    END AS text
      |  FROM documents),
      |steps AS (
      |  SELECT doc_id, regexp_replace(text, '`[^`\n]+`', '', 'g') AS no_code FROM src),
      |parts AS (
      |  SELECT doc_id,
      |    regexp_extract_all(no_code, '(^|[^a-zA-Z0-9])@"([^"]+)"', 2) AS quoted,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(no_code, '(^|[^a-zA-Z0-9])@"[^"]+"', '\1', 'g'),
      |        '"[^"\n]*"', '', 'g'),
      |      '''[^''\n]*''', '', 'g') AS cleaned
      |  FROM steps),
      |lists AS (
      |  SELECT doc_id,
      |    list_transform(
      |      list_concat(
      |        quoted,
      |        list_filter(regexp_extract_all(cleaned, '(^|[^a-zA-Z0-9])@([a-zA-Z0-9_\-/\.:]+)', 2),
      |                    x -> x <> 'mention' AND x <> '')),
      |      x -> '@' || x) AS mentions
      |  FROM parts)
      |SELECT doc_id,
      |       unnest(generate_series(1, len(mentions))) AS pos,
      |       unnest(mentions) AS mention
      |FROM lists ORDER BY doc_id, pos""".stripMargin,
  ) { t =>
    // SURVEY C1: the reference's @mention grammar (mentions.py:15-76) run
    // through the REAL parse_mentions UDF over a synthesized corpus that
    // exercises every grammar rule: inline-code stripping, quoted mentions,
    // quoted-string shadowing, the word-boundary guard (a@b.com is not a
    // mention), and the "@mention" literal exclusion. The oracle is the
    // RE2-compatible decomposition (lookbehind replaced by a consumed
    // boundary group) — equivalent on this corpus; mentions separated by a
    // single boundary char that the previous match already consumed (e.g.
    // '@a.@b') would diverge and are deliberately absent (the golden +
    // property specs in TextFunctionsSpec cover the full grammar).
    val text = when(col("doc_id") % 6 === 0, lit("ping @alice and @\"bob file.md\" ok"))
      .when(col("doc_id") % 6 === 1, concat(lit("code `@nope` then @u"), col("doc_id").cast("string")))
      .when(col("doc_id") % 6 === 2, lit("email a@b.com and @mention plus @real"))
      .when(col("doc_id") % 6 === 3, lit("say \"quoted @hidden\" then @vis"))
      .when(col("doc_id") % 6 === 4, lit("plain 'single @gone' and @kept"))
      .otherwise(lit("no mentions here"))
    t.documents
      .select(col("doc_id"), text.as("text"))
      .select(col("doc_id"), posexplode(TextFunctions.parse_mentions(col("text"))).as(Seq("pos0", "mention")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("mention"))
      .orderBy("doc_id", "pos")
  }

  val c7_path_ops = Q(
    "c7_path_ops",
    """SELECT doc_id, path,
      |       parts[len(parts)] AS base,
      |       array_to_string(parts[1:len(parts)-1], '/') AS parent,
      |       CAST(len(parts) AS BIGINT) AS depth
      |FROM (SELECT doc_id, path, string_split(path, '/') AS parts
      |      FROM (SELECT doc_id,
      |                   '/data/' || lang || '/' || source || '/doc' || CAST(doc_id AS VARCHAR) || '.txt' AS path
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C7: basename / parent / depth path functions (treeUtils.ts:
    // 23-49, directories.py:71-74) over paths synthesized from document
    // columns — pure split/slice expressions, no UDF.
    val path = concat(
      lit("/data/"), col("lang"), lit("/"), col("source"),
      lit("/doc"), col("doc_id").cast("string"), lit(".txt"))
    t.documents
      .select(col("doc_id"), path.as("path"))
      .select(
        col("doc_id"), col("path"),
        TextFunctions.pathBasename(col("path")).as("base"),
        TextFunctions.pathParent(col("path")).as("parent"),
        TextFunctions.pathDepth(col("path")).cast("long").as("depth"))
      .orderBy("doc_id")
  }

  val c10_url_normalize = Q(
    "c10_url_normalize",
    """SELECT doc_id, url,
      |  CASE doc_id % 5
      |    WHEN 0 THEN 'http://example.com/path'
      |    WHEN 1 THEN 'https://host.io/a?a=1&b=2'
      |    WHEN 2 THEN 'http://site.org:8080/x' || CAST(doc_id AS VARCHAR)
      |    WHEN 3 THEN 'https://plain.net'
      |    ELSE 'not a url'
      |  END AS normalized
      |FROM (SELECT doc_id,
      |  CASE doc_id % 5
      |    WHEN 0 THEN 'HTTP://Example.COM:80/path/'
      |    WHEN 1 THEN 'https://Host.io:443/a?b=2&a=1'
      |    WHEN 2 THEN 'http://site.org:8080/x' || CAST(doc_id AS VARCHAR) || '/'
      |    WHEN 3 THEN 'https://plain.net'
      |    ELSE 'not a url'
      |  END AS url FROM documents) ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C10: URL normalization (ref_resolution.py:402-424) through the
    // REAL normalize_url UDF: scheme/host lowercasing, default-port strip,
    // trailing-slash strip, query-param sort, parse-failure passthrough.
    // The oracle states the expected normal form per synthesized variant.
    val url = when(col("doc_id") % 5 === 0, lit("HTTP://Example.COM:80/path/"))
      .when(col("doc_id") % 5 === 1, lit("https://Host.io:443/a?b=2&a=1"))
      .when(col("doc_id") % 5 === 2, concat(lit("http://site.org:8080/x"), col("doc_id").cast("string"), lit("/")))
      .when(col("doc_id") % 5 === 3, lit("https://plain.net"))
      .otherwise(lit("not a url"))
    t.documents
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"), TextFunctions.normalize_url(col("url")).as("normalized"))
      .orderBy("doc_id")
  }

  val c15_short_ids = Q(
    "c15_short_ids",
    """SELECT doc_id, 'doc_' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS short_id
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C15: 8-hex short ids (routers/sessions.py:307-309) — the
    // deterministic content-derived variant (documented deviation: the
    // reference uses uuid4; replayable pipelines need stable ids).
    t.documents
      .select(col("doc_id"), TextFunctions.shortId("doc", col("doc_id")).as("short_id"))
      .orderBy("doc_id")
  }

  val c6_cron_shape = Q(
    "c6_cron_shape",
    """SELECT doc_id, cron,
      |       len(regexp_split_to_array(trim(cron), '\s+')) IN (5, 6) AS valid
      |FROM (SELECT doc_id,
      |  CASE doc_id % 4
      |    WHEN 0 THEN '0 9 * * *'
      |    WHEN 1 THEN '*/5 0 1 1 0 2026'
      |    WHEN 2 THEN '0 9 * *'
      |    ELSE ''
      |  END AS cron FROM documents) ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY C6 (data-plane form): cron shape validation
    // (models/automations.py:41-45) — 5/6 whitespace-separated fields.
    // Next-fire computation stays a driver-side utility (ConfigFunctions.
    // cronNextFire, spec'd); the shape gate is what runs over rows.
    import graft.functions.TextFunctions
    val cron = when(col("doc_id") % 4 === 0, lit("0 9 * * *"))
      .when(col("doc_id") % 4 === 1, lit("*/5 0 1 1 0 2026"))
      .when(col("doc_id") % 4 === 2, lit("0 9 * *"))
      .otherwise(lit(""))
    t.documents
      .select(col("doc_id"), cron.as("cron"))
      .select(col("doc_id"), col("cron"), TextFunctions.isValidCronShape(col("cron")).as("valid"))
      .orderBy("doc_id")
  }

  val m7_deep_merge = Q(
    "m7_deep_merge",
    """SELECT doc_id,
      |       CAST(doc_id % 5 AS VARCHAR) AS a_x,
      |       CAST(doc_id % 3 AS VARCHAR) AS a_y0,
      |       'true' AS a_z,
      |       'b' || CAST(doc_id AS VARCHAR) AS keep,
      |       CAST(doc_id % 7 AS VARCHAR) AS extra
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY M7 (data-plane form): recursive config merge through the REAL
    // deep_merge UDF (profile_compilation.py:511-554) over synthesized
    // nested JSON: base keys survive under merged objects (a.x), lists are
    // REPLACED not concatenated (a.y), nested additions land (a.z), and
    // top-level keys union (keep/extra). The oracle states the expected
    // field values; fields are extracted rather than comparing whole
    // strings so JSON formatting stays out of the contract.
    import graft.functions.ConfigFunctions
    val base = concat(
      lit("{\"a\": {\"x\": "), col("doc_id") % 5,
      lit(", \"y\": [1, 2]}, \"keep\": \"b"), col("doc_id"), lit("\"}"))
    val over = concat(
      lit("{\"a\": {\"y\": ["), col("doc_id") % 3,
      lit("], \"z\": true}, \"extra\": "), col("doc_id") % 7, lit("}"))
    t.documents
      .select(col("doc_id"), ConfigFunctions.deep_merge(base, over).as("m"))
      .select(
        col("doc_id"),
        get_json_object(col("m"), "$.a.x").as("a_x"),
        get_json_object(col("m"), "$.a.y[0]").as("a_y0"),
        get_json_object(col("m"), "$.a.z").as("a_z"),
        get_json_object(col("m"), "$.keep").as("keep"),
        get_json_object(col("m"), "$.extra").as("extra"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    c2_content_hash, c3_truncate_marker, c4_time_format, c5_interval_parse,
    c9_string_surgery, c11_json_access,
    c1_mentions, c7_path_ops, c10_url_normalize, c15_short_ids,
    c6_cron_shape, m7_deep_merge,
  )
}
