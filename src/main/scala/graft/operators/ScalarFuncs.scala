package graft.operators

import org.apache.spark.sql.functions._
import graft.Q

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

  val all: Seq[Q] = Seq(
    c2_content_hash, c3_truncate_marker, c4_time_format, c5_interval_parse,
    c9_string_surgery, c11_json_access,
  )
}
