package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** ANALYZE-style column profiling — the stats pass every lakehouse runs
  * before it can plan anything else: per-column null counts, exact
  * distinct cardinality, and min/max. The same numbers drive file-skipping
  * (min/max zone maps — see LayoutOps), broadcast-vs-shuffle join choice
  * (distinct counts), and data-quality drift alerts (null-rate deltas).
  *
  * Shape: UNPIVOT the profiled columns to (column_name, value) rows —
  * a map-side projection expansion, NO shuffle until the aggregate — then
  * one groupBy on column_name. Cell values cross the exchange only for the
  * exact-distinct count (partial-deduped map-side on (column_name, value)
  * first, so the shuffle carries each distinct cell once per partition,
  * not each row). At 100 TB where even that is too much, swap
  * count_distinct for approx_count_distinct (HLL, constant-size partials —
  * the x39 trade) without touching the rest of the plan; the oracle pins
  * the exact variant.
  *
  * Numeric and string-ish columns profile through separate typed unpivots
  * (min/max must compare in the column's own type — a string min over
  * stringified doubles would order "9" > "10"), then union: numerics carry
  * (min_d, max_d), strings/dates carry (min_s, max_s).
  */
object Profiling {

  /** One-pass profile of `df`: numCols as doubles, strCols as strings
    * (cast first for dates/timestamps). Output one row per column:
    * (column_name, n_rows, n_null, n_distinct, min_d, max_d, min_s, max_s).
    */
  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    val numRows = df
      .select(numCols.map(c => col(c).cast("double").as(c)): _*)
      .unpivot(Array.empty[Column], numCols.map(col).toArray, "column_name", "vnum")
      .withColumn("vstr", lit(null).cast("string"))
    val strRows = df
      .select(strCols.map(c => col(c).cast("string").as(c)): _*)
      .unpivot(Array.empty[Column], strCols.map(col).toArray, "column_name", "vstr")
      .withColumn("vnum", lit(null).cast("double"))
    // Two-stage aggregate instead of count_distinct-alongside-plain-aggs:
    // the mixed form makes Catalyst plan an Expand (every cell row
    // duplicated into a distinct-branch and a plain-branch), doubling the
    // rows through the exchange. Grouping by (column_name, value) first
    // gives the same numbers from the per-value partials — n_rows =
    // sum(cnt), null count = the null group's cnt, distinct = count of
    // non-null groups, min/max over group KEYS — with map-side combine
    // collapsing each partition's repeats, so the shuffle carries each
    // distinct cell once per partition and no Expand runs (measured at
    // sf0.1: 3.2 s -> ~1 s median).
    numRows
      .select("column_name", "vnum", "vstr")
      .unionByName(strRows.select("column_name", "vnum", "vstr"))
      .groupBy("column_name", "vnum", "vstr")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("column_name")
      .agg(
        sum("cnt").as("n_rows"),
        sum(when(col("vnum").isNull && col("vstr").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(when(col("vnum").isNotNull || col("vstr").isNotNull, lit(1))).as("n_distinct"),
        min("vnum").as("min_d"),
        max("vnum").as("max_d"),
        min("vstr").as("min_s"),
        max("vstr").as("max_s"))
      .orderBy("column_name")
  }

  val x45_profile = Q(
    "x45_profile",
    Seq(
      ("o_orderkey", true), ("o_custkey", true), ("o_totalprice", true),
      ("o_orderstatus", false), ("o_orderpriority", false), ("o_orderdate", false),
    ).map { case (c, isNum) =>
      val expr   = if (c == "o_orderdate") "CAST(o_orderdate AS VARCHAR)" else c
      val minMax =
        if (isNum) s"CAST(min($c) AS DOUBLE) AS min_d, CAST(max($c) AS DOUBLE) AS max_d, CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s"
        else s"CAST(NULL AS DOUBLE) AS min_d, CAST(NULL AS DOUBLE) AS max_d, min($expr) AS min_s, max($expr) AS max_s"
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct, $minMax
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
  ) { t =>
    // Full profile of the orders table; the oracle recomputes each row as
    // an independent per-column aggregate and must agree cell-for-cell.
    profile(
      t.orders,
      numCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      strCols = Seq("o_orderstatus", "o_orderpriority", "o_orderdate"))
  }

  /** Pairwise Pearson correlations in ONE pass from order-independent
    * exact sums — built-in corr() accumulates doubles, whose partial-
    * aggregation order flaps across engines/partitionings (the a12
    * lesson, applied to the covariance accumulators). Every input is
    * integer cents; sums and cross-product sums run in DECIMAL (the
    * price-squared sum overflows int64 around 1e5 rows of 1e7-cent
    * values — HUGEINT on the DuckDB side), so any engine derives the
    * IDENTICAL nine moments, and the closed-form correlation is then one
    * deterministic double expression per pair.
    *
    * Scale: a single map-side-combined aggregate (9 accumulators), one
    * exchange row per partition. The pair list is quadratic in COLUMNS,
    * never in rows — the standard one-pass correlation-matrix shape.
    */
  def correlationCents(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def cents(c: String): Column =
      round(col(c) * 100).cast(DecimalType(18, 0))
    val moments =
      cols.map(c => sum(cents(c)).cast(DoubleType).as(s"s_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(cents(a) * cents(b)).cast(DoubleType).as(s"s_${a}_$b")
        } ++
        cols.map(c => sum(cents(c) * cents(c)).cast(DoubleType).as(s"s_${c}_$c"))
    val s = df.agg(count(lit(1)).cast(DoubleType).as("n"), moments: _*)
    // All pair correlations come out of the ONE moments row in a single
    // projection, unpivoted with explode — a per-pair select unioned
    // together would re-execute the full-scan aggregate once per pair
    // (quadratic in columns) unless exchange reuse happened to kick in.
    val pairStructs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      struct(
        lit(s"$a|$b").as("pair"),
        round(
          (col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
            (sqrt(col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a")) *
              sqrt(col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b"))), 6)
          .as("r"))
    }
    s.select(explode(array(pairStructs: _*)).as("pr"))
      .select(col("pr.pair").as("pair"), col("pr.r").as("r"))
      .orderBy("pair")
  }

  val x62_correlation = Q(
    "x62_correlation",
    """WITH s AS (
      |  SELECT count(*) AS n,
      |    CAST(SUM(CAST(round(l_quantity     * 100) AS HUGEINT)) AS DOUBLE) AS sq,
      |    CAST(SUM(CAST(round(l_extendedprice* 100) AS HUGEINT)) AS DOUBLE) AS sp,
      |    CAST(SUM(CAST(round(l_discount     * 100) AS HUGEINT)) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(round(l_quantity     * 100) AS HUGEINT) * CAST(round(l_quantity     * 100) AS HUGEINT)) AS DOUBLE) AS sqq,
      |    CAST(SUM(CAST(round(l_extendedprice* 100) AS HUGEINT) * CAST(round(l_extendedprice* 100) AS HUGEINT)) AS DOUBLE) AS spp,
      |    CAST(SUM(CAST(round(l_discount     * 100) AS HUGEINT) * CAST(round(l_discount     * 100) AS HUGEINT)) AS DOUBLE) AS sdd,
      |    CAST(SUM(CAST(round(l_quantity     * 100) AS HUGEINT) * CAST(round(l_extendedprice* 100) AS HUGEINT)) AS DOUBLE) AS sqp,
      |    CAST(SUM(CAST(round(l_quantity     * 100) AS HUGEINT) * CAST(round(l_discount     * 100) AS HUGEINT)) AS DOUBLE) AS sqd,
      |    CAST(SUM(CAST(round(l_extendedprice* 100) AS HUGEINT) * CAST(round(l_discount     * 100) AS HUGEINT)) AS DOUBLE) AS spd
      |  FROM lineitem)
      |SELECT 'l_quantity|l_extendedprice' AS pair,
      |       round((n*sqp - sq*sp) / (sqrt(n*sqq - sq*sq) * sqrt(n*spp - sp*sp)), 6) AS r FROM s
      |UNION ALL
      |SELECT 'l_quantity|l_discount', round((n*sqd - sq*sd) / (sqrt(n*sqq - sq*sq) * sqrt(n*sdd - sd*sd)), 6) FROM s
      |UNION ALL
      |SELECT 'l_extendedprice|l_discount', round((n*spd - sp*sd) / (sqrt(n*spp - sp*sp) * sqrt(n*sdd - sd*sd)), 6) FROM s
      |ORDER BY pair""".stripMargin,
  ) { t =>
    correlationCents(t.lineitem, Seq("l_quantity", "l_extendedprice", "l_discount"))
  }

  /** Shannon entropy per categorical column — the drift/imbalance scalar
    * (a collapsing language mix or a runaway source shows up as an
    * entropy drop before any single rate alarm fires). Algebraic form
    * H = ln(n) - sum(c ln c)/n works from the per-value COUNTS alone:
    * one (column, value) aggregate with map-side combine — the same
    * shuffle shape as x45 — then a tiny per-column reduction; counts are
    * exact integers, the double ln/sum runs over |values| rows and is
    * rounded to 6dp.
    */
  def entropyByColumn(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.groupBy(lit(c).as("column_name"), col(c).as("v"))
        .agg(count(lit(1)).as("c"))
    }
      .reduce(_ unionByName _)
      .groupBy("column_name")
      .agg(
        count(lit(1)).as("n_distinct"),
        round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 6)
          .as("entropy_nats"))
      .orderBy("column_name")

  val x64_entropy = Q(
    "x64_entropy",
    """WITH c AS (
      |  SELECT 'lang' AS column_name, lang AS v, count(*) AS c FROM documents GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'source', source, count(*) FROM documents GROUP BY 1, 2)
      |SELECT column_name, CAST(count(*) AS BIGINT) AS n_distinct,
      |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy_nats
      |FROM c GROUP BY column_name ORDER BY column_name""".stripMargin,
  ) { t =>
    entropyByColumn(t.documents, Seq("lang", "source"))
  }

  val all: Seq[Q] = Seq(x45_profile, x62_correlation, x64_entropy)
}
