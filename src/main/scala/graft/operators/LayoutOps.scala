package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import graft.Q

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * standard lakehouse answer to "queries filter on EITHER of two keys":
  * interleave the bits of the rank-scaled dimensions and range-partition
  * by the interleaved value, so every output file covers a small 2-D tile
  * and its parquet min/max footer prunes on BOTH columns. A layout sorted
  * by one key alone prunes perfectly on it and not at all on the other;
  * at 100 TB the difference is reading one file vs every file.
  *
  * Everything here is exact integer arithmetic (rank-scale by measured
  * min/max, shift/mask interleave) — codegen'd column expressions, no UDF
  * — so DuckDB replays the tile assignment bit-for-bit and the x37 tile
  * stats are hash-checkable, while the write path (`clusterByZ`) is the
  * production seam spec-checked for per-file span bounds (LayoutSpec).
  *
  * Reference anchor: the reference stores JSONL per-entity and scans
  * directories (amplifierd file layout); its only layout lever is the
  * directory tree. Z-order is the columnar-era generalization the builder
  * brief's "would this survive 100x" test asks for.
  */
object LayoutOps {

  /** Interleave the low `bits` bits of each column (round-robin, col 0 at
    * bit 0): Morton code. Columns must already be non-negative and fit in
    * `bits` bits — pair with [[rankScale]]. Total bits must stay < 63.
    */
  def interleaveBits(xs: Seq[Column], bits: Int): Column = {
    require(xs.nonEmpty && bits * xs.size < 63, s"interleave of ${xs.size} x $bits bits")
    (0 until bits).flatMap { i =>
      xs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * xs.size + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** SQL `div` (integral divide) as a Column — `/` on Columns is double
    * division, whose 1-ulp rounding can cross an integer boundary and
    * break the exact-arithmetic contract with the oracle.
    */
  private def intDiv(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(a.cast("long")),
      GraftColumnBridge.expression(b.cast("long")),
      evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /** Scale `c` from its measured [minC, maxC] onto [0, 2^bits): integer
    * div, monotone, exact. The per-column min/max come from one 1-row
    * aggregate broadcast (the a9 crossJoin idiom) — one extra scan-agg at
    * write time, amortized over every pruned read after.
    *
    * Overflow precondition: the numerator is (c - minC) * 2^bits in Long
    * arithmetic, so (maxC - minC + 1) * 2^bits must stay < 2^63. The
    * `bits <= 31` bound guarantees that for any column whose range fits in
    * an Int (and 2^31 tiles is already far past useful zone-map
    * granularity); wider ranges still have 2^63 / range headroom.
    */
  def rankScale(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"rankScale bits=$bits outside (0, 31]")
    intDiv((c - minC) * (1L << bits), maxC - minC + 1L).cast("long")
  }

  /** The write-side verb: range-partition by the Morton code into
    * `numFiles` files, each internally sorted by it — every file is a
    * contiguous z-range = a bounded 2-D tile, and parquet's min/max
    * footers become a 2-D zone map. Pruning then happens for free in any
    * engine that reads the footers (Spark, DuckDB, Trino alike).
    */
  def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)

  /** The oracle-side SQL rendering of the same interleave. */
  private def interleaveSql(cols: Seq[String], bits: Int): String =
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"((($c >> $i) & 1) << ${i * cols.size + j})"
      }
    }.mkString("(", " + ", ")")

  val x37_zorder_tiles = Q(
    "x37_zorder_tiles",
    s"""WITH mm AS (
       |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
       |  FROM lineitem),
       |n AS (
       |  SELECT l_partkey, l_suppkey,
       |         ((l_partkey - pmin) * 256) // (pmax - pmin + 1) AS px,
       |         ((l_suppkey - smin) * 256) // (smax - smin + 1) AS sx
       |  FROM lineitem, mm),
       |z AS (
       |  SELECT l_partkey, l_suppkey,
       |         ${interleaveSql(Seq("px", "sx"), 8)} AS zval
       |  FROM n)
       |SELECT zval // 1024 AS tile, count(*) AS n_rows,
       |       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
  ) { t =>
    // Tile audit of the z-layout: 8 bits per dim, tile = top 3 bits of
    // each (an 8x8 grid). The oracle-checked min/max per tile ARE the
    // zone map the layout buys: every tile's part span AND supp span are
    // ~1/8 of their ranges (a partkey-sorted layout gets full supp range
    // in every file). The 1-row min/max frame broadcasts (crossJoin of an
    // aggregate — the a9 idiom); everything else is map-side integer math
    // plus one 64-key aggregate.
    val li = t.lineitem.select("l_partkey", "l_suppkey")
    val mm = li.agg(
      min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
      min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
    val scaled = li.crossJoin(broadcast(mm))
      .withColumn("px", rankScale(col("l_partkey"), col("pmin"), col("pmax"), 8))
      .withColumn("sx", rankScale(col("l_suppkey"), col("smin"), col("smax"), 8))
    scaled
      .withColumn("zval", interleaveBits(Seq(col("px"), col("sx")), 8))
      .withColumn("tile", intDiv(col("zval"), lit(1024L)).cast("long"))
      .groupBy("tile")
      .agg(
        count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("tile")
  }

  val all: Seq[Q] = Seq(x37_zorder_tiles)
}
