package graft

import graft.operators.Extras

/** x61b — the approx_percentile rendering of winsorization — pinned against
  * the exact x61 row (the x11 pattern: sketches have no cross-engine oracle,
  * so the spec bounds the approx-vs-exact gap instead).
  *
  * The KLL-ish sketch at accuracy 10000 guarantees rank error <= n/10000;
  * at sf0.001 (~6k lineitem rows per flag) that is sub-row, so thresholds
  * should land on (or adjacent to) the exact interpolated percentile and the
  * clamped tail counts should drift by at most the rank-error bound.
  */
class WinsorizeApproxSpec extends SparkSpec {

  test("x61b thresholds track x61 exact percentiles within the sketch's rank-error bound") {
    val exact  = Extras.x61_winsorize.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Extras.x61b_winsorize_approx.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap

    assert(exact.keySet == approx.keySet, "same group keys")
    // group sizes, for the rank-error budget
    val sizes = Tables(spark, sf0001).lineitem
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // The sketch's guarantee is in RANK space (error <= n/accuracy rows),
    // not value space — near the tails adjacent order statistics can sit
    // far apart in value, so the right assertion is "the approx threshold's
    // rank is within budget of the target quantile's rank".
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val li = Tables(spark, sf0001).lineitem

    exact.keys.foreach { rf =>
      val (e, a) = (exact(rf), approx(rf))
      val n      = sizes(rf).toDouble
      val ranks = li.filter(col("l_returnflag") === rf)
        .agg(
          sum(when(col("l_extendedprice") <= a.getDouble(1), 1L).otherwise(0L)).as("le01"),
          sum(when(col("l_extendedprice") <= a.getDouble(2), 1L).otherwise(0L)).as("le99"))
        .collect()(0)
      // rank budget: sketch bound n/10000 plus a couple of rows of
      // nearest-rank-vs-interpolation slack
      val fracTol = math.max(4.0 / 10000.0, 6.0 / n)
      val frac01  = ranks.getLong(0) / n
      val frac99  = ranks.getLong(1) / n
      assert(math.abs(frac01 - 0.01) <= fracTol,
        s"$rf p01 rank: approx threshold covers $frac01 of rows (tol $fracTol)")
      assert(math.abs(frac99 - 0.99) <= fracTol,
        s"$rf p99 rank: approx threshold covers $frac99 of rows (tol $fracTol)")
      // tail counts move by at most the rank-error budget (rows whose value
      // sits between the two thresholds), again with interpolation slack
      val rankTol = math.max(4 * n / 10000.0, 4.0)
      assert(math.abs(a.getLong(3) - e.getLong(3)) <= rankTol,
        s"$rf n_lo: approx=${a.getLong(3)} exact=${e.getLong(3)} tol=$rankTol")
      assert(math.abs(a.getLong(4) - e.getLong(4)) <= rankTol,
        s"$rf n_hi: approx=${a.getLong(4)} exact=${e.getLong(4)} tol=$rankTol")
      // the winsorized sum is dominated by the un-clamped mass — relative
      // drift bounded well under the tails' share
      val relSum = math.abs(a.getDouble(5) - e.getDouble(5)) / math.abs(e.getDouble(5))
      assert(relSum < 0.01, s"$rf sum_wins rel drift $relSum")
    }
  }
}
