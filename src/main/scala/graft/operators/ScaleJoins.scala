package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** Scale-path join utilities (the 100 TB design notes made executable):
  * salting for skewed keys and bucketing for shuffle-free co-located
  * fact-fact joins. AQE's skew-join handles moderate skew automatically;
  * salting is the explicit dial for pathological hot keys, bucketing the
  * amortizer when one join key dominates a workload.
  */
object ScaleJoins {

  /** Skew-safe equi-join: each left row gets a random-but-deterministic
    * salt in [0, saltFactor) derived from `rowDiscriminator` (any unique
    * column); the right side replicates saltFactor times. A hot left key
    * then spreads over saltFactor reducers instead of one.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      rowDiscriminator: Column,
      saltFactor: Int,
      joinType: String = "inner",
  ): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(rowDiscriminator), lit(saltFactor)).cast("int"))
    val saltedRight = right.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * shuffle-free (bucket pruning + no exchange). Local-mode demo of the
    * production pattern: facts bucketed once, joined many times.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two pre-bucketed tables; with matching bucket specs Catalyst
    * plans a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  val x41_salted_join = Q(
    "x41_salted_join",
    """WITH dim AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
      |SELECT e.event_type, count(*) AS n,
      |       CAST(SUM(d.n_events) AS BIGINT) AS weight
      |FROM events e JOIN dim d ON e.user_id = d.user_id
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
  ) { t =>
    // The salting IDENTITY, oracle-checked: a salted equi-join must
    // produce byte-identical rows to the plain join (the oracle replays
    // the plain join in DuckDB) — salting only changes WHERE rows meet
    // (shuffle keys become (key, salt), spreading a hot key over
    // saltFactor reducers), never WHAT matches. The dim side replicates
    // saltFactor times: the explicit trade — saltFactor x dim shuffle
    // volume buys hot-key parallelism AQE's skew split can't give when a
    // single key exceeds one reducer. event_id is the discriminator
    // (unique per fact row -> deterministic salt assignment).
    val e = t.events.select("event_id", "user_id", "event_type")
    val dim = e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    saltedJoin(e, dim, key = "user_id", rowDiscriminator = col("event_id"), saltFactor = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("n_events").as("weight"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(x41_salted_join)
}
