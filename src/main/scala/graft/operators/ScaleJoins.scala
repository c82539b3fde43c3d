package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
