package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cluster-scale physical-layout tooling: bucketing for co-located
  * joins and salting for skewed keys. These are the knobs a 100 TB
  * deployment turns that the test SFs don't need — implemented and
  * spec-verified here so the layout contracts are real code, not
  * documentation.
  */
object ScaleOps {

  /** Persist a DataFrame bucketed+sorted by join key. Two tables
    * bucketed the same way join with ZERO shuffle (SortMergeJoin over
    * pre-bucketed scans) — the co-located-join layout for repeated
    * fact-fact joins.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Skew-safe equi-join: spread each hot key of `big` over `nSalts`
    * partitions by a random salt, replicate `small` across all salt
    * values, join on (key, salt). Output is identical to the plain
    * join (salt is dropped); only the shuffle distribution changes.
    * AQE's skew-join handles moderate skew automatically — this is
    * for the pathological keys AQE's split thresholds won't touch.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod((rand(42) * nSalts).cast("int"), lit(nSalts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
