package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the 1000-executor regime. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime; this
  * utility covers the case AQE can't: a shuffled join whose hot keys are
  * known or discoverable, salted explicitly so no single task receives a
  * whole hot key.
  */
object SkewJoin {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt in
    * [0, saltFactor); the small side is replicated saltFactor times. Result
    * equals `large.join(small, keys)` exactly, but each hot key's rows
    * spread over saltFactor tasks.
    *
    * Use when `small` is too big to broadcast but the join key on `large`
    * is skewed. Salt is derived from stable row content (xxhash64 of all
    * large-side columns), not rand(), so retries/speculation stay
    * deterministic. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }

  /** Two-stage aggregation for skewed group-by keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Spark already does map-side
    * partial aggregation; this adds an extra REDUCE level for keys so hot
    * that even the partial rows of one key overwhelm a single reducer
    * (e.g. count/sum over a 90%-one-key column at 100 TB). */
  def twoStageSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltFactor: Int = 32): DataFrame = {
    val ks = keyCols.map(col)
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
      .groupBy(ks :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(ks: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__pn")).as("n"))
  }
}
