package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (the "salting for skew" toolbox; AQE's
  * skew-join splitting covers joins, these cover aggregations).
  *
  * A single hot grouping key concentrates one reducer at 100 TB; both
  * helpers split each key across `buckets` salted sub-keys, aggregate
  * the partials in parallel, then combine the small partial set — the
  * same two-phase shape as map-side combine, but effective even when
  * one key dominates an entire executor's input.
  */
object SkewUtils {

  /** Two-phase salted SUM/COUNT per key. `aggs` maps output column →
    * (partial aggregate over the salted groups, final combiner over the
    * partials); the provided helpers cover the common cases. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      out: String, buckets: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(buckets)))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }

  /** Salted exact COUNT(DISTINCT v): salt by the VALUE's hash, so every
    * distinct value lands in exactly one bucket — partial distinct
    * counts are disjoint and sum exactly. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: Column,
      out: String, buckets: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(valueCol), lit(buckets)))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(countDistinct(valueCol).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }
}
