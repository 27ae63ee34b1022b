package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys — the manual salting
  * pattern for when AQE's runtime skew-join split isn't available (e.g.
  * aggregations, or pre-AQE shuffle plans).
  *
  * Two-phase aggregation: group by (key, salt) first (splits a hot key
  * over `buckets` reducers), then re-aggregate by key. Salted join:
  * replicate the small side once per salt value so every salted fact
  * partition finds its match.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row content
    * (not rand(): retries/speculative tasks must salt identically). */
  def salt(on: Column, buckets: Int): Column =
    pmod(hash(on), lit(buckets))

  /** Two-phase (partial → final) sum/count-style aggregation of
    * `aggs` over `keys`, splitting each key across `buckets` partial
    * groups. `aggs` maps output name -> (partialAgg, finalAgg). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltOn: Column, buckets: Int,
      aggs: Map[String, (Column => Column, Column => Column)],
      valueCol: String): DataFrame = {
    val partialAggs = aggs.map { case (name, (p, _)) =>
      p(col(valueCol)).as(s"__p_$name")
    }.toSeq
    val finalAggs = aggs.map { case (name, (_, f)) =>
      f(col(s"__p_$name")).as(name)
    }.toSeq
    df.withColumn("__salt", salt(saltOn, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join of a skewed fact to a small dim: the fact side
    * gets a content-derived salt, the dim side is exploded once per
    * salt value, and the join key becomes (key, salt). The dim side
    * grows x buckets — use only when it is broadcast-small. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, saltOn: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltOn, buckets))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
