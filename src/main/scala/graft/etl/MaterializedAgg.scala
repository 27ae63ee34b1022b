package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained grouped aggregate — materialized-view
  * maintenance for the self-maintainable aggregates (count / sum /
  * min / max; avg derived at read) in the sense of Mumick, Quass &
  * Mumick, "Maintenance of Data Cubes and Summary Tables in a
  * Warehouse" (SIGMOD 1997): the state table stores MERGEABLE
  * partials per key, so absorbing a delta never rescans the base —
  * `merge(state, partials(delta))` replaces `aggregate(base ∪ delta)`.
  *
  * Scale posture (100 TB): the state is hash-bucketed on the grouping
  * key (`__bucket = pmod(xxhash64(keys), nBuckets)`) and written
  * partitioned by bucket, so a refresh (a) pre-aggregates the delta —
  * the shuffle carries one partial row per touched key, not the delta's
  * rows; (b) reads ONLY the state partitions whose buckets the delta
  * touches (partition pruning on the bucket predicate — a daily delta
  * touching 1% of keys reads ~1% of a 10⁹-key state); and (c) rewrites
  * only those partitions via dynamic partition overwrite. The merged
  * frame is materialized ([[Checkpoints.truncate]]) before the write
  * because it reads the same files it replaces.
  *
  * The reference's warehouse refresh (S8) is a full TRUNCATE+INSERT
  * (`local_data_ingestion.py:116-130`); this is the incremental form a
  * 100 TB fact table needs instead. */
object MaterializedAgg {

  /** Mergeable partials of `valueCol` per `keys`: `__bucket`, `__cnt`,
    * `__sum`, `__min`, `__max`. One partial-agg shuffle; rows with a
    * NULL value count toward no partial (SQL aggregate semantics). */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      nBuckets: Int): DataFrame =
    df.groupBy(keys.map(col) :+
        pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
          .as("__bucket"): _*)
      .agg(count(col(valueCol)).as("__cnt"),
        sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))

  /** Merge two partial frames with identical shape: one hash
    * aggregation on (keys, bucket). */
  private def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "__bucket").map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"), sum(col("__sum")).as("__sum"),
        min(col("__min")).as("__min"), max(col("__max")).as("__max"))

  /** Initialize the state table at `path` from a base frame. */
  def create(df: DataFrame, keys: Seq[String], valueCol: String,
      path: String, nBuckets: Int = 64): Unit =
    partials(df, keys, valueCol, nBuckets)
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)

  /** Absorb `delta` into the state at `path`. Cost is bounded by the
    * delta plus the state buckets it touches — the base is never read.
    * `nBuckets` must match the value the state was created with. */
  def refresh(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], valueCol: String, nBuckets: Int = 64): Unit = {
    val deltaP = Checkpoints.truncate(
      partials(delta, keys, valueCol, nBuckets))
    // bounded by construction: at most nBuckets values
    val touched = deltaP.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0))
    val state = spark.read.parquet(path)
      .where(col("__bucket").isin(touched: _*))
    val merged = Checkpoints.truncate(merge(state, deltaP, keys))
    Checkpoints.free(deltaP)
    // dynamic overwrite: only the touched __bucket= partitions are
    // replaced; untouched buckets' files are never opened or rewritten
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(path)
    Checkpoints.free(merged)
  }

  /** Read the finalized view: keys, n, total, lo, hi, mean. */
  def read(spark: SparkSession, path: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .select((keys.map(col) :+ col("__cnt").as("n") :+
        col("__sum").as("total") :+ col("__min").as("lo") :+
        col("__max").as("hi") :+
        (col("__sum") / col("__cnt")).as("mean")): _*)
}
