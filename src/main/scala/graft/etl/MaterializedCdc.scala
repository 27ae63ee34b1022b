package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained CDC state table — the replication-sink
  * materialization of [[graft.ops.Scd.applyChangelog]]: the state at
  * `path` holds each key's LATEST change event (tombstones INCLUDED —
  * a delete must persist in state so it keeps suppressing the key and
  * keeps winning merges against older batched events), and absorbing a
  * delta is `latest(state ∪ latest(delta))` — "latest per key" is
  * associative and commutative, so the incremental state equals the
  * one-shot apply over the full log regardless of batch boundaries.
  *
  * Same 100 TB posture as [[MaterializedAgg]]: state hash-bucketed on
  * key and written `partitionBy(__bucket)`; a refresh pre-reduces the
  * delta (one row per touched key crosses the shuffle), reads only the
  * touched buckets, and rewrites only those partitions via dynamic
  * partition overwrite. */
object MaterializedCdc {

  private def carried(orderCols: Seq[String], opCol: String,
      payloadCols: Seq[String]) =
    struct((orderCols.map(col) :+ col(opCol)) ++ payloadCols.map(col): _*)

  /** One row per (key, bucket): the latest event's fields, flat. */
  private def latest(log: DataFrame, keyCol: String, orderCols: Seq[String],
      opCol: String, payloadCols: Seq[String], nBuckets: Int): DataFrame = {
    val fields = (orderCols :+ opCol) ++ payloadCols
    log.groupBy(col(keyCol),
        pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).as("__bucket"))
      .agg(max_by(carried(orderCols, opCol, payloadCols),
        struct(orderCols.map(col): _*)).as("__last"))
      .select(col(keyCol) +: col("__bucket") +:
        fields.map(f => col(s"__last.$f").as(f)): _*)
  }

  /** Initialize the state from a first log slice. */
  def create(log: DataFrame, keyCol: String, orderCols: Seq[String],
      opCol: String, payloadCols: Seq[String], path: String,
      nBuckets: Int = 64): Unit =
    latest(log, keyCol, orderCols, opCol, payloadCols, nBuckets)
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)

  /** The shared merge-and-write of [[refresh]]/[[refreshEmit]]:
    * returns the (deltaL, merged) checkpointed frames for the caller
    * to consume and free. `merged` is checkpointed BEFORE the write
    * because the dynamic overwrite reads the same partitions it
    * replaces. */
  private def mergeWrite(spark: SparkSession, path: String,
      delta: DataFrame, keyCol: String, orderCols: Seq[String],
      opCol: String, payloadCols: Seq[String],
      nBuckets: Int): (DataFrame, DataFrame) = {
    val deltaL = Checkpoints.truncate(
      latest(delta, keyCol, orderCols, opCol, payloadCols, nBuckets))
    val touched = deltaL.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0)) // bounded: at most nBuckets values
    val state = spark.read.parquet(path)
      .where(col("__bucket").isin(touched: _*))
    val merged = Checkpoints.truncate(
      state.unionByName(deltaL)
        .groupBy(col(keyCol), col("__bucket"))
        .agg(max_by(carried(orderCols, opCol, payloadCols),
          struct(orderCols.map(col): _*)).as("__last"))
        .select(col(keyCol) +: col("__bucket") +:
          ((orderCols :+ opCol) ++ payloadCols)
            .map(f => col(s"__last.$f").as(f)): _*))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(path)
    (deltaL, merged)
  }

  /** Absorb a delta log slice: cost bounded by the delta plus the
    * state buckets it touches; the full key space is never read. */
  def refresh(spark: SparkSession, path: String, delta: DataFrame,
      keyCol: String, orderCols: Seq[String], opCol: String,
      payloadCols: Seq[String], nBuckets: Int = 64): Unit = {
    val (deltaL, merged) = mergeWrite(spark, path, delta, keyCol,
      orderCols, opCol, payloadCols, nBuckets)
    Checkpoints.free(deltaL); Checkpoints.free(merged)
  }

  /** [[refresh]] that also EMITS the post-merge LATEST row of every
    * key the delta touched (tombstones included) — the upsert stream
    * a downstream consumer applies as expire+insert pairs
    * ([[MaterializedJoin.applyUpserts]]: the CDC→join composition
    * that gives the maintained join update/delete semantics). The
    * emission is computed from the same merged frame the state write
    * lands, so it cannot diverge from state; it is eagerly
    * materialized (checkpointed) BEFORE this returns, so a replayed
    * caller re-derives identical emissions from the already-merged
    * (idempotent) state. Caller frees the returned frame when done. */
  def refreshEmit(spark: SparkSession, path: String, delta: DataFrame,
      keyCol: String, orderCols: Seq[String], opCol: String,
      payloadCols: Seq[String], nBuckets: Int = 64): DataFrame = {
    val (deltaL, merged) = mergeWrite(spark, path, delta, keyCol,
      orderCols, opCol, payloadCols, nBuckets)
    val emitted = Checkpoints.truncate(
      merged.join(deltaL.select(col(keyCol)).distinct(), Seq(keyCol),
        "semi"))
    Checkpoints.free(deltaL)
    Checkpoints.free(merged)
    emitted
  }

  /** The live table: tombstoned keys suppressed, bucket dropped. */
  def read(spark: SparkSession, path: String, opCol: String,
      deleteOp: String): DataFrame =
    spark.read.parquet(path)
      .where(col(opCol) =!= deleteOp)
      .drop("__bucket")
}
