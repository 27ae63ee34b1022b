package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained INNER EQUI-JOIN materialization — the
  * join leg of the maintained-view family ([[MaterializedAgg]] /
  * [[MaterializedDistinct]] / [[MaterializedQuantiles]] /
  * [[MaterializedCdc]]), via the classic counting/delta rule for
  * insert-only view maintenance (Blakeley, Larson & Tompa, SIGMOD
  * 1986; Gupta & Mumick's survey): with J = A ⋈ B,
  *
  *   ΔJ = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB
  *
  * — each delta joins the OTHER side's standing state exactly once
  * (ΔA⋈ΔB lands in the first term only), so a refresh never rescans
  * the join it has already emitted.
  *
  * Scale posture (100 TB): both sides are persisted hash-bucketed on
  * their join keys (`__bucket = pmod(xxhash64(keys), nBuckets)` —
  * the same value on both sides for equal keys, which is what makes
  * a bucket a JOIN-CLOSED unit: matching rows always share a
  * bucket). A refresh therefore (a) reads only the standing-side
  * bucket partitions the delta touches — a daily delta touching 1%
  * of key space reads ~1% of a 10⁹-row side; (b) joins
  * delta-vs-touched-buckets, never base-vs-base; and (c) APPENDS the
  * new join rows — under the insert-only contract the materialized
  * join is append-only, so no existing file is ever rewritten (the
  * same property the zone-map layout exploits for time travel).
  *
  * CONTRACT: inserts only. Updates/deletes need per-key latest
  * semantics — that is [[MaterializedCdc]]'s job, composed upstream
  * (maintain the CDC state, feed its emitted upserts here as
  * expire+insert pairs). Payload column names of the two sides must
  * be disjoint (the join output carries both); key columns may be
  * named differently per side but must be type-identical (xxhash64
  * is type-sensitive — a BIGINT⋈INT key pair would bucket apart). */
object MaterializedJoin {

  private def bucketed(df: DataFrame, keys: Seq[String],
      nBuckets: Int): DataFrame =
    df.withColumn("__bucket",
      pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)))

  private def joinCond(a: DataFrame, b: DataFrame, keysA: Seq[String],
      keysB: Seq[String]): Column =
    keysA.zip(keysB).map { case (ka, kb) => a(ka) === b(kb) }
      .reduce(_ && _) && a("__bucket") === b("__bucket")

  /** The join output frame: A's columns (keys included) + B's payload
    * columns (B's key columns dropped — they equal A's) + `__bucket`. */
  private def joined(a: DataFrame, b: DataFrame, keysA: Seq[String],
      keysB: Seq[String]): DataFrame = {
    val bPayload = b.columns.filterNot(c =>
      keysB.contains(c) || c == "__bucket").toSeq
    a.join(b, joinCond(a, b, keysA, keysB), "inner")
      .select(a.col("*") +: bPayload.map(b(_)): _*)
  }

  /** Initialize the state at `path` from the two sides' current
    * content: persists bucketed copies of A and B plus the
    * materialized join. */
  def create(a: DataFrame, b: DataFrame, keysA: Seq[String],
      keysB: Seq[String], path: String, nBuckets: Int = 64): Unit = {
    // one file per bucket partition (repartition on the bucket before
    // the partitioned write): without it every task writes a sliver
    // into every bucket dir — tasks x buckets small files whose open
    // cost dominates the bucket-pruned re-reads a refresh does
    val aB = bucketed(a, keysA, nBuckets)
      .repartition(nBuckets, col("__bucket"))
    val bB = bucketed(b, keysB, nBuckets)
      .repartition(nBuckets, col("__bucket"))
    aB.write.mode("overwrite").partitionBy("__bucket").parquet(s"$path/A")
    bB.write.mode("overwrite").partitionBy("__bucket").parquet(s"$path/B")
    joined(bucketedRead(a.sparkSession, s"$path/A"),
        bucketedRead(a.sparkSession, s"$path/B"), keysA, keysB)
      .repartition(nBuckets, col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket").parquet(s"$path/J")
  }

  private def bucketedRead(spark: SparkSession, p: String): DataFrame =
    spark.read.parquet(p)

  /** Absorb side deltas. Cost: each delta is joined against ONLY the
    * other side's touched bucket partitions (plus the sibling
    * delta); new join rows and the deltas themselves are APPENDED —
    * standing files are never opened outside the touched buckets and
    * never rewritten at all. Either delta may be empty.
    *
    * Atomicity contract: the three appends (J, then A, then B) are
    * separate jobs — a crash between them leaves J ahead of the
    * sides, and REPLAYING the same refresh would then duplicate join
    * rows. This is the batch form's driver-orchestrated contract
    * (retry the whole refresh only from a state known good, e.g.
    * after restoring the directories from a snapshot); the STREAMING
    * form below is the crash-replay-safe one — per-batch dynamic
    * overwrite makes a replayed epoch replace itself. */
  def refresh(spark: SparkSession, path: String,
      deltaA: DataFrame, deltaB: DataFrame, keysA: Seq[String],
      keysB: Seq[String], nBuckets: Int = 64): Unit = {
    val dA = Checkpoints.truncate(bucketed(deltaA, keysA, nBuckets))
    val dB = Checkpoints.truncate(bucketed(deltaB, keysB, nBuckets))
    val touchedA = dA.select("__bucket").distinct()
      .collect().map(_.getLong(0)) // bounded: at most nBuckets values
    val touchedB = dB.select("__bucket").distinct()
      .collect().map(_.getLong(0))
    // ΔA ⋈ (B_old restricted to ΔA's buckets ∪ ΔB) — the only term
    // that sees ΔB alongside standing B, so ΔA⋈ΔB emits exactly once
    val term1 =
      if (touchedA.isEmpty) None
      else Some(joined(dA,
        bucketedRead(spark, s"$path/B")
          .where(col("__bucket").isin(touchedA: _*))
          .unionByName(dB), keysA, keysB))
    // A_old (restricted to ΔB's buckets) ⋈ ΔB
    val term2 =
      if (touchedB.isEmpty) None
      else Some(joined(
        bucketedRead(spark, s"$path/A")
          .where(col("__bucket").isin(touchedB: _*)), dB, keysA, keysB))
    val newJ = (term1.toSeq ++ term2.toSeq).reduceOption(_ unionByName _)
    newJ.foreach(_.repartition(nBuckets, col("__bucket"))
      .write.mode("append").partitionBy("__bucket").parquet(s"$path/J"))
    if (touchedA.nonEmpty)
      dA.repartition(nBuckets, col("__bucket"))
        .write.mode("append").partitionBy("__bucket").parquet(s"$path/A")
    if (touchedB.nonEmpty)
      dB.repartition(nBuckets, col("__bucket"))
        .write.mode("append").partitionBy("__bucket").parquet(s"$path/B")
    Checkpoints.free(dA); Checkpoints.free(dB)
  }

  /** The maintained join, as of the last refresh. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/J").drop("__bucket")

  // ----------------------------------------------------------------
  // Streaming maintenance: per-micro-batch delta joins, exactly-once.

  /** Persist ONLY the standing (build) side — the setup for
    * stream-maintained joins where deltas arrive on one side. */
  def createSide(b: DataFrame, keysB: Seq[String], path: String,
      nBuckets: Int = 64): Unit =
    bucketed(b, keysB, nBuckets)
      .repartition(nBuckets, col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket").parquet(s"$path/B")

  /** Join one micro-batch of the delta side against the standing
    * side's TOUCHED bucket partitions only, landing the result under
    * `__batch=<batchId>` via dynamic partition overwrite — the same
    * exactly-once-by-idempotence contract as
    * [[MaterializedAgg.appendBatchPartials]]: a crash-replayed batch
    * replaces its own partition's half-written files instead of
    * emitting duplicate join rows. Batches are disjoint in the
    * source rows (the stream delivers each row once across batch
    * ids), so the union of batch partitions IS the maintained
    * join. */
  def appendBatchDelta(batchA: DataFrame, batchId: Long, path: String,
      keysA: Seq[String], keysB: Seq[String], nBuckets: Int = 64): Unit = {
    val dA = Checkpoints.truncate(bucketed(batchA, keysA, nBuckets))
    val touched = dA.select("__bucket").distinct()
      .collect().map(_.getLong(0))
    if (touched.nonEmpty)
      joined(dA,
          batchA.sparkSession.read.parquet(s"$path/B")
            .where(col("__bucket").isin(touched: _*)), keysA, keysB)
        .withColumn("__batch", lit(batchId))
        .repartition(math.min(nBuckets, 8), col("__bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch").parquet(s"$path/J")
    Checkpoints.free(dA)
  }

  /** The stream-maintained join across all committed batches. */
  def readMergedBatches(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/J").drop("__bucket", "__batch")
}
