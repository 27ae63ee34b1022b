package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/balancing operators for training-data curation.
  *
  * All deterministic: sampling decisions derive from content hashes,
  * not RNG state, so a retried task or a re-run pipeline produces the
  * same corpus (the property that matters when a 100 TB job partially
  * fails and re-executes).
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff its key's 64-bit
    * hash, reduced mod 1e6, lands below `fraction` x 1e6. Same key ->
    * same decision, across runs, partitionings, and retries (fraction
    * granularity 1e-6 — plenty for corpus downsampling). */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.where(pmod(xxhash64(col(keyCol)), lit(1000000L))
      < lit((fraction * 1000000L).toLong))
  }

  /** Cap each stratum at `n` rows, chosen deterministically by content
    * hash (a hash-ordered top-n per class): the standard class-balance
    * step for a skewed training corpus. One shuffle on the stratum
    * key. */
  def capPerStratum(df: DataFrame, strataCol: String, n: Int,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(xxhash64(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-stratum fractions (df.stat.sampleBy parity, seeded). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
