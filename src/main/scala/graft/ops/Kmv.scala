package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches with SET-OPERATION
  * estimates — the theta-sketch capability HLL cannot provide
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007; Dasgupta et al., "A Framework
  * for Estimating Stream Expression Cardinalities" / the DataSketches
  * theta family).
  *
  * A sketch of a value set is its k smallest DISTINCT portable hashes
  * (48-bit, from md5 — engine-portable like
  * [[graft.ops.Sampling.shuffleKey]], so a SQL oracle reproduces every
  * estimate bit-for-bit, unlike HLL whose register layout is
  * engine-private). Properties that matter at 100 TB:
  *
  *  - **Mergeable**: union of sketches = k smallest of the combined
  *    hash sets — commutative, associative, idempotent; built here as
  *    a bounded [[MinKDistinctLongs]] aggregator, so the shuffle
  *    carries ONE ≤k-long array per group per map partition, never
  *    the value universe (the exact-distinct shuffle at 10⁹ users per
  *    key is the job; the sketch is a few KB).
  *  - **Set algebra**: unlike HLL, KMV supports INTERSECTION (and
  *    difference) estimates: for sketches A, B with union sketch
  *    K = mink(A ∪ B), ρ = |K ∩ A ∩ B| / |K| estimates the Jaccard
  *    ratio and ρ · est(K) the intersection size — audience-overlap /
  *    cross-corpus-overlap questions that would otherwise need a
  *    full distinct self-join.
  *  - **Deterministic in the value set**: no randomness, no insertion-
  *    order sensitivity — retry-stable and oracle-gateable.
  *
  * Estimator: with u_k = h_k / 2^48 the k-th smallest normalized
  * hash, est = (k−1)/u_k (the unbiased KMV estimator); a sketch
  * holding fewer than k hashes has seen its ENTIRE value set and is
  * exact. Reference's closest surface: the notebook's
  * COUNT(DISTINCT …) probes (analytics.ipynb uniqueness checks); this
  * is their mergeable sketch form plus the set algebra.
  */
object Kmv {

  /** Hash space size: 48 bits (12 md5 hex digits — fits a positive
    * long in any engine; collision odds at gate cardinalities are
    * negligible and a collision only perturbs the estimate). */
  val HashSpace: Double = 281474976710656.0 // 2^48

  /** Portable 48-bit value hash: first 12 hex digits of
    * md5("<seed>:<value>") — identical in any engine with md5. */
  def kmvHash(c: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), c.cast("string"))),
      1, 12), 16, 10).cast("long")

  /** Bounded mergeable bottom-k-distinct aggregator over hash longs.
    * Buffer is a sorted ascending array of ≤ k distinct values, so
    * partial aggregation (map-side combine) keeps per-group state at
    * k longs and the merge is a linear sorted-merge. */
  class MinKDistinctLongs(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, "k must be positive")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, a)
      if (pos >= 0) b // already present
      else {
        val ins = -pos - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = a
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins < k) { // displaces the current max
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = a
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        } else b
      }
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val out = new Array[Long](math.min(k, b1.length + b2.length))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < b1.length || j < b2.length)) {
        val v =
          if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) {
            val x = b1(i); i += 1
            if (j < b2.length && b2(j) == x) j += 1 // dedup across buffers
            x
          } else { val x = b2(j); j += 1; x }
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder = Encoders.kryo[Array[Long]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One KMV sketch (sorted ascending ≤k-long array column `kmv`) of
    * `valueCol`'s distinct values per `keys` group. One partial-agg
    * shuffle, ≤ k longs of state per group per side. NULL values
    * contribute nothing (SQL COUNT DISTINCT semantics). */
  def sketches(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int, seed: String): DataFrame = {
    val agg = udaf(new MinKDistinctLongs(k), Encoders.scalaLong)
    df.where(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(agg(kmvHash(col(valueCol), seed)).as("kmv"))
  }

  /** Distinct-count estimate from a sketch column: exact (= size) when
    * the sketch saw fewer than k values, else (k−1) · 2^48 / h_k.
    * The arithmetic shape (double multiply then divide) is fixed so a
    * SQL oracle reproduces it bit-for-bit. */
  def distinctEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))

  /** Union sketch of two sketch columns: k smallest of the combined
    * distinct hash sets (pure codegen'd array built-ins — sketches are
    * ≤ k longs, so this is per-row constant work). */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection-size estimate from two sketches: ρ · est(K) where
    * K is the union sketch and ρ = |K ∩ A ∩ B| / |K| (Beyer et al.
    * 2007, §4). Exact when the union sketch is unsaturated. */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column = {
    val k2 = unionSketch(a, b, k)
    val rhoNum = size(array_intersect(array_intersect(k2, a), b))
    (rhoNum.cast("double") / size(k2).cast("double")) *
      distinctEstimate(k2, k)
  }
}
