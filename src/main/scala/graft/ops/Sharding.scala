package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — stable shard
  * assignment for a growing corpus (Thaler & Ravishankar 1998, the
  * scheme behind consistent object placement in distributed caches
  * and stores). Each key scores every shard with a portable hash and
  * lands on the argmax; when the shard count grows N → N+1, ONLY the
  * keys whose new shard wins the argmax move (≈ 1/(N+1) of the
  * corpus) — where `pmod(hash, N)` resharding moves ≈ N/(N+1) of it.
  * That difference is the whole point at 100 TB: growing 63 → 64
  * shards relocates ~1.6% of the data instead of ~98%.
  *
  * Pure codegen'd built-ins (md5 → conv → array argmax over N
  * structs), deterministic and engine-portable — a SQL oracle
  * reproduces every assignment. N is a literal fan-out per row:
  * fine for shard counts in the hundreds; beyond that, switch to a
  * two-level scheme (rendezvous over shard GROUPS, then within). */
object Sharding {

  /** Portable per-(key, shard) score: the 48-bit md5 hash of
    * "<seed>:<shard>:<key>". */
  private def score(key: Column, shard: Int, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), lit(shard),
      key.cast("string"))), 1, 12), 16, 10).cast("long")

  /** The winning shard (0-based) for `key` among `nShards` — argmax
    * of the per-shard scores (struct max is lexicographic: score,
    * then shard id as the deterministic tiebreak). */
  def rendezvousShard(key: Column, nShards: Int,
      seed: String = "shard"): Column = {
    require(nShards > 0, "nShards must be positive")
    array_max(array((0 until nShards).map(i =>
      struct(score(key, i, seed).as("h"),
        lit(i).as("s"))): _*)).getField("s")
  }

  /** The production form of [[rendezvousShard]]: same HRW argmax, but
    * scores come from codegen'd `xxhash64(seed, shard, key)` instead
    * of the md5 hex chain — ~20× cheaper per row (one integer-mix
    * hash vs string concat + md5 + hex parse, times N shards). Not
    * engine-portable (xxhash64 is Spark's), so the md5 form remains
    * the oracle-gated semantic reference; this one is property-gated
    * (movement bound, uniformity, stability) in the spec. The two
    * assign keys to DIFFERENT shards — pick one per table and stay
    * with it. */
  def rendezvousShardFast(key: Column, nShards: Int,
      seed: String = "shard"): Column = {
    require(nShards > 0, "nShards must be positive")
    array_max(array((0 until nShards).map(i =>
      struct(xxhash64(lit(seed), lit(i), key).as("h"),
        lit(i).as("s"))): _*)).getField("s")
  }
}
