package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming MinHash-LSH near-duplicate candidate generation — the
  * incremental-ingest shape of [[graft.ops.Dedup.lshCandidates]]: as
  * documents arrive, each is checked against everything ALREADY
  * ingested that shares an LSH band bucket, without ever rescanning
  * the standing corpus.
  *
  * Mechanics: per micro-batch, signatures and band keys are computed
  * with the same narrow expressions as the batch path (one pass, no
  * shuffle before the state operator); rows then group by band bucket
  * and `flatMapGroupsWithState` keeps each bucket's member ids as
  * operator state. A new document emits one (doc_a, doc_b) candidate
  * per standing member of its buckets (doc_a < doc_b — the same
  * orientation as the batch operator) and joins the state.
  *
  * Scale notes: state is exactly the batch band table, partitioned by
  * bucket — the shuffle key is the band key, so hot buckets spread no
  * worse than the batch join. Pairs sharing several buckets are
  * emitted once per bucket (a streaming sink can't globally
  * de-duplicate an append stream); the downstream exact-verify stage
  * de-duplicates, exactly as it does for the batch candidates.
  * Production deployments cap state with a timeout/TTL on stale
  * buckets; the untimed form here matches the batch semantics so the
  * spec can assert stream ≡ batch.
  */
object StreamDedup {

  /** `docs` is a STREAMING frame with (`idCol` long, `textCol`
    * string). Returns the append-mode candidate-pair stream
    * (doc_a, doc_b). */
  def lshCandidateStream(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, nPerms: Int = 8, bands: Int = 4,
      rowsPerBand: Int = 2): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(bands * rowsPerBand <= nPerms,
      s"bands*rowsPerBand (${bands * rowsPerBand}) exceeds nPerms ($nPerms)")
    val banded = Dedup.bandTable(
        Dedup.minhashSignatures(docs, idCol, textCol, n, nPerms),
        idCol, bands, rowsPerBand)
      .select(concat_ws(":", col("band") +: (0 until rowsPerBand).map(j =>
        element_at(col("bkey"), j + 1)): _*).as("bucket"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long)],
            state: GroupState[Seq[Long]]) =>
          val standing = state.getOption.getOrElse(Seq.empty)
          // deterministic intra-batch order; re-ingested ids are no-ops
          val incoming = rows.map(_._2).toSeq.distinct.sorted
            .filterNot(standing.contains)
          val pairs = for {
            (id, i) <- incoming.zipWithIndex
            other <- standing ++ incoming.take(i)
          } yield (math.min(id, other), math.max(id, other))
          state.update(standing ++ incoming)
          pairs.iterator
      }
  }
}
