package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Overlapping token-window chunking — the retrieval/embedding
  * preparation pass of a training-data pipeline (each chunk becomes an
  * embedding/context unit; the overlap preserves cross-boundary
  * context).
  *
  * Scale shape: one narrow projection (tokenize → per-row chunk-start
  * sequence → slice) followed by a posexplode — zero shuffles, the
  * operator pipelines inside whole-stage codegen into whatever
  * consumes the chunks. Output size is ~|corpus| · width/stride rows,
  * linear in the input.
  */
object Chunking {

  /** Split each document into token windows of `width` tokens starting
    * every `stride` tokens (stride ≤ width ⇒ consecutive chunks
    * overlap by width − stride). Chunk k covers tokens
    * [k·stride, k·stride + width); the chunk count is
    * 1 + max(0, ⌈(n − width)/stride⌉), which covers every token and
    * never emits a trailing chunk fully contained in its predecessor.
    * Output: (id, chunk_id, n_tokens, chunk text). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(stride > 0 && stride <= width,
      "stride must be in [1, width]")
    val lastChunk = greatest(lit(0),
      ceil((size(col("__w")) - width) / lit(stride.toDouble)).cast("int"))
    df.select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol), posexplode(transform(
          sequence(lit(0), lastChunk),
          k => slice(col("__w"), k * stride + 1, lit(width))))
        .as(Seq("chunk_id", "__cw")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__cw")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__cw")).as("chunk"))
  }
}
