package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Item co-occurrence and pointwise mutual information over grouped
  * "baskets" (a user's event types, a session's pages, a document's
  * tags) — the association-mining view of an event log (the
  * market-basket / item2item-similarity shape; PMI per Church &
  * Hanks 1990).
  *
  * Scale shape: the basket table (group, item) is DISTINCT-reduced
  * first (one shuffle on the group key), pairs come from an
  * equi-join ON THE GROUP KEY with an `itemA < itemB` residual — so
  * work is Σ basket² over DISTINCT items per basket, never corpus²,
  * and the join co-locates by group with no cross-group traffic.
  * Margins (n_a, n_b) are one bounded aggregation each, broadcast
  * back onto the pair frame (item-vocabulary-sized, not corpus-
  * sized). A pathological mega-basket should be capped upstream
  * (the same block-cap discipline as [[Linkage.linkPairs]]). */
object Cooccurrence {

  /** Distinct (group, item) baskets. */
  def baskets(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(itemCol).as("item")).distinct()

  /** Co-occurring item pairs with PMI: `item_a < item_b`, `n_ab`
    * baskets containing both, `n_a`/`n_b` margins, `n_baskets`, and
    * `pmi = ln((n_ab·N)/(n_a·n_b))` rounded to 6 (the cross-engine
    * float contract). */
  def pmiPairs(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val b = baskets(df, groupCol, itemCol)
    val nBaskets = b.select(col("g")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val margins = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = b.as("x").join(b.as("y"), Seq("g"))
      .where(col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(margins.select(col("item").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(margins.select(col("item").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .join(broadcast(nBaskets), lit(true))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        round(log(
          (col("n_ab").cast("double") * col("n_baskets").cast("double")) /
            (col("n_a").cast("double") * col("n_b").cast("double"))), 6)
          .as("pmi"))
  }
}
