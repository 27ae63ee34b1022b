package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (SQL:2003; the upsert workhorse Delta/Iceberg
  * users reach for) as ONE declarative full-outer-join pass:
  *
  *   - key in both:   dropped when `whenMatchedDelete` holds, else
  *                    target columns overridden by `whenMatchedUpdate`
  *                    (clause expressions may reference both sides via
  *                    the `t`/`s` aliases); unlisted columns keep the
  *                    TARGET value
  *   - source only:   inserted (source must cover the target schema),
  *                    unless `insertNotMatched` is false
  *   - target only:   kept unchanged
  *
  * The general form of what the special-cased incremental machinery
  * does ([[MaterializedCdc]] is latest-per-key merge with tombstone
  * delete; [[WarehouseSink.upsert]] is update-all-columns). Scale
  * shape: one equi-shuffle on the key (bucket both sides on the key
  * to drop even that — [[WarehouseSink.overwriteBucketed]]); clause
  * evaluation is a per-row projection. Source must be key-unique —
  * reduce upstream (latest-per-key) when it is a raw changelog. */
object Merge {

  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      whenMatchedDelete: Column = lit(false),
      whenMatchedUpdate: Map[String, Column] = Map.empty,
      insertNotMatched: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    require(whenMatchedUpdate.keySet.subsetOf(target.columns.toSet),
      s"update clause names unknown columns: " +
        s"${whenMatchedUpdate.keySet -- target.columns}")
    // presence flags (not key-null probes: nullable keys must not
    // misclassify a row as absent)
    val t = target.withColumn("__t_ex", lit(true)).alias("t")
    val s = source.withColumn("__s_ex", lit(true)).alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val tEx = coalesce(col("t.__t_ex"), lit(false))
    val sEx = coalesce(col("s.__s_ex"), lit(false))
    val out = target.columns.map { c =>
      when(tEx && sEx, whenMatchedUpdate.getOrElse(c, col(s"t.$c")))
        .when(tEx, col(s"t.$c"))
        .otherwise(col(s"s.$c")).as(c)
    }
    t.join(s, cond, "full_outer")
      .where(!(tEx && sEx && whenMatchedDelete)
        && (tEx || lit(insertNotMatched)))
      .select(out.toIndexedSeq: _*)
  }
}
