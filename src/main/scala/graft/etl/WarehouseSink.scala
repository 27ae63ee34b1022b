package graft.etl

import org.apache.spark.sql.DataFrame

/** Warehouse sinks (reference S7/S8:
  * `local_data_ingestion.py:31-49,116-130` — CREATE IF NOT EXISTS +
  * TRUNCATE + INSERT…SELECT, i.e. an idempotent full refresh; and the
  * notebook's CTAS `.ipynb:239-240`).
  *
  * Spark-first: `write.mode("overwrite")` IS create-if-absent +
  * truncate + insert in one atomic-per-table operation. */
object WarehouseSink {

  /** Idempotent full refresh of a managed catalog table. */
  def overwriteTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)

  /** Idempotent full refresh of a parquet path, partitioned by the given
    * columns (the 100 TB landing form: natural-key partitions prune). */
  def overwritePath(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Session-scope CTAS parity: register as a temp view. */
  def asTempView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)
}
