package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Parquet table access with schema normalization.
  *
  * The driver's `events` table has shipped `ts` in THREE physical layouts
  * across testdata generations, and the contract of this module is that
  * downstream code never sees any of them — only a session-zoned
  * `TimestampType` at microsecond precision, which is what the DuckDB
  * oracle sees semantically (the session timezone is pinned to UTC by
  * every graft entry point):
  *
  *   - `TIMESTAMP(NANOS)`: Spark's reader rejects it outright
  *     (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong`
  *     is on — then it surfaces as a LongType of nanos since epoch, and we
  *     rebuild micros with integer division.
  *   - `timestamp[us]` with `isAdjustedToUTC=false`: Spark 4 infers
  *     TIMESTAMP_NTZ by default, which `unix_micros`, watermarks, and
  *     double-casts all reject. We cast to TimestampType — under the
  *     pinned-UTC session this is exactly the naive-as-UTC reading DuckDB
  *     applies to the same file.
  *   - `timestamp[us]` adjusted to UTC: already TimestampType; untouched.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTime(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Canonical event-time normalization: rewrite `ts` (when present) from
    * any of the known physical layouts to session-zoned TimestampType µs.
    * Idempotent; frames without a `ts` column pass through unchanged. */
  def normalizeEventTime(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema.find(_.name == colName).map(f => normalizedTs(f.dataType, colName)) match {
      case Some(Some(c)) => df.withColumn(colName, c)
      case _             => df
    }

  /** The normalizing expression for one physical type, or None when the
    * column is already canonical (or is some unrelated type we must not
    * touch). */
  private def normalizedTs(dt: DataType, colName: String): Option[Column] = dt match {
    // Integer division (`div`), never `/`: long / long promotes to
    // double, and nanos-since-epoch (~1.7e18) exceeds double's 53-bit
    // exact range — ~2% of timestamps would come back 1µs low after
    // the truncating cast. `div` keeps the conversion exact.
    case LongType         => Some(timestamp_micros(expr(s"$colName div 1000")))
    case TimestampNTZType => Some(col(colName).cast(TimestampType))
    case _                => None
  }
}
