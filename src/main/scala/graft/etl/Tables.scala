package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access with schema normalization.
  *
  * The driver's `events` table carries a TIMESTAMP(NANOS) parquet column,
  * which Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL)
  * unless `spark.sql.legacy.parquet.nanosAsLong` is on — then it surfaces
  * as a LongType of nanos since epoch. We enable the flag defensively at
  * read time (it is a dynamic SQLConf) and rebuild a proper timestamp at
  * microsecond precision, which is what DuckDB-side SQL sees semantically
  * for every per-second/-day derivation used in queries.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // Integer division (`div`), never `/`: long / long promotes to
        // double, and nanos-since-epoch (~1.7e18) exceeds double's 53-bit
        // exact range — ~2% of timestamps would come back 1µs low after
        // the truncating cast. `div` keeps the conversion exact.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
