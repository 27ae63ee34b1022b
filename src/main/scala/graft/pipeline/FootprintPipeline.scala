package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{JsonDirSource, Renames, WarehouseSink}

/** The reference's ingestion pipeline (S5 → P4 → S8 → checks), end to
  * end on Spark (`local_test/scripts/local_data_ingestion.py:160-193`):
  * read a directory of per-year JSON arrays, rename camelCase columns,
  * cast to the declared warehouse schema, full-refresh the
  * `carbon_footprint` table, and run the reference's verification
  * probes. */
object FootprintPipeline {

  /** Declared warehouse schema (`local_data_ingestion.py:31-47`). */
  val CarbonFootprintSchema: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("country_code", IntegerType),
    StructField("country_name", StringType),
    StructField("short_name", StringType),
    StructField("isoa2", StringType),
    StructField("record", StringType),
    StructField("crop_land", DoubleType),
    StructField("grazing_land", DoubleType),
    StructField("forest_land", DoubleType),
    StructField("fishing_ground", DoubleType),
    StructField("builtup_land", DoubleType),
    StructField("carbon", DoubleType),
    StructField("value", DoubleType),
    StructField("score", StringType)))

  /** Extract + transform: json dir → snake_case → declared types/order. */
  def extractAndTransform(spark: SparkSession, rawDir: String): DataFrame = {
    val renamed = Renames.applyMap(
      JsonDirSource.readJsonArrayDir(spark, rawDir), Renames.FootprintRenames)
    renamed.select(CarbonFootprintSchema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Full pipeline: land into the managed table (idempotent refresh). */
  def run(spark: SparkSession, rawDir: String,
      table: String = "carbon_footprint"): DataFrame = {
    val df = extractAndTransform(spark, rawDir)
    WarehouseSink.overwriteTable(df, table)
    spark.table(table)
  }

  /** The reference's three post-load probes
    * (`local_data_ingestion.py:133-156`): row count, a sample, and the
    * Brazil-by-year carbon average. */
  def rowCount(t: DataFrame): Long = t.count()

  def sample(t: DataFrame, n: Int = 5): Array[org.apache.spark.sql.Row] =
    t.select(col("year"), col("country_name"), col("carbon")).limit(n).collect()

  def avgCarbonByYear(t: DataFrame, country: String): DataFrame =
    t.where(col("country_name") === country)
      .groupBy(col("country_name"), col("year"))
      .agg(avg(col("carbon")).as("avg_carbon"))
      .orderBy(col("year"))
}
