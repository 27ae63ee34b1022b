package graft.etl

import org.apache.spark.sql.DataFrame

/** Bulk column renaming (reference P4/P5:
  * `local_data_ingestion.py:20-28,110` camelCase→snake_case map;
  * `.ipynb:241` typo fix RETUNR_TYPE→RETURN_TYPE). */
object Renames {

  /** The reference's GFN rename map (`local_data_ingestion.py:20-28`). */
  val FootprintRenames: Map[String, String] = Map(
    "countryCode" -> "country_code",
    "countryName" -> "country_name",
    "shortName" -> "short_name",
    "cropLand" -> "crop_land",
    "grazingLand" -> "grazing_land",
    "forestLand" -> "forest_land",
    "fishingGround" -> "fishing_ground",
    "builtupLand" -> "builtup_land")

  /** Apply a rename map; columns absent from the map pass through. */
  def applyMap(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Mechanical camelCase → snake_case for every column. */
  def camelToSnakeAll(df: DataFrame): DataFrame =
    applyMap(df, df.columns.map(c => c ->
      c.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase).toMap)
}
