package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Directory-of-JSON-arrays source (reference S5:
  * `local_test/scripts/local_data_ingestion.py:86-108` — per-file Polars
  * read, per-file error tolerance, concat).
  *
  * Spark-first form: one multiLine read over the glob subsumes the
  * file loop + concat; PERMISSIVE mode with a `_corrupt_record` column
  * replicates the skip-bad-file tolerance (bad files yield corrupt-record
  * rows we drop, instead of aborting the pipeline).
  *
  * Scale note: multiLine JSON is one record batch per file (not
  * splittable). Fine for the reference's ~25 files; at 100 TB land
  * NDJSON instead ([[readNdjsonDir]]) which splits by line.
  */
object JsonDirSource {

  /** Read every `*.json` file (each a top-level JSON array of records),
    * dropping unparseable files (DROPMALFORMED — Spark disallows
    * filtering on the corrupt-record column of a raw file scan, and a
    * cache-then-filter workaround would materialize the corpus). */
  def readJsonArrayDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/*.json")

  /** Line-delimited JSON (the splittable, scale-friendly landing format). */
  def readNdjsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mode", "PERMISSIVE").json(s"$dir/*.json")
}
