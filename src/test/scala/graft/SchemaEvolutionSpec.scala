package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.SchemaEvolution

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val v2 = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType),
    StructField("score", DoubleType)))

  test("conform adds missing columns as typed NULLs in target order") {
    val b = Seq(("a", 1)).toDF("txt", "id") // reversed order, int id
    val out = SchemaEvolution.conform(
      b.select(col("txt").cast("string"), col("id")), v2)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      v2.map(f => (f.name, f.dataType)))
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.isNullAt(2))
  }

  test("numeric widening casts; narrowing and incompatible types fail") {
    val b = Seq((1, 2.5f)).toDF("id", "score") // int->long, float->double
    val out = SchemaEvolution.conform(b, StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType))))
    assert(out.head().getLong(0) == 1L)
    intercept[IllegalArgumentException] {
      SchemaEvolution.conform(Seq(Tuple1(1L)).toDF("id"),
        StructType(Seq(StructField("id", IntegerType)))) // narrow
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.conform(Seq(Tuple1("x")).toDF("id"),
        StructType(Seq(StructField("id", LongType)))) // string->long
    }
  }

  test("extra columns fail loudly unless dropExtras") {
    val b = Seq((1L, "a", "junk")).toDF("id", "txt", "extra")
    intercept[IllegalArgumentException] {
      SchemaEvolution.conform(b, v2)
    }
    val out = SchemaEvolution.conform(b, v2, dropExtras = true)
    assert(out.columns.toSeq == Seq("id", "txt", "score"))
  }

  test("readEvolved unions drifted batches; v1 files are untouched") {
    val root = graft.etl.Scratch.dir("se-spec")
    val v1 = StructType(v2.fields.take(2))
    SchemaEvolution.appendConformed(
      Seq((1L, "a"), (2L, "b")).toDF("id", "txt"), v1, root, 0L)
    def v1Files() = new java.io.File(s"$root/batch=0")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = v1Files()
    SchemaEvolution.appendConformed(
      Seq((3L, "c", 0.5)).toDF("id", "txt", "score"), v2, root, 1L)
    assert(v1Files() == before, "appending a v2 batch rewrote v1 files")
    val got = SchemaEvolution.readEvolved(spark, root)
      .select("id", "txt", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5))))
  }

  test("a replayed batch id overwrites only its own partition") {
    val root = graft.etl.Scratch.dir("se-replay")
    val v1 = StructType(v2.fields.take(2))
    SchemaEvolution.appendConformed(
      Seq((1L, "a")).toDF("id", "txt"), v1, root, 0L)
    SchemaEvolution.appendConformed(
      Seq((2L, "b")).toDF("id", "txt"), v1, root, 1L)
    // crash-replay of batch 1 with corrected content
    SchemaEvolution.appendConformed(
      Seq((2L, "b2")).toDF("id", "txt"), v1, root, 1L)
    val got = SchemaEvolution.readEvolved(spark, root)
      .select("id", "txt").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b2")))
  }
}
