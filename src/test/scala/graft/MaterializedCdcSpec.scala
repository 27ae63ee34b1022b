package graft

import graft.etl.MaterializedCdc

class MaterializedCdcSpec extends SparkSpec {
  import spark.implicits._

  test("incremental state equals one-shot apply, incl. deletes") {
    val dir = java.nio.file.Files.createTempDirectory("matcdc").toString
    val b1 = Seq(
      ("k1", 1L, "I", 10.0), ("k2", 1L, "I", 20.0), ("k3", 1L, "I", 30.0))
      .toDF("k", "seq", "op", "v")
    val b2 = Seq(
      ("k1", 2L, "U", 11.0),          // update
      ("k2", 2L, "D", 0.0),           // delete
      ("k3", 0L, "U", 99.0),          // OLDER than state: must lose
      ("k4", 2L, "I", 40.0))          // new key
      .toDF("k", "seq", "op", "v")
    MaterializedCdc.create(b1, "k", Seq("seq"), "op", Seq("v"),
      s"$dir/st", nBuckets = 4)
    MaterializedCdc.refresh(spark, s"$dir/st", b2, "k", Seq("seq"),
      "op", Seq("v"), nBuckets = 4)
    val got = MaterializedCdc.read(spark, s"$dir/st", "op", "D")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got == Map("k1" -> ((2L, 11.0)), "k3" -> ((1L, 30.0)),
      "k4" -> ((2L, 40.0))), got.toString)
    // the tombstone persists in raw state (it must keep suppressing
    // k2 and winning future merges against stale events)
    assert(spark.read.parquet(s"$dir/st")
      .where($"k" === "k2").count() == 1)
    // a later re-insert resurrects the key through the tombstone
    val b3 = Seq(("k2", 3L, "I", 21.0)).toDF("k", "seq", "op", "v")
    MaterializedCdc.refresh(spark, s"$dir/st", b3, "k", Seq("seq"),
      "op", Seq("v"), nBuckets = 4)
    val again = MaterializedCdc.read(spark, s"$dir/st", "op", "D")
      .collect().map(r => r.getString(0)).toSet
    assert(again == Set("k1", "k2", "k3", "k4"))
  }

  test("batch boundaries do not matter (associativity)") {
    val rnd = new scala.util.Random(3)
    val log = (1 to 300).map { i =>
      ("k" + rnd.nextInt(20), i.toLong,
        Seq("I", "U", "D")(rnd.nextInt(3)), rnd.nextInt(100).toDouble)
    }
    def runChunks(sizes: Seq[Int]): Map[String, (Long, Double)] = {
      val dir = java.nio.file.Files.createTempDirectory("matcdc").toString
      val chunks = sizes.foldLeft((log, Seq.empty[Seq[(String, Long, String, Double)]])) {
        case ((rest, acc), n) => (rest.drop(n), acc :+ rest.take(n))
      }._2
      MaterializedCdc.create(chunks.head.toDF("k", "seq", "op", "v"),
        "k", Seq("seq"), "op", Seq("v"), s"$dir/st", 8)
      chunks.tail.foreach(c => MaterializedCdc.refresh(spark, s"$dir/st",
        c.toDF("k", "seq", "op", "v"), "k", Seq("seq"), "op", Seq("v"), 8))
      MaterializedCdc.read(spark, s"$dir/st", "op", "D")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(3)))).toMap
    }
    val oneShot = runChunks(Seq(300))
    val uneven = runChunks(Seq(7, 150, 3, 140))
    assert(oneShot == uneven)
  }
}
