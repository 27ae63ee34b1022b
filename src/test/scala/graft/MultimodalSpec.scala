package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub is deterministic, normalized, and dimension-stable") {
    val bytes = Array.tabulate(256)(_.toByte)
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)  // L1 normalized
    assert(f1.forall(_ == 1.0f / 16))       // uniform bytes -> uniform hist
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("extractFeatures runs as partition batches over binary columns") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](0, 0, 0, 0)),
      Multimodal.MediaRow(2L, "audio", Array[Byte](-1, -1)),
      Multimodal.MediaRow(3L, "image", null)
    ).toDS().repartition(2)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 4 && feats(1L).feature(0) == 1.0f)
    assert(feats(2L).n_bytes == 2 && feats(2L).feature(15) == 1.0f)
    assert(feats(3L).n_bytes == 0 && feats(3L).feature.forall(_ == 0f))
  }

  test("sampleFrames explodes every-nth frame indices for videos only") {
    val rows = Seq(
      Row(1L, "video", null, Row(null, null, null, Integer.valueOf(10))),
      Row(2L, "image", null, Row(Integer.valueOf(8), Integer.valueOf(8), null, null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val sampled = Multimodal.sampleFrames(media, everyNth = 4).collect()
    assert(sampled.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 4), (1L, 8)))
  }
}
