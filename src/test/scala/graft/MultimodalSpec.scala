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

  test("media features compose with similarity search end to end") {
    // media payloads from document text bytes (stand-in for real codecs);
    // feature vectors then flow through the standard ANN operator
    val docs = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
      .select($"doc_id", encode($"text", "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => Multimodal.MediaRow(id, "image", bytes) }
    val feats = Multimodal.extractFeatures(docs, dim = 16)
      .select($"media_id", $"feature")
    val top = graft.ops.Similarity.cosineTopK(
      feats, "media_id", "feature", $"media_id" < 3, k = 4)
    val rows = top.collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getDouble(2) <= 1.000001))
    // byte-histogram features of same-alphabet texts are highly similar
    assert(rows.count(_.getDouble(2) > 0.9) > 6)
  }

  test("resizeImages nearest-neighbor samples byte grids per batch") {
    val rows = Seq(
      Row(1L, "image", Array.tabulate(16)(_.toByte),
        Row(Integer.valueOf(4), Integer.valueOf(4), null, null)),
      Row(2L, "audio", Array[Byte](1, 2), Row(null, null, Integer.valueOf(8000), null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val resized = Multimodal.resizeImages(media, 2, 2).collect()
    assert(resized.length == 1) // audio row skipped
    val r = resized.head
    assert(r.width == 2 && r.height == 2)
    // 4x4 grid 0..15 sampled at (0,0),(0,2),(2,0),(2,2) -> 0,2,8,10
    assert(r.content.toSeq == Seq[Byte](0, 2, 8, 10))
    // deterministic
    assert(Multimodal.resizeStub(Array.tabulate(16)(_.toByte), 4, 4, 2, 2)
      .toSeq == Seq[Byte](0, 2, 8, 10))
  }

  test("dHash64: brightness-invariant, stable under tiny edits, 64-bit") {
    val w = 18; val h = 16
    val img = Array.tabulate(w * h)(i => ((i * 7) % 251).toByte)
    val same = Multimodal.dHash64(img, w, h)
    assert(same == Multimodal.dHash64(img.clone(), w, h))
    // uniform brightness shift preserves all pixel ORDERINGS -> same hash
    val brighter = img.map(b => math.min((b & 0xFF) + 4, 255).toByte)
    assert(Multimodal.dHash64(brighter, w, h) == same)
    // one-pixel edit flips few bits
    val edited = img.clone(); edited(40) = (edited(40) + 100).toByte
    val d = java.lang.Long.bitCount(same ^ Multimodal.dHash64(edited, w, h))
    assert(d > 0 && d <= 6, s"one-pixel edit flipped $d bits")
  }

  test("imageNearDups pairs perturbed copies, not unrelated images") {
    val w = 18; val h = 16
    val base = Array.tabulate(w * h)(i => ((i * 7) % 251).toByte)
    val nearCopy = base.clone(); nearCopy(40) = (nearCopy(40) + 100).toByte
    val unrelated = Array.tabulate(w * h)(i => ((i * i * 13 + 5) % 250).toByte)
    val rows = Seq(
      Row(1L, "image", base, Row(Integer.valueOf(w), Integer.valueOf(h), null, null)),
      Row(2L, "image", base.clone(), Row(Integer.valueOf(w), Integer.valueOf(h), null, null)),
      Row(3L, "image", nearCopy, Row(Integer.valueOf(w), Integer.valueOf(h), null, null)),
      Row(4L, "image", unrelated, Row(Integer.valueOf(w), Integer.valueOf(h), null, null)),
      Row(5L, "audio", base, Row(null, null, Integer.valueOf(8000), null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val pairs = Multimodal.imageNearDups(media, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0L) // exact copy
    assert(pairs.contains((1L, 3L)))                          // near copy
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated out
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L)) // audio skipped
  }

  test("audioEnergyFeatures: RMS per frame, silence is zero, frame count bounded") {
    val loud = Array.fill(512)(255.toByte)          // max deviation from 128
    val silent = Array.fill(512)(128.toByte)        // exactly the midpoint
    val rows = Seq(
      Row(1L, "audio", loud, Row(null, null, Integer.valueOf(8000), null)),
      Row(2L, "audio", silent, Row(null, null, Integer.valueOf(8000), null)),
      Row(3L, "image", loud, Row(Integer.valueOf(4), Integer.valueOf(4), null, null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val feats = Multimodal.audioEnergyFeatures(media, frameSize = 256)
      .collect().map(f => f.media_id -> f).toMap
    assert(!feats.contains(3L))                     // images skipped
    assert(feats(1L).n_frames == 2 && feats(2L).n_frames == 2)
    assert(feats(1L).energy.forall(e => math.abs(e - 127.0f) < 1e-3))
    assert(feats(2L).energy.forall(_ == 0f))
    // maxFrames truncates long payloads
    val one = Multimodal.audioEnergyFeatures(media, frameSize = 64, maxFrames = 3)
      .where($"media_id" === 1L).head()
    assert(one.n_frames == 3)
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
