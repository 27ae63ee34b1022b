package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE leg is fully real: encoded PNG/JPEG/BMP/GIF payloads are
  * decoded with the JDK's `javax.imageio` ([[ImageCodec]]), resampled
  * with an area-average box filter, perceptually hashed, and
  * re-encoded — no external codec dependency. The AUDIO leg is real
  * for the JDK's built-in containers (WAV/AIFF/AU via
  * [[AudioCodec]] — `javax.sound.sampled`). The VIDEO leg is real for
  * the [[VideoContainer]] frame container (sampling, per-frame ImageIO
  * decode, dHash, banded near-dup) — only foreign codec formats
  * (MP4/H.264, compressed audio) fall back to the deterministic STUB
  * paths ([[decodeStub]]/[[resizeStub]]), which keep the plumbing —
  * schema, partitioning, batch iteration with one codec handle per
  * partition, feature-vector output shape — exercised with
  * reproducible values; swap the stub for JavaCV/ffmpeg bindings
  * without touching any of it.
  */
object Multimodal {

  /** Canonical media-file schema: path, kind (image|audio|video),
    * payload, and per-kind metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeature(media_id: Long, kind: String,
    n_bytes: Long, feature: Array[Float])

  /** STUB decode: a real implementation decodes the media and extracts
    * model features; this deterministic stand-in is an L1-normalized
    * 16-bin byte histogram, so tests exercise identical plumbing with
    * reproducible values. */
  def decodeStub(content: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xFF) * dim / 256) += 1f
        i += 1
      }
      if (content.length > 0) {
        var j = 0
        while (j < dim) { hist(j) /= content.length.toFloat; j += 1 }
      }
    }
    hist
  }

  final case class ResizedMedia(media_id: Long, kind: String,
    width: Int, height: Int, content: Array[Byte])

  /** STUB resize: treats the payload as a row-major byte grid and
    * nearest-neighbor samples it to (w x h). A real implementation
    * decodes, resamples, and re-encodes via a codec; the plumbing
    * (batch iteration, output schema, deterministic behavior) is what
    * this exercises. */
  def resizeStub(content: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    if (content != null && srcW > 0 && srcH > 0) {
      var y = 0
      while (y < dstH) {
        val sy = math.min(y * srcH / dstH, srcH - 1)
        var x = 0
        while (x < dstW) {
          val sx = math.min(x * srcW / dstW, srcW - 1)
          val idx = sy * srcW + sx
          out(y * dstW + x) =
            if (idx < content.length) content(idx) else 0
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Batch image resize over binary media columns (partition-batched
    * like [[extractFeatures]]). Encoded payloads are REALLY decoded
    * ([[ImageCodec.decodeGray]]), box-filter resampled, and re-encoded
    * as lossless PNG, so outputs are themselves valid image payloads.
    * Undecodable payloads with metadata dims fall back to the raw-grid
    * [[resizeStub]] (content interpreted as a row-major grayscale
    * grid); rows that are neither decodable nor dimensioned are
    * skipped. */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.where(col("kind") === "image")
      .select(col("media_id"), col("kind"), col("meta.width").as("w"),
        col("meta.height").as("h"), col("content"))
      .as[(Long, String, Option[Int], Option[Int], Array[Byte])]
      .mapPartitions { rows =>
        // codec state (ImageIO reader registry) is JVM-wide; the
        // batch shape still amortizes any per-partition init
        rows.flatMap { case (id, kind, w, h, bytes) =>
          ImageCodec.decodeGray(bytes) match {
            case Some(g) =>
              val px = ImageCodec.resampleGray(g.pixels, g.width, g.height, dstW, dstH)
              Some(ResizedMedia(id, kind, dstW, dstH,
                ImageCodec.encodePng(px, dstW, dstH)))
            case None => (w, h) match {
              case (Some(sw), Some(sh)) =>
                Some(ResizedMedia(id, kind, dstW, dstH,
                  resizeStub(bytes, sw, sh, dstW, dstH)))
              case _ => None
            }
          }
        }
      }
  }

  /** Batch feature extraction: mapPartitions so any per-executor codec
    * is initialized once per partition, not once per row (the Scala
    * analog of a pandas-batch UDF). Pure iterator-to-iterator — safe
    * for spilling, no partition materialization. Image payloads that
    * decode via [[ImageCodec]] yield a real-pixel grayscale histogram;
    * everything else (audio/video, undecodable bytes) falls back to
    * the deterministic [[decodeStub]] byte histogram. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16)
      : Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val feature =
          if (r.kind == "image")
            ImageCodec.decodeGray(r.content)
              .map(g => ImageCodec.grayHistogram(g, dim))
              .getOrElse(decodeStub(r.content, dim))
          else decodeStub(r.content, dim)
        MediaFeature(r.media_id, r.kind,
          if (r.content == null) 0L else r.content.length.toLong,
          feature)
      }
    }
  }

  /** Frame sampling plan for video rows: every `everyNth` frame index
    * up to `meta.n_frames` — pure plan (explode of a sequence), the
    * decode of each sampled frame happens downstream in
    * [[extractFeatures]]-style batches. */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame =
    media.where(col("kind") === "video" && col("meta.n_frames").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(everyNth))).as("frame_idx"))

  final case class AudioFrames(media_id: Long, n_frames: Int,
    energy: Array[Float])

  /** Frame-level audio energy features. Payloads that REALLY decode
    * via [[AudioCodec.decodePcm]] (WAV/AIFF/AU — the JDK's built-in
    * readers) are cut into `frameSize`-SAMPLE frames of the decoded
    * mono PCM and each frame yields its RMS amplitude in [0, 1].
    * Undecodable payloads (compressed codecs, raw fixtures) fall back
    * to the byte-stream stub: `frameSize`-byte frames, RMS of bytes
    * centered at 128 — the documented codec swap-point. Output vectors
    * feed the standard ANN/near-dup operators exactly like image
    * features — the audio leg of the multimodal path. */
  def audioEnergyFeatures(media: DataFrame, frameSize: Int = 256,
      maxFrames: Int = 64): Dataset[AudioFrames] = {
    import media.sparkSession.implicits._
    require(frameSize > 0 && maxFrames > 0)
    media.where(col("kind") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          AudioCodec.decodePcm(bytes) match {
            case Some(pcm) =>
              val nAll = (pcm.samples.length + frameSize - 1) / frameSize
              val n = math.min(nAll, maxFrames)
              val out = new Array[Float](n)
              var f = 0
              while (f < n) {
                val start = f * frameSize
                val end = math.min(start + frameSize, pcm.samples.length)
                var sum = 0.0
                var i = start
                while (i < end) {
                  sum += pcm.samples(i).toDouble * pcm.samples(i)
                  i += 1
                }
                out(f) = if (end > start)
                  math.sqrt(sum / (end - start)).toFloat else 0f
                f += 1
              }
              AudioFrames(id, n, out)
            case None =>
              val b = if (bytes == null) Array.emptyByteArray else bytes
              val nAll = (b.length + frameSize - 1) / frameSize
              val n = math.min(nAll, maxFrames)
              val out = new Array[Float](n)
              var f = 0
              while (f < n) {
                val start = f * frameSize
                val end = math.min(start + frameSize, b.length)
                var sum = 0.0
                var i = start
                while (i < end) {
                  val centered = (b(i) & 0xFF) - 128.0
                  sum += centered * centered
                  i += 1
                }
                out(f) = if (end > start)
                  math.sqrt(sum / (end - start)).toFloat else 0f
                f += 1
              }
              AudioFrames(id, n, out)
          }
        }
      }
  }

  /** 64-bit perceptual difference hash (dHash) of a raw pixel grid:
    * area-average downsample to 9x8 ([[ImageCodec.resampleGray]] —
    * every source pixel is integrated, no aliasing), then bit (y*8+x)
    * is set iff pixel[y][x+1] > pixel[y][x]. Robust to uniform
    * brightness/contrast shifts; small local edits flip few bits, so
    * Hamming distance is the image near-dup metric (the image analog
    * of [[graft.ops.Dedup.simhash]] for text). */
  def dHash64(content: Array[Byte], srcW: Int, srcH: Int): Long = {
    val g = ImageCodec.resampleGray(content, srcW, srcH, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((g(y * 9 + x + 1) & 0xFF) > (g(y * 9 + x) & 0xFF))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** dHash of an ENCODED image payload: real ImageIO decode to
    * grayscale, then [[dHash64]]. None if the bytes don't decode. */
  def dHash64Encoded(content: Array[Byte]): Option[Long] =
    ImageCodec.decodeGray(content)
      .map(g => dHash64(g.pixels, g.width, g.height))

  /** Per-image perceptual hashes: media_id, phash. Encoded payloads
    * are really decoded; undecodable payloads with metadata dims are
    * hashed as raw grayscale grids (fixture path); rows with neither
    * are dropped. */
  def imageHashes(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.where(col("kind") === "image")
      .select(col("media_id"), col("meta.width").as("w"),
        col("meta.height").as("h"), col("content"))
      .as[(Long, Option[Int], Option[Int], Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, w, h, bytes) =>
          dHash64Encoded(bytes) match {
            case Some(ph) => Some((id, ph))
            case None => (w, h) match {
              case (Some(sw), Some(sh)) => Some((id, dHash64(bytes, sw, sh)))
              case _ => None
            }
          }
        }
      }
      .toDF("media_id", "phash")
  }

  /** Intensity-grid image embeddings: decode → resample to
    * `grid`×`grid` grayscale → L2-normalized float vector (dim
    * grid²). The bridge from media payloads into the vector ops —
    * the output column composes directly with
    * [[graft.ops.Similarity]] (cosine top-k, sign-LSH, IVF) and the
    * int8 quantizer. Same partition-batch decode shape (and the same
    * fixture fallback) as [[imageHashes]]; constant images embed as
    * the uniform unit vector rather than 0/0. */
  def imageEmbeddings(media: DataFrame, grid: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    require(grid > 0, "grid must be positive")
    def embed(pixels: Array[Byte], w: Int, h: Int): Array[Float] = {
      val g = ImageCodec.resampleGray(pixels, w, h, grid, grid)
      val v = new Array[Float](grid * grid)
      var i = 0
      while (i < v.length) { v(i) = (g(i) & 0xFF).toFloat; i += 1 }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (norm > 0) {
        var j = 0
        while (j < v.length) { v(j) = (v(j) / norm).toFloat; j += 1 }
        v
      } else Array.fill(v.length)((1.0 / math.sqrt(v.length)).toFloat)
    }
    media.where(col("kind") === "image")
      .select(col("media_id"), col("meta.width").as("w"),
        col("meta.height").as("h"), col("content"))
      .as[(Long, Option[Int], Option[Int], Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, w, h, bytes) =>
          ImageCodec.decodeGray(bytes) match {
            case Some(g) => Some((id, embed(g.pixels, g.width, g.height)))
            case None => (w, h) match {
              case (Some(sw), Some(sh)) => Some((id, embed(bytes, sw, sh)))
              case _ => None
            }
          }
        }
      }
      .toDF("media_id", "embedding")
  }

  /** Deterministic planted media fixture for the END-TO-END oracle
    * gate (q151): 16 base "scenes" (64×48 grayscale, pure integer
    * arithmetic — no floating point, no RNG, so the PNG bytes and
    * every downstream hash are bit-stable across JVMs/platforms),
    * REALLY encoded as PNG; 6 planted near-dups (a brightened
    * rectangle over bases 0–5 — small enough to stay within a few
    * dHash bits); one undecodable payload with metadata dims (the
    * documented raw-grid fallback path) and one audio row (filtered
    * out). The pipeline under gate is the real one: ImageIO decode →
    * area-average resample → dHash64 → byte-band bucket join; the
    * DuckDB oracle replays the pairing over the frozen hash values.
    * sfDir-independent by design so one oracle serves every scale. */
  def plantedMediaFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val w = 64; val h = 48
    def basePixels(seed: Int): Array[Byte] = {
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // smooth per-seed ramps + a coarse checker, all integral
          val v = (x * (seed % 5 + 1) * 3 + y * (seed % 7 + 1) * 2 +
            ((x / 8 + y / 8 + seed) % 2) * 40 + seed * 11) % 256
          px(y * w + x) = v.toByte
          x += 1
        }
        y += 1
      }
      px
    }
    def brightened(base: Array[Byte]): Array[Byte] = {
      val px = base.clone()
      var y = 8
      while (y < 20) {
        var x = 12
        while (x < 30) {
          val v = math.min(255, (px(y * w + x) & 0xFF) + 12)
          px(y * w + x) = v.toByte
          x += 1
        }
        y += 1
      }
      px
    }
    val rows = new scala.collection.mutable.ArrayBuffer[Row]()
    def meta(mw: Integer, mh: Integer): Row = Row(mw, mh, null, null)
    (0 until 16).foreach { i =>
      rows += Row(i.toLong, "image",
        ImageCodec.encodePng(basePixels(i), w, h), meta(null, null))
    }
    (0 until 6).foreach { i =>
      rows += Row(100L + i, "image",
        ImageCodec.encodePng(brightened(basePixels(i)), w, h),
        meta(null, null))
    }
    // undecodable bytes + meta dims: exercises the raw-grid fallback
    rows += Row(200L, "image", basePixels(3), meta(w, h))
    // audio payload: must be filtered out by the image pipeline
    rows += Row(300L, "audio", Array[Byte](1, 2, 3), meta(null, null))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*), MediaSchema)
  }

  /** Image near-duplicate pairs within a Hamming radius over the
    * 64-bit dHash, found by byte-band bucketing exactly like
    * [[graft.ops.Dedup.simhashNearDups]]: 8 bands x 8 bits, pigeonhole
    * guarantees any pair with hamming <= 7 shares an unchanged band;
    * candidates pair only inside buckets, popcount verifies.
    * Output: media_a < media_b, hamming. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 4): DataFrame = {
    require(maxHamming <= 7, "8 byte-bands only guarantee recall up to hamming 7")
    val sig = imageHashes(media)
    val bandStructs = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("phash"), b * 8) % 256).as("bkey"))
    }
    val bands = sig.select(col("media_id"), col("phash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("media_id"), col("phash"), col("bk.band"), col("bk.bkey"))
    val a = bands.select(col("media_id").as("media_a"),
      col("phash").as("pa"), col("band"), col("bkey"))
    val b = bands.select(col("media_id").as("media_b"),
      col("phash").as("pb"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .where(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "pa", "pb").distinct()
      .select(col("media_a"), col("media_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
