package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A REAL video leg without third-party codecs: a minimal
  * length-prefixed frame container ("GVID") whose frames are ordinary
  * encoded images (PNG/JPEG/BMP — anything [[ImageCodec]] decodes).
  * Everything downstream of the container is the genuine pipeline —
  * frame sampling, per-frame JDK ImageIO decode, perceptual dHash,
  * banded near-dup search; only the parsing of *foreign* containers
  * (MP4/H.264 etc., for which the sandbox has no codec) remains out of
  * scope, and swapping this parser for an ffmpeg binding touches
  * nothing below it.
  *
  * Layout: magic "GVID" (4 bytes) | frameCount (int32 BE) | frames,
  * each int32 BE length + payload.
  */
object VideoContainer {

  private val Magic = 0x47564944 // "GVID"

  /** Encode image payloads as one video container (fixture builder +
    * the write side of a re-muxing pipeline). */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(_.length + 4).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(Magic).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Parse a container back to its frame payloads. None for null,
    * wrong-magic, or truncated bytes — corrupt media is a data fact,
    * not an exception. */
  def decodeFrames(content: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (content == null || content.length < 8) return None
    val buf = ByteBuffer.wrap(content)
    if (buf.getInt() != Magic) return None
    val n = buf.getInt()
    if (n < 0) return None
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i < n) {
      if (buf.remaining() < 4) return None
      val len = buf.getInt()
      if (len < 0 || buf.remaining() < len) return None
      val f = new Array[Byte](len)
      buf.get(f)
      out += f
      i += 1
    }
    Some(out.result())
  }

  /** Per-video sampled-frame perceptual hashes: every `everyNth`
    * frame (always including frame 0) is REALLY decoded (ImageIO) and
    * dHashed. Same partition-batch shape as [[Multimodal.imageHashes]]
    * — one row per sampled frame, undecodable frames/containers
    * dropped. Output: (media_id, frame_idx, phash). */
  def videoFrameHashes(media: DataFrame, everyNth: Int = 1): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    import media.sparkSession.implicits._
    media.where(col("kind") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeFrames(bytes).toSeq.flatMap { frames =>
            frames.iterator.zipWithIndex
              .filter { case (_, i) => i % everyNth == 0 }
              .flatMap { case (f, i) =>
                Multimodal.dHash64Encoded(f).map(ph => (id, i.toLong, ph))
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "phash")
  }

  /** Video near-duplicate pairs: two videos match when at least
    * `minMatchFrac` of their aligned sampled frames agree within
    * `maxHamming` bits of dHash. Candidates come from byte-band
    * buckets per (frame_idx, band) — the [[Multimodal.imageNearDups]]
    * pigeonhole, never an all-pairs frame comparison; the per-pair
    * fraction is one hash aggregation. Output:
    * (media_a < media_b, n_match, match_frac). */
  def videoNearDups(media: DataFrame, everyNth: Int = 1,
      maxHamming: Int = 4, minMatchFrac: Double = 0.5): DataFrame = {
    require(maxHamming <= 7, "8 byte-bands only guarantee recall up to hamming 7")
    val fh = videoFrameHashes(media, everyNth)
    val nFrames = fh.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"))
    val bandStructs = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("phash"), b * 8) % 256).as("bkey"))
    }
    val bands = fh.select(col("media_id"), col("frame_idx"), col("phash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("media_id"), col("frame_idx"), col("phash"),
        col("bk.band"), col("bk.bkey"))
    val a = bands.select(col("media_id").as("media_a"),
      col("frame_idx"), col("phash").as("pa"), col("band"), col("bkey"))
    val b = bands.select(col("media_id").as("media_b"),
      col("frame_idx"), col("phash").as("pb"), col("band"), col("bkey"))
    val frameMatches = a.join(b, Seq("frame_idx", "band", "bkey"))
      .where(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "frame_idx", "pa", "pb").distinct()
      .where(bit_count(col("pa").bitwiseXOR(col("pb"))) <= maxHamming)
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("n_match"))
    frameMatches
      .join(nFrames.select(col("media_id").as("media_a"),
        col("n_frames").as("__na")), "media_a")
      .join(nFrames.select(col("media_id").as("media_b"),
        col("n_frames").as("__nb")), "media_b")
      .withColumn("match_frac",
        round(col("n_match") / least(col("__na"), col("__nb")), 6))
      .where(col("match_frac") >= minMatchFrac)
      .select(col("media_a"), col("media_b"), col("n_match"),
        col("match_frac"))
  }
}
