package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio decode/encode on the JDK's built-in `javax.sound.sampled`
  * readers (WAV/AIFF/AU containers, PCM + a-law/mu-law encodings) — no
  * external codec dependency, same move as [[ImageCodec]] for images.
  * This is the "audio" leg of the multimodal path: encoded payload
  * bytes -> mono float PCM -> frame features ([[Multimodal
  * .audioEnergyFeatures]]) -> the standard ANN/near-dup operators.
  *
  * Compressed codecs (MP3/AAC/Opus) are not in the JDK; payloads in
  * those formats return None and the caller falls back to the
  * documented stub path — swap in a JavaCV/ffmpeg binding at the same
  * seam without touching the plumbing.
  *
  * Executor-side and allocation-bounded: in-memory streams only, one
  * payload decoded at a time, integer sample extraction so results are
  * bit-deterministic across JVMs for PCM inputs.
  */
object AudioCodec {

  /** Decoded audio: channel-averaged mono samples in [-1, 1]. */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** Decode encoded audio bytes to mono float PCM. The container's
    * stream is normalized to 16-bit signed little-endian PCM at its
    * native rate and channel count, then channels are averaged.
    * Returns None for null, empty, or undecodable payloads — corrupt
    * media is a data fact at 100 TB, not an exception. */
  def decodePcm(content: Array[Byte]): Option[PcmAudio] = {
    if (content == null || content.isEmpty) return None
    var in: AudioInputStream = null
    try {
      in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm =
        if (src.matches(target)) in
        else AudioSystem.getAudioInputStream(target, in)
      val bytes = pcm.readAllBytes()
      val ch = target.getChannels
      val nFrames = bytes.length / (2 * ch)
      val out = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var sum = 0f
        var c = 0
        while (c < ch) {
          val idx = (f * ch + c) * 2
          val s = (((bytes(idx) & 0xFF) | (bytes(idx + 1) << 8)).toShort)
          sum += s / 32768f
          c += 1
        }
        out(f) = sum / ch
        f += 1
      }
      Some(PcmAudio(math.round(src.getSampleRate), ch, out))
    } catch {
      case _: Exception => None
    } finally {
      if (in != null) { try in.close() catch { case _: Exception => () } }
    }
  }

  /** Encode mono float samples ([-1, 1], clamped) as a 16-bit PCM WAV
    * payload — decode(encode(s)) round-trips within one quantization
    * step, so generated fixtures and re-encoded outputs are themselves
    * valid media payloads. */
  def encodeWav(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val clamped = math.max(-1f, math.min(1f, samples(i)))
      val s = math.round(clamped * 32767f).toShort
      bytes(i * 2) = (s & 0xFF).toByte
      bytes(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
