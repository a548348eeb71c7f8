package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real JDK audio codec for the multimodal path (reference contract:
  * the embedding consumer decodes media payloads to per-item features
  * before embedding, `embedding_consumer.py:215-243` — audio is one of
  * the three media kinds the pipeline's `kind` column declares).
  *
  * `javax.sound.sampled` ships with the JDK, so WAV (RIFF/WAVE, 16-bit
  * PCM) encode+decode need zero external dependencies. PCM is lossless:
  * decoded samples equal the encoded fixture bit-for-bit, which lets a
  * DuckDB oracle certify the REAL decode path — expected sample sums
  * are a closed-form function of the generator formula, while the bytes
  * on the wire carry a genuine 44-byte RIFF header + little-endian PCM
  * frames that no byte-statistics stub could reproduce.
  */
object AudioCodec {

  /** Fixture sample rate (Hz). Small enough that per-doc clips stay in
    * the hundreds-of-samples range at test SFs.
    */
  val SampleRate = 8000

  /** Deterministic 16-bit sample i of clip `seed` — the fixture signal.
    * Also evaluated in closed form by the DuckDB oracles: the modulus
    * keeps every operand positive so Scala `%` and SQL `%` agree, and
    * the 4001-value range fits comfortably in 16-bit signed PCM.
    */
  def sample(i: Int, seed: Long): Int =
    ((i.toLong * 131 + seed * 7919) % 4001).toInt - 2000

  /** Render the deterministic signal as real 16-bit PCM mono WAV bytes
    * via the JDK writer (genuine RIFF container on the wire).
    */
  def encodePcm16(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bo = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bo)
    bo.toByteArray
  }

  /** Fixture clip for `seed`: `n` samples of the closed-form signal. */
  def renderClip(n: Int, seed: Long): Array[Byte] =
    encodePcm16(Array.tabulate(n)(i => sample(i, seed)))

  /** Decoded clip properties. Exact integer sample sums certify content
    * losslessly (PCM); `zeroCross` counts strict sign flips between
    * consecutive samples (the classic VAD/voicing feature).
    */
  final case class Decoded(
      sampleRate: Int,
      nSamples: Int,
      sSum: Long,
      sSqSum: Long,
      sMin: Int,
      sMax: Int,
      zeroCross: Int)

  /** Real JDK decode: parse the RIFF container, then read the PCM
    * frames back to signed 16-bit samples. None when the bytes are not
    * a parseable audio stream (the stub-fallback signal, mirroring
    * [[ImageCodec.decode]]).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) None
    else
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var sum = 0L
          var sq = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var zc = 0
          var prev = 0
          var i = 0
          while (i < n) {
            val lo = pcm(2 * i) & 0xff
            val hi = pcm(2 * i + 1).toInt // sign-extends the high byte
            val s = (hi << 8) | lo
            sum += s
            sq += s.toLong * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            if (i > 0 && ((prev < 0 && s > 0) || (prev > 0 && s < 0))) zc += 1
            prev = s
            i += 1
          }
          Some(Decoded(
            fmt.getSampleRate.toInt, n, sum, sq,
            if (n == 0) 0 else mn, if (n == 0) 0 else mx, zc))
        }
      } finally ais.close()
  }

  /** Decode to raw samples (for the frame-energy path). */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) None
    else
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val pcm = ais.readAllBytes()
          Some(Array.tabulate(pcm.length / 2) { i =>
            ((pcm(2 * i + 1).toInt) << 8) | (pcm(2 * i) & 0xff)
          })
        }
      } finally ais.close()
  }
}
