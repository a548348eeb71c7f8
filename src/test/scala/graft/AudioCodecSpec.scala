package graft

import graft.ops.{AudioCodec, MultimodalOps}
import org.scalatest.funsuite.AnyFunSuite

/** Real javax.sound.sampled decode path: 16-bit PCM WAV round-trips
  * losslessly (exact sample sums / min / max / zero-crossings), the
  * wire bytes are a genuine RIFF container, and non-audio bytes decode
  * to None (the stub-fallback contract, mirroring ImageCodecSpec).
  */
class AudioCodecSpec extends AnyFunSuite {
  import TestSpark._

  private def expected(n: Int, seed: Long): AudioCodec.Decoded = {
    var sum = 0L; var sq = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var zc = 0; var prev = 0
    for (i <- 0 until n) {
      val s = AudioCodec.sample(i, seed)
      sum += s; sq += s.toLong * s
      mn = math.min(mn, s); mx = math.max(mx, s)
      if (i > 0 && ((prev < 0 && s > 0) || (prev > 0 && s < 0))) zc += 1
      prev = s
    }
    AudioCodec.Decoded(AudioCodec.SampleRate, n, sum, sq, mn, mx, zc)
  }

  test("WAV encode->decode is sample-exact on the fixture signal") {
    for (seed <- Seq(0L, 7L, 255L, 1000L)) {
      val n = 256 + (seed % 16).toInt * 32
      val bytes = AudioCodec.renderClip(n, seed)
      // genuine RIFF/WAVE container: magic + header + 2 bytes/sample
      assert(bytes.take(4).toSeq === "RIFF".getBytes("US-ASCII").toSeq)
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
      assert(bytes.length >= 2 * n + 44)
      assert(AudioCodec.decode(bytes).get === expected(n, seed))
    }
  }

  test("decodeSamples round-trips negatives (high-byte sign extension)") {
    val samples = Array(-2000, -1, 0, 1, 32767, -32768, 500)
    val got = AudioCodec.decodeSamples(AudioCodec.encodePcm16(samples)).get
    assert(got.toSeq === samples.toSeq)
  }

  test("non-audio bytes decode to None") {
    assert(AudioCodec.decode("hello world, not a wav".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decodeSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audioFrameEnergy emits complete frames only, energies exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(3L, 5L).toDF("doc_id")
    val out = MultimodalOps
      .audioFrameEnergy(MultimodalOps.audioFixtures(docs), frameLen = 160)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (id <- Seq(3L, 5L)) {
      val n = 256 + (id % 16).toInt * 32
      val nFrames = n / 160
      assert(out.keys.count(_._1 == id) === nFrames)
      for (f <- 0 until nFrames) {
        val e = (0 until 160).map { i =>
          val s = AudioCodec.sample(f * 160 + i, id).toLong
          s * s
        }.sum
        assert(out((id, f.toLong)) === e, s"frame $f of clip $id")
      }
    }
  }

  test("resampleAudioHalf certifies the decode->decimate->encode->decode loop") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(4L).toDF("doc_id")
    val row = MultimodalOps
      .resampleAudioHalf(MultimodalOps.audioFixtures(docs))
      .collect().head
    val n = 256 + (4 % 16) * 32
    val dec = (0 until (n + 1) / 2).map(j => AudioCodec.sample(2 * j, 4L))
    assert(row.getLong(1) === dec.length.toLong)
    assert(row.getLong(2) === dec.map(_.toLong).sum)
    assert(row.getLong(3) === dec.map(s => s.toLong * s).sum)
  }
}
