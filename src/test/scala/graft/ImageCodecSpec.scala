package graft

import graft.ops.{ImageCodec, MultimodalOps}
import org.scalatest.funsuite.AnyFunSuite

/** Real javax.imageio decode path: PNG round-trips losslessly, JPEG
  * preserves dimensions (content within a lossy tolerance band), and
  * non-image bytes fall back to the deterministic stub.
  */
class ImageCodecSpec extends AnyFunSuite {
  import TestSpark._

  private def expectedSums(w: Int, h: Int, seed: Long): (Long, Long) = {
    var s = 0L; var sq = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = ImageCodec.gray(x, y, seed)
      s += g; sq += g.toLong * g
    }
    (s, sq)
  }

  test("PNG encode->decode is pixel-exact on the pattern") {
    for (seed <- Seq(0L, 7L, 255L, 1000L)) {
      val w = 8 + (seed % 8).toInt * 2
      val h = 8 + ((seed / 8) % 8).toInt * 2
      val bytes = ImageCodec.encode(ImageCodec.renderPattern(w, h, seed), "png")
      // genuinely compressed PNG, not a raster dump
      assert(bytes.length < 3 * w * h + 100)
      assert(bytes.take(4).toSeq === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
      val d = ImageCodec.decode(bytes).get
      val (es, esq) = expectedSums(w, h, seed)
      assert((d.width, d.height) === (w, h))
      assert((d.pxSum, d.pxSqSum) === (es, esq))
    }
  }

  test("JPEG decode: exact dimensions, lossy content within tolerance") {
    val (w, h, seed) = (20, 14, 13L)
    val bytes = ImageCodec.encode(ImageCodec.renderPattern(w, h, seed), "jpeg")
    val d = ImageCodec.decode(bytes).get
    assert((d.width, d.height) === (w, h))
    val (es, _) = expectedSums(w, h, seed)
    val expMean = es.toDouble / (w * h)
    assert(math.abs(d.meanPx - expMean) < 16.0,
      s"jpeg mean ${d.meanPx} vs pattern mean $expMean")
  }

  test("non-image bytes decode to None and extractFeatures falls back to the stub") {
    assert(ImageCodec.decode("hello world, not an image".getBytes("UTF-8")).isEmpty)
    val row = MultimodalOps.MediaRow(5L, "text", "some document text".getBytes("UTF-8"))
    assert(MultimodalOps.decodeAny(row) === MultimodalOps.decodeStub(row))
  }

  test("extractFeatures reports REAL dimensions for real image payloads") {
    val (w, h, seed) = (16, 10, 3L)
    val png = ImageCodec.encode(ImageCodec.renderPattern(w, h, seed), "png")
    val real = MultimodalOps.decodeAny(MultimodalOps.MediaRow(1L, "image", png))
    assert((real.width, real.height) === (w, h))
    val (es, _) = expectedSums(w, h, seed)
    assert(math.abs(real.mean_byte - es.toDouble / (w * h)) < 1e-9)
    // and it is NOT what the byte-stub would have said about the bytes
    val stub = MultimodalOps.decodeStub(MultimodalOps.MediaRow(1L, "image", png))
    assert((stub.width, stub.height) !== (w, h))
  }

  test("boxHalve is the exact floor box average") {
    val img = ImageCodec.renderPattern(12, 8, 42L)
    val half = ImageCodec.boxHalve(img)
    assert((half.getWidth, half.getHeight) === (6, 4))
    for (y <- 0 until 4; x <- 0 until 6) {
      val want = (ImageCodec.gray(2 * x, 2 * y, 42L) +
        ImageCodec.gray(2 * x + 1, 2 * y, 42L) +
        ImageCodec.gray(2 * x, 2 * y + 1, 42L) +
        ImageCodec.gray(2 * x + 1, 2 * y + 1, 42L)) / 4
      assert((half.getRGB(x, y) & 0xff) === want)
    }
  }

  test("fixture/decode/resize queries run end-to-end on the documents table") {
    val fixtures = MultimodalOps.imageFixtures(Tables.documents(spark, sf))
    val n = Tables.documents(spark, sf).count()
    val decoded = MultimodalOps.decodeImages(fixtures)
    assert(decoded.count() === n) // every payload is a decodable image
    val resized = MultimodalOps.resizeImagesHalf(
      fixtures.where(org.apache.spark.sql.functions.col("fmt") === "png"))
    val rows = resized.collect()
    assert(rows.nonEmpty)
    // halved dims relative to the generator formula
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("width") === (8 + (id % 8) * 2) / 2)
      assert(r.getAs[Long]("height") === (8 + ((id / 8) % 8) * 2) / 2)
    }
  }

  test("animated GIF encode->frame decode is lossless and frame-exact") {
    for (seed <- Seq(0L, 7L, 255L)) {
      val (w, h, nf) = (10, 8, (2 + seed % 3).toInt)
      val bytes = ImageCodec.encodeGif(
        (0 until nf).map(f => ImageCodec.renderFrame(w, h, seed, f)))
      // a real GIF89a stream, not a raster dump
      assert(bytes.take(6).map(_.toChar).mkString === "GIF89a")
      val frames = ImageCodec.decodeFrames(bytes)
      assert(frames.length === nf)
      frames.zipWithIndex.foreach { case (d, f) =>
        var s = 0L; var sq = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val g = ImageCodec.grayFrame(x, y, seed, f)
          s += g; sq += g.toLong * g
        }
        assert((d.width, d.height) === (w, h), s"frame $f")
        assert((d.pxSum, d.pxSqSum) === (s, sq), s"frame $f")
      }
    }
    // non-GIF bytes: empty, not a throw
    assert(ImageCodec.decodeFrames("not a gif".getBytes).isEmpty)
  }
}
