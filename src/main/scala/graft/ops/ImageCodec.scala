package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real JDK image codec for the multimodal path (reference contract:
  * the embedding consumer decodes media payloads to per-item properties
  * before feature extraction, `embedding_consumer.py:215-243`).
  *
  * `javax.imageio` ships with the JDK, so PNG/JPEG encode+decode need
  * zero external dependencies. PNG is lossless: a decoded raster equals
  * the encoded pattern bit-for-bit, which lets an SQL oracle certify the
  * REAL decode path — the expected pixel sums are a closed-form function
  * of the generator seed, while the bytes on the wire are genuinely
  * DEFLATE-compressed PNG that no byte-statistics stub could reproduce.
  * JPEG is lossy: only its dimensions are certified exactly; pixel
  * content is spec-checked within a tolerance band instead.
  */
object ImageCodec {

  ImageIO.setUseCache(false) // keep decode heap-only: no temp-file cache

  /** Deterministic gray value of pixel (x, y) under `seed` — the fixture
    * pattern. Also evaluated in closed form by the DuckDB oracles.
    */
  def gray(x: Int, y: Int, seed: Long): Int =
    ((x.toLong * 31 + y.toLong * 17 + seed * 7) % 256).toInt

  /** Render the deterministic gray pattern as a real raster image. */
  def renderPattern(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = gray(x, y, seed)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode via the JDK writer; `fmt` is an ImageIO format name
    * ("png", "jpeg").
    */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bo), s"no ImageIO writer for format $fmt")
    bo.toByteArray
  }

  /** Decoded image properties: exact integer pixel sums (of the blue
    * channel — the fixtures are gray, all channels equal) certify
    * content losslessly for PNG.
    */
  final case class Decoded(
      width: Int,
      height: Int,
      pxSum: Long,
      pxSqSum: Long,
      nibbleHist: Array[Long]) {
    def meanPx: Double =
      if (width * height == 0) 0.0 else pxSum.toDouble / (width * height)

    /** Shannon entropy over 16 gray-value buckets — the raster analogue
      * of [[MultimodalOps.decodeStub]]'s byte-histogram proxy.
      */
    def entropyProxy: Double = {
      val n = width.toLong * height
      if (n == 0) 0.0
      else -nibbleHist.filter(_ > 0).map { c =>
        val p = c.toDouble / n
        p * math.log(p)
      }.sum
    }
  }

  /** Real ImageIO decode. None when the bytes are not a decodable image
    * (ImageIO probes magic bytes — arbitrary binary returns null fast),
    * which is the stub-fallback signal in [[MultimodalOps]].
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None else Some(stats(img))
  }

  private def stats(img: BufferedImage): Decoded = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var sq = 0L
    val hist = new Array[Long](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = img.getRGB(x, y) & 0xff
        sum += g
        sq += g.toLong * g
        hist(g >> 4) += 1
        x += 1
      }
      y += 1
    }
    Decoded(w, h, sum, sq, hist)
  }

  /** Frame-f gray value of pixel (x, y) under `seed` — the animated
    * fixture pattern. The per-frame `53·f` term makes every frame
    * distinct, so a decoder that reads only the first frame (or
    * composites frames) cannot pass the oracle.
    */
  def grayFrame(x: Int, y: Int, seed: Long, frame: Int): Int =
    ((x.toLong * 31 + y.toLong * 17 + seed * 7 + frame.toLong * 53) % 256).toInt

  /** Render one animation frame on an INDEXED raster with an identity
    * 256-level gray palette. GIF is palette-based; an exact gray
    * palette makes the encode LOSSLESS, which is what lets a closed-form
    * SQL oracle certify the real multi-frame decode.
    */
  def renderFrame(w: Int, h: Int, seed: Long, frame: Int): BufferedImage = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, grayFrame(x, y, seed, frame))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode an animated GIF (one image stream, N full frames) with the
    * JDK's sequence writer — real multi-frame media bytes, no external
    * dependency.
    */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bo = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bo)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bo.toByteArray
  }

  /** Real multi-frame GIF decode: every frame's exact pixel statistics,
    * in stream order. The gray value is read through the palette via
    * `getRGB` (palette index order is writer-defined; the COLOR is the
    * contract). Returns Nil for undecodable bytes.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[Decoded] = {
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Nil
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map(i => stats(reader.read(i)))
    } catch {
      case _: Exception => Nil
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Exact 2×2 box-average downsample (floor division) — a REAL resize
    * over a real decoded raster with deterministic integer math, so the
    * oracle can recompute every output pixel from the generator formula.
    * Requires even dimensions (the fixtures guarantee it).
    */
  def boxHalve(img: BufferedImage): BufferedImage = {
    val ow = img.getWidth / 2
    val oh = img.getHeight / 2
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val g = ((img.getRGB(2 * x, 2 * y) & 0xff) +
          (img.getRGB(2 * x + 1, 2 * y) & 0xff) +
          (img.getRGB(2 * x, 2 * y + 1) & 0xff) +
          (img.getRGB(2 * x + 1, 2 * y + 1) & 0xff)) / 4
        out.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    out
  }
}
