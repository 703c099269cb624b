package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled PNG/JPEG/GIF/WebP fixtures for the image probes —
  * shared with MediaFuzzSpec's mangling corpus. */
object ImageFixtures {
  def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def le24(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)

  def png(w: Long, h: Long): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0 /* crc unchecked */)

  /** JPEG: SOI, an APP0 segment, a DQT segment, then SOF0 with dims. */
  def jpeg(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++ "JFIF".getBytes ++
      Array.fill(10)(0.toByte) ++
      Array(0xff, 0xdb).map(_.toByte) ++ be16(6) ++ Array.fill(4)(1.toByte) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++ Array(8.toByte) ++
      be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0)

  def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0)

  def webpX(w: Int, h: Int): Array[Byte] = {
    val body = "WEBP".getBytes ++ "VP8X".getBytes ++ be32(10).reverse ++
      Array.fill(4)(0.toByte) ++ le24(w - 1) ++ le24(h - 1)
    "RIFF".getBytes ++ be32(body.length).reverse ++ body
  }

  def webpL(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    val body = "WEBP".getBytes ++ "VP8L".getBytes ++ be32(5).reverse ++
      Array(0x2f.toByte) ++
      Array(bits & 0xff, (bits >> 8) & 0xff, (bits >> 16) & 0xff,
        (bits >> 24) & 0xff).map(_.toByte)
    "RIFF".getBytes ++ be32(body.length).reverse ++ body
  }

  def webpLossy(w: Int, h: Int): Array[Byte] = {
    val body = "WEBP".getBytes ++ "VP8 ".getBytes ++ be32(12).reverse ++
      Array.fill(3)(0.toByte) ++ Array(0x9d, 0x01, 0x2a).map(_.toByte) ++
      le16(w) ++ le16(h) ++ Array.fill(2)(0.toByte)
    "RIFF".getBytes ++ be32(body.length).reverse ++ body
  }

  def le32(v: Int): Array[Byte] = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)

  def bmp(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++ // file hdr
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++
      Array.fill(24)(0.toByte)

  /** TIFF with the requested endianness: IFD at 8, entries for
    * ImageWidth (SHORT) and ImageLength (LONG). */
  def tiff(w: Int, h: Int, le: Boolean): Array[Byte] = {
    def w16(v: Int) = if (le) le16(v) else be16(v)
    def w32(v: Int) = if (le) le32(v) else be32(v.toLong)
    def entry(tag: Int, typ: Int, value: Array[Byte]) =
      w16(tag) ++ w16(typ) ++ w32(1) ++ value
    (if (le) "II".getBytes else "MM".getBytes) ++ w16(42) ++ w32(8) ++
      w16(2) ++
      entry(256, 3, w16(w) ++ w16(0)) ++ // SHORT width, padded
      entry(257, 4, w32(h)) ++           // LONG height
      w32(0)
  }

  val pngFx: Array[Byte] = png(640, 480)
  val jpegFx: Array[Byte] = jpeg(800, 600)
  val gifFx: Array[Byte] = gif(32, 24)
  val webpFx: Array[Byte] = webpX(1024, 768)
  val bmpFx: Array[Byte] = bmp(160, 120)
  val tiffFx: Array[Byte] = tiff(2048, 1536, le = true)
}

class ImageProbeSpec extends AnyFunSuite {
  import ImageFixtures._
  import Multimodal.{GifProbe, JpegProbe, PngProbe, SniffProbe, WebpProbe}

  test("png: IHDR dims; truncation and wrong-first-chunk poison") {
    val m = PngProbe.probe(pngFx)
    assert(m === Multimodal.ProbedMeta(0L, Some("png"), Some(640), Some(480), None))
    assert(PngProbe.probe(pngFx.take(20)).format === None)
    val notIhdr = pngFx.clone(); notIhdr(12) = 'X'
    assert(PngProbe.probe(notIhdr).format === None)
    // zero dims poison
    assert(PngProbe.probe(png(0, 480)).format === None)
  }

  test("jpeg: marker walk past APP0/DQT to SOF0; malformed walks poison") {
    val m = JpegProbe.probe(jpegFx)
    assert(m === Multimodal.ProbedMeta(0L, Some("jpeg"), Some(800), Some(600), None))
    // progressive SOF2 counts as a frame header too
    val prog = jpegFx.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xc0 &&
      i > 0 && (prog(i - 1) & 0xff) == 0xff).get
    prog(sof) = 0xc2.toByte
    assert(JpegProbe.probe(prog).width === Some(800))
    // DHT (0xc4) is NOT a frame header: a file ending after one is poison
    val dht = Array(0xff, 0xd8, 0xff, 0xc4).map(_.toByte) ++
      ImageFixtures.be16(4) ++ Array.fill(2)(0.toByte)
    assert(JpegProbe.probe(dht).format === None)
    // truncated inside a segment, or EOI before SOF
    assert(JpegProbe.probe(jpegFx.take(8)).format === None)
    assert(JpegProbe.probe(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).format === None)
  }

  test("gif: 87a/89a logical-screen dims, little-endian") {
    assert(GifProbe.probe(gifFx) ===
      Multimodal.ProbedMeta(0L, Some("gif"), Some(32), Some(24), None))
    val g87 = gifFx.clone(); g87(4) = '7'
    assert(GifProbe.probe(g87).format === Some("gif"))
    assert(GifProbe.probe("GIF90a1234".getBytes).format === None)
  }

  test("webp: VP8X extended, VP8L lossless, VP8 lossy layouts") {
    assert(WebpProbe.probe(webpFx) ===
      Multimodal.ProbedMeta(0L, Some("webp"), Some(1024), Some(768), None))
    assert(WebpProbe.probe(webpL(333, 77)) ===
      Multimodal.ProbedMeta(0L, Some("webp"), Some(333), Some(77), None))
    assert(WebpProbe.probe(webpLossy(320, 240)) ===
      Multimodal.ProbedMeta(0L, Some("webp"), Some(320), Some(240), None))
    // lossy start code missing -> poison
    val bad = webpLossy(320, 240); bad(23) = 0
    assert(WebpProbe.probe(bad).format === None)
  }

  test("bmp: LE dims, top-down negative height reported as magnitude") {
    assert(Multimodal.BmpProbe.probe(bmpFx) ===
      Multimodal.ProbedMeta(0L, Some("bmp"), Some(160), Some(120), None))
    assert(Multimodal.BmpProbe.probe(bmp(160, -120)).height === Some(120))
    // core-header (hdrSize < 40) variants are not probed; junk poisons
    assert(Multimodal.BmpProbe.probe("BMW car listing".getBytes).format === None)
    assert(Multimodal.BmpProbe.probe(bmpFx.take(20)).format === None)
  }

  test("tiff: both endiannesses, SHORT and LONG dim entries, poisons") {
    assert(Multimodal.TiffProbe.probe(tiffFx) ===
      Multimodal.ProbedMeta(0L, Some("tiff"), Some(2048), Some(1536), None))
    assert(Multimodal.TiffProbe.probe(tiff(31, 17, le = false)) ===
      Multimodal.ProbedMeta(0L, Some("tiff"), Some(31), Some(17), None))
    // text starting with the endianness marker is not a tiff (magic 42)
    assert(Multimodal.TiffProbe.probe("IIx and more text".getBytes).format === None)
    // IFD offset past EOF, truncated entry table
    assert(Multimodal.TiffProbe.probe(tiffFx.take(10)).format === None)
    assert(Multimodal.TiffProbe.probe(tiffFx.dropRight(20)).format === None)
  }

  test("SniffProbe dispatches all six image magics") {
    assert(SniffProbe.probe(pngFx).format === Some("png"))
    assert(SniffProbe.probe(jpegFx).format === Some("jpeg"))
    assert(SniffProbe.probe(gifFx).format === Some("gif"))
    assert(SniffProbe.probe(webpFx).format === Some("webp"))
    assert(SniffProbe.probe(bmpFx).format === Some("bmp"))
    assert(SniffProbe.probe(tiffFx).format === Some("tiff"))
    assert(SniffProbe.probe(tiff(5, 5, le = false)).format === Some("tiff"))
    // RIFF dispatch stays unambiguous: WAVE/AVI keep their probes
    assert(SniffProbe.probe(Mp4Fixtures.mp4).format === Some("mp4"))
  }
}
