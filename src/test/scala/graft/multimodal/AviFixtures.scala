package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Test-side RIFF-AVI writer: assembles valid (and deliberately broken)
  * AVI bytes for the [[Multimodal.AviFrameCodec]] / [[Multimodal.AviProbe]]
  * specs — grayscale planes as `00db` raw DIB (bottom-up, 4-byte stride)
  * or `00dc` BI_RLE8 chunks, with the `idx1` index in either historical
  * offset convention (absolute from file start, or relative to the `movi`
  * fourcc). */
object AviFixtures {

  def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] =
    fourcc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ body)

  /** BI_RLE8 encode a TOP-DOWN plane: rows emitted bottom-up as runs,
    * EOL after each row, EOD at the end. */
  def rle8(plane: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    var yUp = 0
    while (yUp < h) {
      val row = h - 1 - yUp
      var x = 0
      while (x < w) {
        val v = plane(row * w + x)
        var run = 1
        while (x + run < w && plane(row * w + x + run) == v && run < 255) run += 1
        out += run.toByte += v
        x += run
      }
      out += 0.toByte += 0.toByte // EOL
      yUp += 1
    }
    out += 0.toByte += 1.toByte // EOD
    out.toArray
  }

  /** Raw `00db` payload: bottom-up rows padded to a 4-byte stride. */
  def rawDb(plane: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val stride = (w + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) { // payload row y is image row h-1-y
      var x = 0
      while (x < w) { out(y * stride + x) = plane((h - 1 - y) * w + x); x += 1 }
      y += 1
    }
    out
  }

  /** Assemble a single-video-stream AVI. `frames` are (kind, payload)
    * with kind "db"|"dc"; `absoluteOffsets` picks the idx1 convention;
    * `withIndex=false` drops idx1 entirely. */
  def avi(
      w: Int, h: Int, usPerFrame: Int,
      frames: Seq[(String, Array[Byte])],
      absoluteOffsets: Boolean = false,
      withIndex: Boolean = true): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih))
    val frameChunks = frames.map { case (kind, p) => chunk(s"00$kind", p) }
    val movi = list("movi", frameChunks.flatten.toArray)
    val pre = 12 + hdrl.length // file offset of the movi LIST chunk
    val moviBase = pre + 8     // offset of the "movi" fourcc
    // per-frame chunk-header positions inside the movi body
    val positions = frameChunks.scanLeft(moviBase + 4)(_ + _.length).init
    val idxEntries = frames.zip(positions).flatMap { case ((kind, p), pos) =>
      s"00$kind".getBytes("US-ASCII") ++ le32(0x10) ++
        le32(if (absoluteOffsets) pos else pos - moviBase) ++ le32(p.length)
    }.toArray
    val idx1 = if (withIndex) chunk("idx1", idxEntries) else Array.emptyByteArray
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
}
