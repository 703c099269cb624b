package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import AviFixtures._

/** The AVI index-table seek contract: variable-size RLE8 frames make
  * frame positions unknowable without the `idx1` index, so — unlike
  * Y4M's marker walk — every seek resolves through one 16-byte index
  * entry and touches payload only at the target. */
class AviSpec extends SparkSpec {

  // 4x4 at 10 fps (100 ms/frame), four frames of deliberately DIFFERENT
  // encoded sizes: solid RLE (short), column-gradient raw DIB, and a
  // row-gradient RLE — index required, offset arithmetic impossible
  private val w = 4; private val h = 4
  private def solid(v: Int) = Array.fill(w * h)(v.toByte)
  private val colGrad = // left half dark, right half bright (raster order)
    Array.tabulate(w * h)(k => if (k % w < w / 2) 0x10.toByte else 0xE0.toByte)
  private val rowGrad = // top half dark, bottom half bright — proves the
    Array.tabulate(w * h)(k => if (k / w < h / 2) 0x10.toByte else 0xE0.toByte) // bottom-up flip
  private val frames = Seq(
    "dc" -> rle8(solid(0x10), w, h),
    "dc" -> rle8(solid(0xE0), w, h),
    "db" -> rawDb(colGrad, w, h),
    "dc" -> rle8(rowGrad, w, h))
  private val aviRel = avi(w, h, 100000, frames) // movi-relative offsets
  private val aviAbs = avi(w, h, 100000, frames, absoluteOffsets = true)
  private val c = Multimodal.AviFrameCodec

  test("frames encode at different byte sizes (the reason the index exists)") {
    assert(frames.map(_._2.length).distinct.size >= 2)
  }

  test("seek through the index: nearest frame, both offset conventions") {
    for (bytes <- Seq(aviRel, aviAbs)) {
      assert(math.abs(c.decodeFrame(bytes, 0L, 1)(0) - 0x10 / 255f) < 1e-6f)
      assert(math.abs(c.decodeFrame(bytes, 100L, 1)(0) - 0xE0 / 255f) < 1e-6f)
      // nearest rounding at 10 fps: 49 ms -> frame 0, 51 ms -> frame 1
      assert(math.abs(c.decodeFrame(bytes, 49L, 1)(0) - 0x10 / 255f) < 1e-6f)
      assert(math.abs(c.decodeFrame(bytes, 51L, 1)(0) - 0xE0 / 255f) < 1e-6f)
      // whole-content decode = frame 0
      assert(c.decode(bytes, 1).toSeq === c.decodeFrame(bytes, 0L, 1).toSeq)
    }
  }

  test("raw-DIB and RLE8 planes decode identically oriented (top-down raster)") {
    // frame 2 (raw db): column gradient — dims=16 isolates pixels;
    // (0,0) dark, (0,3) bright
    val g = c.decodeFrame(aviRel, 200L, 16)
    assert(math.abs(g(0) - 0x10 / 255f) < 1e-6f)
    assert(math.abs(g(3) - 0xE0 / 255f) < 1e-6f)
    // frame 3 (RLE): row gradient — the DIB bottom-up flip must land the
    // DARK rows on TOP: pixel (0,0) dark, pixel (3,0) bright
    val r = c.decodeFrame(aviRel, 300L, 16)
    assert(math.abs(r(0) - 0x10 / 255f) < 1e-6f, r.toSeq)
    assert(math.abs(r(12) - 0xE0 / 255f) < 1e-6f, r.toSeq)
  }

  test("past-the-end clamps to the last frame; corrupt index entry falls back") {
    val last = c.decodeFrame(aviRel, 300L, 16)
    assert(c.decodeFrame(aviRel, 999999L, 16).toSeq === last.toSeq)
    // corrupt the LAST index entry's offset (points past the file): a seek
    // to it falls back to the previous resolvable frame, never throws
    val corrupt = aviRel.clone()
    val idxOff = indexOf(corrupt, "idx1") + 8
    val lastEntryOff = idxOff + 3 * 16 + 8
    le32(0x7ffffff).copyToArray(corrupt, lastEntryOff)
    assert(c.decodeFrame(corrupt, 300L, 16).toSeq ===
      c.decodeFrame(aviRel, 200L, 16).toSeq)
  }

  test("no index = not seekable: probe all-None, codec zero (by contract)") {
    val noIdx = avi(w, h, 100000, frames, withIndex = false)
    assert(Multimodal.AviProbe.probe(noIdx) ===
      Multimodal.ProbedMeta(0L, None, None, None, None))
    assert(c.decodeFrame(noIdx, 0L, 2).toSeq === Seq(0f, 0f))
  }

  test("probe: dims from avih, duration from the index entry count") {
    for (bytes <- Seq(aviRel, aviAbs)) {
      assert(Multimodal.AviProbe.probe(bytes) ===
        Multimodal.ProbedMeta(0L, Some("avi"), Some(4), Some(4), Some(400L)))
      assert(Multimodal.SniffProbe.probe(bytes).format === Some("avi"))
    }
  }

  test("anti-bomb cap: absurd avih dimensions poison instead of allocating") {
    // claim 16Mx16M pixels over a tiny RLE payload — parse must reject
    val bomb = avi(1 << 13, 1 << 13, 100000, Seq("dc" -> rle8(Array.fill(4)(0.toByte), 2, 2)))
    // (2^13)^2 = 2^26 > the 4M-pixel cap
    assert(Multimodal.AviProbe.probe(bomb).format === None)
    assert(c.decodeFrame(bomb, 0L, 1).toSeq === Seq(0f))
  }

  test("probeMeta drives the frame plan end-to-end through the same seam as y4m") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq((11L, aviRel)).toDF("media_id", "content")
    val probed = Multimodal.probeMeta(media).toDF()
      .where(col("format") === "avi")
    val withMeta = media.join(probed, Seq("media_id"))
      .select(col("media_id"), col("content"),
        struct(col("format"), col("width"), col("height"),
          col("duration_ms")).as("meta"))
    val out = Multimodal.extractFrameFeatures(withMeta, everyMs = 100L,
        dims = 1, codec = c)
      .collect().sortBy(_.frame_ms)
    // 400 ms duration at 100 ms steps -> 0/100/200/300/400 (400 clamps)
    assert(out.map(_.frame_ms).toSeq === Seq(0L, 100L, 200L, 300L, 400L))
    assert(math.abs(out(0).embedding(0) - 0x10 / 255f) < 1e-6f)
    assert(math.abs(out(1).embedding(0) - 0xE0 / 255f) < 1e-6f)
    assert(out(3).embedding(0) === out(4).embedding(0)) // clamp
  }

  private def indexOf(hay: Array[Byte], fourcc: String): Int = {
    val needle = fourcc.getBytes("US-ASCII")
    hay.indices.find(i => i + 4 <= hay.length &&
      (0 until 4).forall(j => hay(i + j) == needle(j))).get
  }
}
