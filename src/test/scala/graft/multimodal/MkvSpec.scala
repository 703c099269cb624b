package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled Matroska/EBML fixtures for [[Multimodal.MkvProbe]] —
  * shared with MediaFuzzSpec's mangling corpus. */
object MkvFixtures {
  /** EBML element: raw id bytes (marker bit in, per the spec's class
    * encoding) + 1-byte size varint + payload. Payloads here are < 127
    * bytes so the 1-byte size form always fits. */
  def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    require(body.length < 0x7f, "1-byte size fixture only")
    idBytes(id) ++ Array((0x80 | body.length).toByte) ++ body
  }

  def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (1 to n).map(i => ((id >> (8 * (n - i))) & 0xff).toByte).toArray
  }

  def uintBytes(v: Long, n: Int): Array[Byte] =
    (1 to n).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray

  def f32(v: Float): Array[Byte] =
    uintBytes(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)
  def f64(v: Double): Array[Byte] =
    uintBytes(java.lang.Double.doubleToLongBits(v), 8)

  val ebmlHeader: Array[Byte] =
    el(0x1A45DFA3L, el(0x4282L, "matroska".getBytes("US-ASCII"))) // DocType

  def segInfo(tsScaleNs: Long, durationTs: Array[Byte]): Array[Byte] =
    el(0x1549A966L,
      el(0x2AD7B1L, uintBytes(tsScaleNs, 3)),
      el(0x4489L, durationTs))

  /** Info with NO TimestampScale — the EBML-default (1e6 ns) path. */
  def segInfoDefaultScale(durationTs: Array[Byte]): Array[Byte] =
    el(0x1549A966L, el(0x4489L, durationTs))

  def videoTrack(w: Int, h: Int): Array[Byte] =
    el(0xAEL,
      el(0x83L, uintBytes(1L, 1)), // TrackType = video
      el(0xE0L, el(0xB0L, uintBytes(w.toLong, 2)), el(0xBAL, uintBytes(h.toLong, 2))))

  val audioTrack: Array[Byte] = el(0xAEL, el(0x83L, uintBytes(2L, 1)))

  val cues: Array[Byte] = el(0x1C53BB6BL, Array.emptyByteArray)

  def segment(children: Array[Byte]*): Array[Byte] =
    el(0x18538067L, children.flatten.toArray)

  /** Same segment with the all-ones UNKNOWN-size encoding (the live-
    * streaming convention): payload extends to the end of the file. */
  def unknownSizeSegment(children: Array[Byte]*): Array[Byte] =
    idBytes(0x18538067L) ++ Array(0xff.toByte) ++ children.flatten.toArray

  /** Minimal seekable video file: EBML header + Segment{Info, Tracks
    * {video TrackEntry}, Cues}. Scale 1e6 ns = 1 ms per unit. */
  def videoFile(durationTsMs: Double, w: Int, h: Int): Array[Byte] =
    ebmlHeader ++ segment(
      segInfo(1000000L, f64(durationTsMs)),
      el(0x1654AE6BL, videoTrack(w, h)),
      cues)

  val mkv: Array[Byte] = videoFile(2050.0, 320, 240)
}

class MkvSpec extends AnyFunSuite {
  import MkvFixtures._
  import Multimodal.{MkvProbe, SniffProbe}

  test("video file: format, track dims, float duration x scale -> ms") {
    val m = MkvProbe.probe(mkv)
    assert(m.format === Some("mkv"))
    assert(m.width === Some(320) && m.height === Some(240))
    assert(m.duration_ms === Some(2050L))
  }

  test("4-byte float duration and a non-default TimestampScale") {
    // 50 ns per unit: 100000 units = 5 ms
    val f = ebmlHeader ++ segment(
      segInfo(50L, f32(100000.0f)), el(0x1654AE6BL, videoTrack(64, 48)), cues)
    val m = MkvProbe.probe(f)
    assert(m.duration_ms === Some(5L))
    assert(m.width === Some(64) && m.height === Some(48))
  }

  test("TimestampScale absent: the EBML default (1e6 ns = ms units)") {
    val f = ebmlHeader ++ segment(
      segInfoDefaultScale(f64(123.0)), el(0x1654AE6BL, videoTrack(8, 8)), cues)
    assert(MkvProbe.probe(f).duration_ms === Some(123L))
  }

  test("no Cues = not seekable = all-None (the idx1/stco contract)") {
    val f = ebmlHeader ++ segment(
      segInfo(1000000L, f64(2050.0)), el(0x1654AE6BL, videoTrack(320, 240)))
    assert(MkvProbe.probe(f) === Multimodal.ProbedMeta(0L, None, None, None, None))
  }

  test("audio-only: duration with null dimensions; first video wins dims") {
    val f = ebmlHeader ++ segment(
      segInfo(1000000L, f64(10000.0)), el(0x1654AE6BL, audioTrack), cues)
    val m = MkvProbe.probe(f)
    assert(m.format === Some("mkv") && m.duration_ms === Some(10000L))
    assert(m.width === None && m.height === None)
    val two = ebmlHeader ++ segment(
      segInfo(1000000L, f64(1.0)),
      el(0x1654AE6BL, audioTrack, videoTrack(1920, 1080), videoTrack(64, 64)),
      cues)
    val m2 = MkvProbe.probe(two)
    assert(m2.width === Some(1920) && m2.height === Some(1080))
  }

  test("unknown-size Segment (streaming convention) still parses") {
    val f = ebmlHeader ++ unknownSizeSegment(
      segInfo(1000000L, f64(777.0)), el(0x1654AE6BL, videoTrack(16, 16)), cues)
    val m = MkvProbe.probe(f)
    assert(m.format === Some("mkv") && m.duration_ms === Some(777L))
  }

  test("SniffProbe dispatches EBML magic; corrupt/truncated stay all-None") {
    assert(SniffProbe.probe(mkv).format === Some("mkv"))
    // negative or NaN duration floats poison rather than emit garbage
    val neg = ebmlHeader ++ segment(
      segInfo(1000000L, f64(-5.0)), el(0x1654AE6BL, videoTrack(8, 8)), cues)
    assert(MkvProbe.probe(neg).format === None)
    val nan = ebmlHeader ++ segment(
      segInfo(1000000L, f64(Double.NaN)), el(0x1654AE6BL, videoTrack(8, 8)), cues)
    assert(MkvProbe.probe(nan).format === None)
    // truncation inside the Segment stops the walk without throwing
    for (k <- 4 to math.min(mkv.length - 1, 64)) {
      val m = MkvProbe.probe(mkv.take(k))
      assert(m.format === None || m.format === Some("mkv"))
    }
    // a non-EBML prefix is not dispatched
    assert(SniffProbe.probe("XXXX".getBytes ++ mkv.drop(4)).format === None)
  }
}
