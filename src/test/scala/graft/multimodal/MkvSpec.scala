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

  // ---- real-cluster fixtures for MkvFrameCodec -------------------------

  /** EBML element with the 2-byte size form (payload < 0x3fff) — Segment
    * payloads with real clusters outgrow [[el]]'s 1-byte form. */
  def el2(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    require(body.length < 0x3fff, "2-byte size fixture only")
    idBytes(id) ++ Array((0x40 | (body.length >> 8)).toByte,
      (body.length & 0xff).toByte) ++ body
  }

  /** TrackEntry with an explicit TrackNumber — the codec's routing key. */
  def videoTrackNum(w: Int, h: Int, num: Long): Array[Byte] =
    el(0xAEL,
      el(0xD7L, uintBytes(num, 1)),
      el(0x83L, uintBytes(1L, 1)),
      el(0xE0L, el(0xB0L, uintBytes(w.toLong, 2)), el(0xBAL, uintBytes(h.toLong, 2))))

  def audioTrackNum(num: Long): Array[Byte] =
    el(0xAEL, el(0xD7L, uintBytes(num, 1)), el(0x83L, uintBytes(2L, 1)))

  private def blockPayload(track: Int, relTs: Int, frame: Array[Byte]) =
    Array((0x80 | track).toByte,
      ((relTs >> 8) & 0xff).toByte, (relTs & 0xff).toByte, 0.toByte) ++ frame

  /** SimpleBlock: 1-byte track varint, 2-byte signed rel ts, flags 0. */
  def simpleBlock(track: Int, relTs: Int, frame: Array[Byte]): Array[Byte] =
    el(0xA3L, blockPayload(track, relTs, frame))

  /** The same frame wrapped the BlockGroup/Block way. */
  def blockGroup(track: Int, relTs: Int, frame: Array[Byte]): Array[Byte] =
    el(0xA0L, el(0xA1L, blockPayload(track, relTs, frame)))

  def cluster(ts: Long, blocks: Array[Byte]*): Array[Byte] =
    el(0x1F43B675L, el(0xE7L, uintBytes(ts, 2)), blocks.flatten.toArray)

  def cuePoint(time: Long, pos: Long): Array[Byte] =
    el(0xBBL, el(0xB3L, uintBytes(time, 2)),
      el(0xB7L, el(0xF1L, uintBytes(pos, 2))))

  /** Seekable file with real clusters and CORRECT Segment-payload-
    * relative cue positions (cue ints are fixed 2-byte, so the cues
    * element's size is position-independent — one dummy pass computes
    * the layout, the second writes the true offsets; the MP4 fixture's
    * two-pass muxer trick). Pass `cuePosOverride` to corrupt one cue. */
  def seekableMkv(
      tsScaleNs: Long, tracksEl: Array[Byte],
      clusters: Seq[(Long, Array[Byte])],
      cuePosOverride: Map[Int, Long] = Map.empty): Array[Byte] = {
    val info = segInfo(tsScaleNs, f64(9999.0))
    def cuesOf(ps: Seq[Long]) = el2(0x1C53BB6BL,
      clusters.zip(ps).flatMap { case ((t, _), p) => cuePoint(t, p) }.toArray)
    val head = info.length + tracksEl.length +
      cuesOf(Seq.fill(clusters.length)(0L)).length
    val ps = clusters.map(_._2.length.toLong).scanLeft(head.toLong)(_ + _).init
      .zipWithIndex.map { case (p, i) => cuePosOverride.getOrElse(i, p) }
    ebmlHeader ++ el2(0x18538067L,
      (Seq(info, tracksEl, cuesOf(ps)) ++ clusters.map(_._2)).flatten.toArray)
  }
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

/** [[Multimodal.MkvFrameCodec]]: the CuePoint → Cluster → (Simple)Block
  * seek the probe's Cues flag promises — the trio's third index
  * geometry. */
class MkvFrameCodecSpec extends AnyFunSuite {
  import MkvFixtures._
  import Multimodal.{MkvFrameCodec, MkvProbe}

  private def f(v: Int) = Array.fill(8)(v.toByte)
  // default scale (1e6 ns = ms units); video track 1, audio track 2.
  // Track-1 block times: 0, 1 (cluster ts 0) and 2, 3 (cluster ts 2);
  // the audio block (99) must never be picked; block at t=3 rides the
  // BlockGroup/Block path
  private val tracks = el(0x1654AE6BL, audioTrackNum(2), videoTrackNum(4, 2, 1))
  private val two = seekableMkv(1000000L, tracks, Seq(
    0L -> cluster(0L, simpleBlock(1, 0, f(10)), simpleBlock(2, 0, f(99)),
      simpleBlock(1, 1, f(60))),
    2L -> cluster(2L, simpleBlock(1, 0, f(110)), blockGroup(1, 1, f(160)))))

  private def lum(c: Array[Byte], ms: Long): Float =
    MkvFrameCodec.decodeFrame(c, ms, 1)(0)
  private def near(a: Float, v: Int): Boolean = math.abs(a - v / 255f) < 1e-6f

  test("cue -> cluster -> block seek: first/mid/last, cross-cluster, clamp") {
    assert(near(lum(two, 0L), 10))
    assert(near(lum(two, 1L), 60))   // last block <= t within cluster 0
    assert(near(lum(two, 2L), 110))  // second cue's cluster
    assert(near(lum(two, 3L), 160))  // the BlockGroup/Block path
    assert(near(lum(two, 999999L), 160)) // far past the end: clamp
    assert(near(MkvFrameCodec.decode(two, 1)(0), 10)) // whole-content = first
  }

  test("track routing: the video track's blocks win over interleaved audio") {
    // every seek above lands on track 1; the audio 99-frame at t=0 sits
    // BETWEEN two video blocks and must never surface
    for (ms <- 0L to 5L)
      assert(!near(lum(two, ms), 99), s"audio block leaked at ms=$ms")
  }

  test("probe agreement: no Cues = not seekable = zero vector") {
    val noCues = ebmlHeader ++ segment(
      segInfo(1000000L, f64(100.0)), el(0x1654AE6BL, videoTrack(4, 2)))
    assert(MkvProbe.probe(noCues).format === None)
    assert(lum(noCues, 0L) === 0f)
    assert(MkvProbe.probe(two).format === Some("mkv"))
  }

  test("a corrupt cue position falls back to the first cue, then poisons") {
    // cue 1 (time 2) points past the Segment: a t=2 seek retries the
    // FIRST cue's cluster and resolves its last block <= 2 (time-1 -> 60)
    val broken = seekableMkv(1000000L, tracks, Seq(
      0L -> cluster(0L, simpleBlock(1, 0, f(10)), simpleBlock(1, 1, f(60))),
      2L -> cluster(2L, simpleBlock(1, 0, f(110)))),
      cuePosOverride = Map(1 -> 9999L))
    assert(near(lum(broken, 2L), 60))
    // BOTH cues corrupt -> zero, never a throw
    val dead = seekableMkv(1000000L, tracks, Seq(
      0L -> cluster(0L, simpleBlock(1, 0, f(10)))),
      cuePosOverride = Map(0 -> 9999L))
    assert(lum(dead, 0L) === 0f)
  }

  test("negative relative block timestamps resolve (B-frame reordering)") {
    // cluster ts 5 with rel -2 and -4: block times 3 and 1 - a t=3 seek
    // must pick the rel -2 block, a t=1 seek the rel -4 one
    val neg = seekableMkv(1000000L, tracks, Seq(
      1L -> cluster(5L, simpleBlock(1, -4, f(10)), simpleBlock(1, -2, f(60)))))
    assert(near(lum(neg, 1L), 10))
    assert(near(lum(neg, 3L), 60))
  }

  test("non-default TimestampScale maps frameMs through scale units") {
    // 1e5 ns per unit: 1 ms = 10 units; cluster times 0 and 20 units
    val sc = seekableMkv(100000L, tracks, Seq(
      0L -> cluster(0L, simpleBlock(1, 0, f(10))),
      20L -> cluster(20L, simpleBlock(1, 0, f(110)))))
    assert(near(lum(sc, 0L), 10))
    assert(near(lum(sc, 1L), 10))  // t=10 units: still cue 0
    assert(near(lum(sc, 2L), 110)) // t=20 units: cue 1
  }
}
