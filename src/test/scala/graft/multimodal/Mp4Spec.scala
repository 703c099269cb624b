package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled ISO-BMFF fixtures for [[Multimodal.Mp4Probe]] — shared
  * with MediaFuzzSpec's mangling corpus. */
object Mp4Fixtures {
  def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)

  def box(t: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
  }

  /** Same box with the `size==1` 64-bit largesize encoding. */
  def largeBox(t: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(1L) ++ t.getBytes("US-ASCII") ++ be64(16L + body.length) ++ body
  }

  val ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes, be32(512), "isomiso2".getBytes)

  /** mvhd v0: timescale + duration at payload offsets 12/16, padded to
    * the real 100-byte payload. */
  def mvhd0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(timescale), be32(duration), Array.fill(80)(0.toByte))

  /** mvhd v1: 64-bit times, timescale at 20, duration u64 at 24. */
  def mvhd1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
      be32(timescale), be64(duration), Array.fill(80)(0.toByte))

  /** tkhd v0 (84-byte payload): 16.16 width/height at offsets 76/80. */
  def tkhd0(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array.fill(76)(0.toByte), be32(w.toLong << 16), be32(h.toLong << 16))

  val stsz: Array[Byte] = box("stsz", be32(0), be32(0), be32(3))
  val stco: Array[Byte] = box("stco", be32(0), be32(0))

  def trak(w: Int, h: Int, tables: Array[Byte]*): Array[Byte] =
    box("trak", tkhd0(w, h),
      box("mdia", box("minf", box("stbl", tables.flatten.toArray))))

  /** A minimal seekable video file: ftyp, moov{mvhd, video trak with
    * stsz+stco}, mdat. */
  def videoFile(timescale: Long, duration: Long, w: Int, h: Int): Array[Byte] =
    ftyp ++ box("moov", mvhd0(timescale, duration), trak(w, h, stsz, stco)) ++
      box("mdat", Array.fill(32)(0x42.toByte))

  val mp4: Array[Byte] = videoFile(600L, 1230L, 320, 240)
}

class Mp4Spec extends AnyFunSuite {
  import Mp4Fixtures._
  import Multimodal.{Mp4Probe, SniffProbe}

  test("v0 mvhd + seekable video trak: format, 16.16 dims, duration ms") {
    val m = Mp4Probe.probe(mp4)
    assert(m.format === Some("mp4"))
    assert(m.width === Some(320) && m.height === Some(240))
    assert(m.duration_ms === Some(1230L * 1000L / 600L)) // 2050
  }

  test("v1 mvhd carries the 64-bit duration") {
    val f = ftyp ++ box("moov", mvhd1(1000L, 5000L), trak(64, 48, stsz, stco))
    val m = Mp4Probe.probe(f)
    assert(m.format === Some("mp4") && m.duration_ms === Some(5000L))
    assert(m.width === Some(64) && m.height === Some(48))
  }

  test("no sample tables = not seekable = all-None (the AVI idx1 contract)") {
    val noCo = ftyp ++ box("moov", mvhd0(600, 1230), trak(320, 240, stsz))
    val noSz = ftyp ++ box("moov", mvhd0(600, 1230), trak(320, 240, stco))
    for (f <- Seq(noCo, noSz)) {
      val m = Mp4Probe.probe(f)
      assert(m === Multimodal.ProbedMeta(0L, None, None, None, None))
    }
    // the 64-bit/compact table variants count too
    val alt = ftyp ++ box("moov", mvhd0(600, 1230), trak(320, 240,
      box("stz2", be32(0), be32(0), be32(3)), box("co64", be32(0), be32(0))))
    assert(Mp4Probe.probe(alt).format === Some("mp4"))
  }

  test("audio-only file: duration with null dimensions") {
    val f = ftyp ++ box("moov", mvhd1(44100L, 441000L), trak(0, 0, stsz, stco))
    val m = Mp4Probe.probe(f)
    assert(m.format === Some("mp4"))
    assert(m.width === None && m.height === None)
    assert(m.duration_ms === Some(10000L))
  }

  test("first SEEKABLE video trak wins; audio trak first is skipped for dims") {
    val f = ftyp ++ box("moov", mvhd0(600, 600),
      trak(0, 0, stsz, stco), // audio
      trak(1920, 1080, stsz, stco), // the video track
      trak(64, 64, stsz, stco))
    val m = Mp4Probe.probe(f)
    assert(m.width === Some(1920) && m.height === Some(1080))
    // a video trak WITHOUT tables contributes neither seekability nor dims
    val f2 = ftyp ++ box("moov", mvhd0(600, 600),
      trak(1920, 1080), trak(64, 48, stsz, stco))
    val m2 = Mp4Probe.probe(f2)
    assert(m2.width === Some(64) && m2.height === Some(48))
  }

  test("size==1 largesize moov parses; size==0 to-end box walks") {
    val f = ftyp ++ largeBox("moov", mvhd0(600, 1230), trak(320, 240, stsz, stco))
    assert(Mp4Probe.probe(f).duration_ms === Some(2050L))
    // a trailing size==0 mdat (extends to EOF) does not break the walk
    val g = mp4 ++ be32(0) ++ "mdat".getBytes ++ Array.fill(16)(1.toByte)
    assert(Mp4Probe.probe(g).format === Some("mp4"))
  }

  test("SniffProbe dispatches ftyp; non-mp4 and corrupt stay all-None") {
    assert(SniffProbe.probe(mp4).format === Some("mp4"))
    assert(SniffProbe.probe("free".getBytes ++ mp4.drop(4)).format === None)
    // moov missing entirely
    assert(Mp4Probe.probe(ftyp ++ box("mdat", Array.fill(8)(0.toByte))).format === None)
    // truncated inside moov: walk stops, file stays un-probed (timescale
    // never parsed) rather than throwing
    assert(Mp4Probe.probe(mp4.take(40)).format === None)
  }
}
