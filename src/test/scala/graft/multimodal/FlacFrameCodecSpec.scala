package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.FlacFrameCodec]] — fixed-blocksize frame arithmetic,
  * CRC-verified sync scan, SEEKTABLE jump, clamp and poison policy.
  * Fixture: rate 44100, blocksize 256 (frame i covers samples
  * [256·i, 256·(i+1)), ≈5.8 ms each), constant-byte payloads so each
  * frame fingerprints distinctly.
  */
object FlacFixtures {
  def crc8(bytes: Seq[Int]): Int = {
    var crc = 0
    for (b <- bytes) {
      crc ^= b & 0xff
      for (_ <- 0 until 8)
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
    }
    crc
  }

  /** One fixed-strategy frame: blocksize code 8 (256), rate code 9
    * (44.1 kHz), mono 16-bit, 1-byte UTF-8 frame number. Payload bytes
    * stay below 0xff — no accidental sync patterns. */
  def frame(num: Int, payloadByte: Int, payloadLen: Int = 300): Array[Byte] = {
    require(num < 128 && (payloadByte & 0xff) != 0xff)
    val hdr = Seq(0xff, 0xf8, 0x89, 0x08, num)
    (hdr :+ crc8(hdr)).map(_.toByte).toArray ++
      Array.fill(payloadLen)(payloadByte.toByte)
  }

  /** fLaC magic + STREAMINFO (min = max blocksize 256, rate 44100) +
    * an optional SEEKTABLE of (sample, byteOffset-into-audio) points. */
  def flacStream(frames: Seq[Array[Byte]],
      seekpoints: Seq[(Long, Long)] = Nil): Array[Byte] = {
    val si = new Array[Byte](34)
    si(0) = 0x01; si(1) = 0x00; si(2) = 0x01; si(3) = 0x00 // 256 / 256
    si(10) = 0x0a; si(11) = 0xc4.toByte; si(12) = 0x42 // 44100, mono
    val siHdr = Array(
      (if (seekpoints.isEmpty) 0x80 else 0x00).toByte, 0.toByte, 0.toByte,
      34.toByte)
    val seekBlock =
      if (seekpoints.isEmpty) Array.emptyByteArray
      else {
        def be64(v: Long): Seq[Byte] =
          (7 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
        val body = seekpoints.flatMap { case (sm, off) =>
          be64(sm) ++ be64(off) ++ Seq(0.toByte, 0.toByte)
        }.toArray
        Array((0x80 | 3).toByte, 0.toByte, 0.toByte, body.length.toByte) ++ body
      }
    "fLaC".getBytes("US-ASCII") ++ siHdr ++ si ++ seekBlock ++
      frames.toArray.flatten
  }

  /** ms safely inside frame i (mid-frame sample). */
  def msIn(i: Int): Long = ((i * 256L + 128L) * 1000L) / 44100L

  val fiveFrames: Seq[Array[Byte]] = (0 until 5).map(i => frame(i, 0x10 * (i + 1)))
  val flac5: Array[Byte] = flacStream(fiveFrames)
}

class FlacFrameCodecSpec extends AnyFunSuite {
  import FlacFixtures._
  import Multimodal.FlacFrameCodec

  test("first / mid / last frame resolve by fixed-blocksize arithmetic") {
    val f0 = FlacFrameCodec.decodeFrame(flac5, 0L, 4)
    val f2 = FlacFrameCodec.decodeFrame(flac5, msIn(2), 4)
    val f4 = FlacFrameCodec.decodeFrame(flac5, msIn(4), 4)
    assert(f0.exists(_ != 0f) && f2.exists(_ != 0f) && f4.exists(_ != 0f))
    // constant payloads: each frame fingerprints distinctly
    assert(f0.toSeq != f2.toSeq && f2.toSeq != f4.toSeq)
    // any ms inside the same frame resolves to the same span
    assert(FlacFrameCodec.decodeFrame(flac5, msIn(2) + 1, 4).toSeq === f2.toSeq)
    // whole-content decode = the first frame
    assert(FlacFrameCodec.decode(flac5, 4).toSeq === f0.toSeq)
    // past-the-end clamps to the last resolvable frame (the AVI policy)
    assert(FlacFrameCodec.decodeFrame(flac5, 999999L, 4).toSeq === f4.toSeq)
  }

  test("SEEKTABLE jump selects the same bytes as the linear scan") {
    // point at frame 3's byte offset (each frame = 6 header + 300 payload)
    val withSeek = flacStream(fiveFrames, Seq((768L, 3L * 306L)))
    assert(FlacFrameCodec.decodeFrame(withSeek, msIn(4), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(4), 4).toSeq)
    assert(FlacFrameCodec.decodeFrame(withSeek, msIn(3), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(3), 4).toSeq)
    // a bogus seekpoint offset is ignored (header check fails -> linear)
    val bogus = flacStream(fiveFrames, Seq((768L, 17L)))
    assert(FlacFrameCodec.decodeFrame(bogus, msIn(3), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(3), 4).toSeq)
    // placeholder points (all-ones sample) are skipped, not trusted
    val placeholder = flacStream(fiveFrames, Seq((-1L, 3L * 306L)))
    assert(FlacFrameCodec.decodeFrame(placeholder, msIn(1), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(1), 4).toSeq)
  }

  test("corrupt headers: CRC rejects false syncs; all-corrupt poisons") {
    // corrupt frame 1's CRC byte: the scan must skip it (frame 0's span
    // then extends to frame 2, covering the orphaned bytes)
    val corrupt1 = flac5.clone()
    val f1Crc = flac5.indexOfSlice(frame(1, 0x20).take(6)) + 5
    corrupt1(f1Crc) = (corrupt1(f1Crc) ^ 0x55).toByte
    val got = FlacFrameCodec.decodeFrame(corrupt1, msIn(1), 4)
    // target inside frame 1 resolves to the last VALID header <= target
    assert(got.length === 4 && got.exists(_ != 0f))
    // every header corrupted -> zero vector, never a throw
    val allBad = flac5.clone()
    var o = allBad.indexOfSlice(Array(0xff.toByte, 0xf8.toByte))
    while (o >= 0) {
      allBad(o) = 0x11
      o = allBad.indexOfSlice(Array(0xff.toByte, 0xf8.toByte))
    }
    assert(FlacFrameCodec.decodeFrame(allBad, 0L, 4).forall(_ == 0f))
    // truncated metadata / non-flac bytes poison
    assert(FlacFrameCodec.decodeFrame(flac5.take(10), 0L, 4).forall(_ == 0f))
    assert(FlacFrameCodec.decodeFrame("garbage".getBytes, 0L, 4).forall(_ == 0f))
    assert(FlacFrameCodec.decodeFrame(null, 0L, 4).forall(_ == 0f))
    assert(FlacFrameCodec.decodeFrame(flac5, -1L, 4).forall(_ == 0f))
  }

  test("SniffFrameCodec dispatches fLaC to the frame seek") {
    val sniff = new Multimodal.SniffFrameCodec()
    assert(sniff.decodeFrame(flac5, msIn(2), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(2), 4).toSeq)
    assert(sniff.decode(flac5, 4).toSeq === FlacFrameCodec.decode(flac5, 4).toSeq)
  }

  test("a trailing ID3v1 'TAG' block is excluded from the last frame's span") {
    // appended tag metadata is not audio: the last frame's fingerprint
    // must match the untagged stream's (the Mp3Probe rule)
    val tag = "TAG".getBytes("US-ASCII") ++ Array.fill(125)(0x41.toByte)
    val tagged = flac5 ++ tag
    assert(FlacFrameCodec.decodeFrame(tagged, msIn(4), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(4), 4).toSeq)
    // bounded frames (a next header exists) are untouched by the trim
    assert(FlacFrameCodec.decodeFrame(tagged, msIn(1), 4).toSeq ===
      FlacFrameCodec.decodeFrame(flac5, msIn(1), 4).toSeq)
    // non-TAG trailing padding still folds into the last frame — the
    // documented best-effort clamp (no frame-length table exists to
    // bound it); the fingerprint visibly shifts rather than throwing
    val padded = flac5 ++ Array.fill(128)(0x00.toByte)
    val shifted = FlacFrameCodec.decodeFrame(padded, msIn(4), 4)
    assert(shifted.length === 4 && shifted.exists(_ != 0f))
    assert(shifted.toSeq !== FlacFrameCodec.decodeFrame(flac5, msIn(4), 4).toSeq)
    // a degenerate stream that is ONLY a tag after one frame never
    // produces an empty span (the trim refuses to cross the frame start)
    val oneFrame = flacStream(Seq(frame(0, 0x10, payloadLen = 50)))
    assert(FlacFrameCodec.decodeFrame(oneFrame ++ tag.take(100), 0L, 4).length === 4)
  }

  test("adversarial SEEKTABLE entries: never throw; bogus offsets fall back to the linear scan") {
    // every payload byte in the fixture is a constant < 0xff, so NO
    // mid-payload offset can start a sync pattern: each bogus point must
    // produce exactly the linear-scan result
    val bogusOffsets = Seq(10L, 100L, 306L + 7L, 4L * 306L + 50L,
      5L * 306L - 1L, 1L)
    for (off <- bogusOffsets; i <- 0 to 4) {
      val bytes = flacStream(fiveFrames, Seq((256L * i, off)))
      assert(FlacFrameCodec.decodeFrame(bytes, msIn(i), 4).toSeq ===
        FlacFrameCodec.decodeFrame(flac5, msIn(i), 4).toSeq,
        s"offset $off target frame $i must fall back to the linear scan")
    }
    // structurally hostile tables: EOF/overflow/negative offsets, huge
    // sample numbers, dense duplicate points — never a throw, always
    // dims-length output (the CRC-8 gate + bounds checks hold)
    val hostile: Seq[Seq[(Long, Long)]] = Seq(
      Seq((768L, Long.MaxValue)),
      Seq((768L, flac5.length.toLong + 1000L)),
      Seq((768L, -2L)),
      Seq((Long.MaxValue - 1L, 3L * 306L)),
      Seq((768L, 3L * 306L + 1L), (768L, 3L * 306L - 1L)),
      (0 until 13).map(j => (256L * (j % 5), (j * 97L) % (5L * 306L))),
      Seq((0L, 0L), (256L, 306L), (512L, 2L * 306L), (768L, 3L * 306L),
        (1024L, 4L * 306L)))
    for (sp <- hostile; i <- 0 to 4; ms <- Seq(msIn(i), 0L, 999999L)) {
      val out = FlacFrameCodec.decodeFrame(flacStream(fiveFrames, sp), ms, 4)
      assert(out.length === 4)
    }
    // a crafted CRC-8-VALID fake header embedded in a payload, with a
    // seekpoint aimed at it: the jump lands on a header that passes the
    // checksum (the ~1/256 false-sync class) — the walk must stay in
    // bounds and return a fingerprint, never throw
    val fakeHdr = frame(100, 0x30).take(6) // valid header bytes, sample 25600
    val poisonPayload = Array.fill(100)(0x22.toByte) ++ fakeHdr ++
      Array.fill(100)(0x22.toByte)
    val frames = Seq(frame(0, 0x10), Array(frame(1, 0x20).take(6),
      poisonPayload).flatten, frame(2, 0x40))
    val fakeOff = 306L + 6L + 100L // audio-relative offset of the fake header
    for (i <- 0 to 2; table <- Seq(Seq((256L * i, fakeOff)), Nil)) {
      val out = FlacFrameCodec.decodeFrame(flacStream(frames, table), msIn(i), 4)
      assert(out.length === 4 && out.exists(_ != 0f))
    }
  }
}
