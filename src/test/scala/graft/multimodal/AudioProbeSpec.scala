package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled MP3 / FLAC fixtures for [[Multimodal.Mp3Probe]] and
  * [[Multimodal.FlacProbe]] — shared with MediaFuzzSpec's mangling
  * corpus. */
object AudioFixtures {
  /** One MPEG1 Layer III 128 kbps 44.1 kHz stereo frame: 417 bytes
    * (144 × 128000 / 44100, no padding), header FF FB 90 00. */
  def v1l3Frame(fill: Byte = 0): Array[Byte] =
    Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++
      Array.fill(413)(fill)

  /** The same frame with a Xing VBR header (frames count) at the
    * MPEG1-stereo offset 4 + 32. */
  def xingFrame(frames: Long): Array[Byte] = {
    val f = v1l3Frame()
    val x = 36
    "Xing".getBytes("US-ASCII").copyToArray(f, x)
    // flags: frames-present
    f(x + 4) = 0; f(x + 5) = 0; f(x + 6) = 0; f(x + 7) = 1
    f(x + 8) = ((frames >> 24) & 0xff).toByte
    f(x + 9) = ((frames >> 16) & 0xff).toByte
    f(x + 10) = ((frames >> 8) & 0xff).toByte
    f(x + 11) = (frames & 0xff).toByte
    f
  }

  /** ID3v2 tag of `size` payload bytes (syncsafe), optional footer. */
  def id3(size: Int, footer: Boolean = false): Array[Byte] =
    Array('I'.toByte, 'D'.toByte, '3'.toByte, 3.toByte, 0.toByte,
      (if (footer) 0x10 else 0).toByte,
      ((size >> 21) & 0x7f).toByte, ((size >> 14) & 0x7f).toByte,
      ((size >> 7) & 0x7f).toByte, (size & 0x7f).toByte) ++
      Array.fill(size + (if (footer) 10 else 0))(0x41.toByte)

  val mp3: Array[Byte] = (1 to 10).flatMap(_ => v1l3Frame()).toArray

  /** FLAC: fLaC magic + STREAMINFO (rate 44100, 2ch, 16-bit,
    * `totalSamples`), preceded by `padFirst` padding blocks. */
  def flac(totalSamples: Long, padFirst: Int = 0): Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = 0x0a; si(11) = 0xc4.toByte; si(12) = 0x42 // 44100, 2ch
    si(13) = (0xf0 | ((totalSamples >> 32) & 0xf)).toByte // 16-bit
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    val pad = (1 to padFirst).flatMap(_ =>
      Array[Byte](1, 0, 0, 2, 0, 0)).toArray // type-1 block, len 2
    "fLaC".getBytes("US-ASCII") ++ pad ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si
  }

  val flacTenSec: Array[Byte] = flac(441000L)

  // ---- Ogg (Vorbis / Opus) ---------------------------------------------

  def le16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def le32(v: Long): Array[Byte] = le16(v) ++ le16(v >> 16)
  def le64(v: Long): Array[Byte] = le32(v) ++ le32(v >> 32)

  /** One Ogg page (CRC left 0 — the probe never checks it, like every
    * header-only prober). Standard 255-lacing. */
  def oggPage(htype: Int, granule: Long, seq: Long,
      payload: Array[Byte]): Array[Byte] = {
    val lacing = Array.fill(payload.length / 255)(255.toByte) :+
      (payload.length % 255).toByte
    "OggS".getBytes("US-ASCII") ++ Array(0.toByte, htype.toByte) ++
      le64(granule) ++ le32(7L) ++ le32(seq) ++ le32(0L) ++
      Array(lacing.length.toByte) ++ lacing ++ payload
  }

  def vorbisId(rate: Long): Array[Byte] =
    Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++ le32(0L) ++
      Array(2.toByte) ++ le32(rate) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      Array(0xb8.toByte, 1.toByte)

  def opusHead(preSkip: Long): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array(1.toByte, 2.toByte) ++
      le16(preSkip) ++ le32(48000L) ++ le16(0L) ++ Array(0.toByte)

  /** BOS ID page + a mid data page (granule −1: no packet ends) + the
    * final page carrying `lastGranule`. */
  def ogg(id: Array[Byte], lastGranule: Long): Array[Byte] =
    oggPage(2, 0L, 0L, id) ++
      oggPage(0, -1L, 1L, Array.fill(40)(0x33.toByte)) ++
      oggPage(4, lastGranule, 2L, Array.fill(24)(0x44.toByte))

  val oggVorbis: Array[Byte] = ogg(vorbisId(44100L), 441000L)
}

class AudioProbeSpec extends AnyFunSuite {
  import AudioFixtures._
  import Multimodal.{FlacProbe, Mp3Probe, SniffProbe}

  test("mp3: CBR estimate from the first verified frame header") {
    val m = Mp3Probe.probe(mp3)
    assert(m.format === Some("mp3"))
    assert(m.width === None && m.height === None)
    // 4170 bytes at 128 kbps -> 4170*8000/128000 = 260 ms (true 261)
    assert(m.duration_ms === Some(260L))
    // a single exact frame verifies against EOF
    assert(Mp3Probe.probe(v1l3Frame()).duration_ms === Some(417L * 8000 / 128000))
  }

  test("mp3: ID3v2 tag skipped (footer too); Xing frame count is exact") {
    val tagged = id3(100) ++ mp3
    assert(Mp3Probe.probe(tagged).format === Some("mp3"))
    val footered = id3(64, footer = true) ++ mp3
    assert(Mp3Probe.probe(footered).format === Some("mp3"))
    // Xing: 10 frames x 1152 samples at 44100 -> 261 ms exact
    val vbr = xingFrame(10L) ++ (1 to 9).flatMap(_ => v1l3Frame()).toArray
    assert(Mp3Probe.probe(vbr).duration_ms === Some(10L * 1152 * 1000 / 44100))
  }

  test("mp3: false sync rejected; reserved version/layer/bitrate rejected") {
    // a sync whose claimed frame boundary holds no second sync = garbage
    val falseSync = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0.toByte) ++
      Array.fill(50)(0x55.toByte)
    assert(Mp3Probe.probe(falseSync).format === None)
    // reserved version (01) and layer (00), free (0) and bad (15) bitrate
    for (b2 <- Seq(0xeb, 0xf9); hdr = Array(0xff.toByte, b2.toByte, 0x90.toByte, 0.toByte))
      assert(Mp3Probe.probe(hdr ++ Array.fill(413)(0.toByte)).format === None, s"b2=$b2")
    for (b3 <- Seq(0x00, 0xf0, 0x9c); hdr = Array(0xff.toByte, 0xfb.toByte, b3.toByte, 0.toByte))
      assert(Mp3Probe.probe(hdr ++ Array.fill(500)(0.toByte)).format === None, s"b3=$b3")
  }

  test("mp3: an oversized ID3 tag (tag past EOF) poisons") {
    assert(Mp3Probe.probe(id3(100).take(40)).format === None)
  }

  test("flac: exact duration from STREAMINFO; padding blocks walked") {
    val m = FlacProbe.probe(flacTenSec)
    assert(m.format === Some("flac"))
    assert(m.duration_ms === Some(10000L))
    assert(FlacProbe.probe(flac(441000L, padFirst = 2)).duration_ms === Some(10000L))
    // 36-bit total samples: the high nibble in byte 13 counts
    val big = flac((5L << 32) | 441000L)
    assert(FlacProbe.probe(big).duration_ms ===
      Some(((5L << 32) | 441000L) * 1000L / 44100L))
  }

  test("flac: truncated STREAMINFO / missing block / zero rate poison") {
    assert(FlacProbe.probe(flacTenSec.take(20)).format === None)
    assert(FlacProbe.probe("fLaC".getBytes).format === None)
    val zeroRate = flacTenSec.clone()
    zeroRate(4 + 4 + 10) = 0; zeroRate(4 + 4 + 11) = 0; zeroRate(4 + 4 + 12) = 0
    assert(FlacProbe.probe(zeroRate).format === None)
  }

  test("ogg/vorbis: last-page granule over the ID rate; -1 pages skipped") {
    val m = Multimodal.OggProbe.probe(oggVorbis)
    assert(m.format === Some("ogg"))
    assert(m.duration_ms === Some(10000L)) // 441000 samples at 44100
    // trailing garbage after the last page degrades nothing
    val dirty = oggVorbis ++ Array.fill(100)(0x5a.toByte)
    assert(Multimodal.OggProbe.probe(dirty).duration_ms === Some(10000L))
  }

  test("ogg/opus: 48 kHz granule clock minus pre-skip") {
    val m = Multimodal.OggProbe.probe(ogg(opusHead(312L), 48312L))
    assert(m.format === Some("ogg"))
    assert(m.duration_ms === Some(1000L)) // (48312-312)/48000 s
    // pre-skip exceeding the granule clamps to zero, never negative
    assert(Multimodal.OggProbe.probe(ogg(opusHead(312L), 100L))
      .duration_ms === Some(0L))
  }

  test("ogg: multi-segment lacing (>=255-byte pages) walks correctly") {
    // a 700-byte data page needs lacing [255, 255, 190]; the tail scan
    // must skip it whole to reach the final page's granule
    val big = oggPage(2, 0L, 0L, vorbisId(44100L)) ++
      oggPage(0, -1L, 1L, Array.fill(700)(0x22.toByte)) ++
      oggPage(4, 88200L, 2L, Array.fill(10)(0x11.toByte))
    val m = Multimodal.OggProbe.probe(big)
    assert(m.format === Some("ogg") && m.duration_ms === Some(2000L))
  }

  test("ogg: unknown codec, no granule-bearing page, truncation poison") {
    val unknown = oggPage(2, 0L, 0L, "speex   head".getBytes)
    assert(Multimodal.OggProbe.probe(unknown).format === None)
    // every page granule -1: nothing to date the stream by
    val undated = oggPage(2, 0L, 0L, vorbisId(44100L)).map(identity) ++
      oggPage(0, -1L, 1L, Array.fill(10)(1.toByte))
    // BOS page's granule 0 still counts (start of stream): Some(0)
    assert(Multimodal.OggProbe.probe(undated).duration_ms === Some(0L))
    assert(Multimodal.OggProbe.probe(oggVorbis.take(20)).format === None)
  }

  test("SniffProbe dispatches flac and mp3 (weakest magic last)") {
    assert(SniffProbe.probe(flacTenSec).format === Some("flac"))
    assert(SniffProbe.probe(oggVorbis).format === Some("ogg"))
    assert(SniffProbe.probe(mp3).format === Some("mp3"))
    assert(SniffProbe.probe(id3(16) ++ mp3).format === Some("mp3"))
    // the 2-byte sync alone does not survive the probe's verify
    assert(SniffProbe.probe(Array(0xff.toByte, 0xfb.toByte) ++
      Array.fill(20)(0x11.toByte)).format === None)
    // mp4/mkv etc. keep winning their magics (mp3 is last)
    assert(SniffProbe.probe(Mp4Fixtures.mp4).format === Some("mp4"))
  }

  test("ogg: chained streams (tail re-keyed by a later BOS) keep an estimate") {
    // icecast-style chain: the first stream's pages end early, a second
    // chain (new serial 9) occupies the tail — no tail page matches the
    // first BOS serial, so the probe falls back to the any-serial max
    // instead of probing None
    val chain2Id = oggPage(2, 0L, 0L, vorbisId(44100L))
    chain2Id(14) = 9
    val chain2Data = oggPage(4, 88200L, 1L, Array.fill(16)(0x55.toByte))
    chain2Data(14) = 9
    val pad = Array.fill(70000)(0x00.toByte) // push chain 1 out of the tail window
    val chained = oggPage(2, 0L, 0L, vorbisId(44100L)) ++ pad ++ chain2Id ++ chain2Data
    assert(Multimodal.OggProbe.probe(chained).duration_ms === Some(2000L))
  }

  test("ogg: multiplexed foreign-serial granules never set the duration") {
    // a second bitstream (Theora-style) pages with serial 9 and a granule
    // that would read as ~50 s on the audio clock; the audio stream
    // (serial 7, BOS) ends at 441000 samples = 10 s
    val foreign = oggPage(0, 2211000L, 5L, Array.fill(16)(0x77.toByte))
    foreign(14) = 9 // patch the bitstream serial (u32le at offset 14)
    val muxed = oggVorbis ++ foreign
    assert(Multimodal.OggProbe.probe(muxed).duration_ms === Some(10000L))
    // sanity: the same page with the AUDIO serial does move the clock
    val samestream = oggVorbis ++ oggPage(0, 2205000L, 5L, Array.fill(16)(0x77.toByte))
    assert(Multimodal.OggProbe.probe(samestream).duration_ms === Some(50000L))
  }

  test("mp3: trailing ID3v1 'TAG' block excluded from the CBR byte count") {
    val tag = "TAG".getBytes("US-ASCII") ++ Array.fill(125)(0x20.toByte)
    // 4170 audio bytes at 128 kbps stay 260 ms; tag-inclusive would be 268
    assert(Mp3Probe.probe(mp3 ++ tag).duration_ms === Some(260L))
    // a tail that merely contains 'TAG' mid-buffer is not a trailer
    val notTrailer = mp3 ++ tag ++ Array.fill(3)(0x00.toByte)
    assert(Mp3Probe.probe(notTrailer).duration_ms === Some(268L))
  }
}
