package graft.multimodal

/** MPEG-1 Layer III (MP3) FRAME-HEADER codec — the dominant real-crawl
  * audio container, previously the seam's last named audio absence.
  * Scope (recorded in PLANS.md round 12, the measured-share discipline):
  * the HEADER WALK is implemented for real — sync validation, bitrate /
  * samplerate tables, padding arithmetic, ID3v2 skip, frame-accurate
  * duration and CBR/VBR detection — because those are the fields a
  * crawl-curation pipeline consumes (data cards, duration budgets,
  * quality gates). PCM synthesis (hybrid filterbank + MDCT + Huffman
  * spectral decode) is the recorded rejection: a stats pipeline has no
  * consumer for the waveform, and the audio seam already proves lossy
  * and lossless PCM paths via ADPCM/G.711/FLAC.
  *
  * Strict: a broken sync word, reserved bitrate/samplerate index, or a
  * frame overrunning the blob throws by name — a torn stream never
  * yields silent partial stats. No MP3 exists in the reference
  * (beyond-reference realism for the multimodal seam). */
object Mp3 {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1..14. */
  private val BitrateKbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates (Hz) by header index 0..2 (3 is reserved). */
  private val SampleRateHz = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  final case class Mp3Info(nFrames: Int, sampleRate: Int, cbr: Boolean,
      maxKbps: Int, durationMs: Long, hasId3: Boolean)

  // ---- builder (fixture side) -----------------------------------------

  /** One frame's total byte length (header included): the spec's
    * `144 · bitrate / samplerate (+ padding)` Layer-III arithmetic. */
  def frameLength(bitrateIdx: Int, srIdx: Int, padding: Boolean): Int =
    144 * BitrateKbps(bitrateIdx) * 1000 / SampleRateHz(srIdx) +
      (if (padding) 1 else 0)

  /** Serialize one frame: 4-byte MPEG-1 Layer III header (sync 0x7FF,
    * version 11, layer 01, CRC-free) + deterministic body fill. */
  def frame(bitrateIdx: Int, srIdx: Int, padding: Boolean,
            fill: Int => Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, "bad bitrate index")
    require(srIdx >= 0 && srIdx <= 2, "bad samplerate index")
    val len = frameLength(bitrateIdx, srIdx, padding)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // sync(3) | MPEG1(11) | Layer III(01) | no CRC(1)
    out(2) = ((bitrateIdx << 4) | (srIdx << 2) |
      (if (padding) 2 else 0)).toByte // padding is bit 1 (0x02)
    out(3) = 0xc4.toByte // mono, no mode ext, (c)+orig clear, no emphasis
    var i = 4
    while (i < len) { out(i) = (fill(i) & 0xff).toByte; i += 1 }
    out
  }

  /** A minimal ID3v2.3 tag of `bodyLen` padding bytes (header + syncsafe
    * size), the prefix most real MP3s carry before the first frame. */
  def id3v2(bodyLen: Int): Array[Byte] = {
    require(bodyLen >= 0 && bodyLen < (1 << 28), "ID3 size out of range")
    Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((bodyLen >> 21) & 0x7f).toByte, ((bodyLen >> 14) & 0x7f).toByte,
      ((bodyLen >> 7) & 0x7f).toByte, (bodyLen & 0x7f).toByte) ++
      new Array[Byte](bodyLen)
  }

  /** Deterministic driver fixture, every parameter doc_id arithmetic so
    * the oracle re-derives the walker's outputs without touching bytes:
    * `1 + id%8` frames at samplerate index `id%3`; every fourth id is
    * VBR (bitrate cycles 128/160/192 by frame index), the rest CBR 128;
    * frame padding alternates; every fifth id carries an ID3v2 prefix. */
  def build(id: Long, payload: Array[Byte]): Array[Byte] = {
    val nFrames = 1 + (id % 8).toInt
    val srIdx = (id % 3).toInt
    val vbr = id % 4 == 0
    val out = new java.io.ByteArrayOutputStream()
    if (id % 5 == 0) out.write(id3v2(16 + (id % 32).toInt))
    var i = 0
    while (i < nFrames) {
      val brIdx = if (vbr) 9 + (i % 3) else 9 // 128 / 160 / 192 kbps
      val pad = (id + i) % 2 == 0
      val fi = i
      out.write(frame(brIdx, srIdx, pad, j =>
        (id * 31 + fi * 7 + j).toInt & 0xff))
      i += 1
    }
    val _ = payload // reserved for future body-content checks
    out.toByteArray
  }

  // ---- walker (decode side) --------------------------------------------

  /** Header-walk one MP3 blob: skip an ID3v2 prefix if present, then
    * validate and stride over every frame header to the end of the blob.
    * Duration is frame-exact (`nFrames · 1152 / sampleRate`, reported in
    * truncated integer ms); `cbr` is false iff two frames declare
    * different bitrates. */
  def parse(blob: Array[Byte]): Mp3Info = {
    require(blob.length >= 4, "blob too short for an MP3 frame header")
    var pos = 0
    val hasId3 = blob.length >= 10 && blob(0) == 'I' && blob(1) == 'D' &&
      blob(2) == '3'
    if (hasId3) {
      require((blob(5) & 0x10) == 0, "ID3v2 footer flag not supported")
      val size = ((blob(6) & 0x7f) << 21) | ((blob(7) & 0x7f) << 14) |
        ((blob(8) & 0x7f) << 7) | (blob(9) & 0x7f)
      pos = 10 + size
      require(pos <= blob.length, "ID3v2 size overruns the blob")
    }
    var nFrames = 0
    var sampleRate = -1
    var maxKbps = 0
    var minKbps = Int.MaxValue
    while (pos < blob.length) {
      require(pos + 4 <= blob.length, s"truncated frame header at $pos")
      val b1 = blob(pos) & 0xff; val b2 = blob(pos + 1) & 0xff
      require(b1 == 0xff && (b2 & 0xe0) == 0xe0,
        f"lost MP3 sync at offset $pos")
      require((b2 & 0x18) == 0x18, "only MPEG-1 supported (version bits)")
      require((b2 & 0x06) == 0x02, "only Layer III supported (layer bits)")
      val b3 = blob(pos + 2) & 0xff
      val brIdx = b3 >> 4
      require(brIdx >= 1 && brIdx <= 14,
        s"reserved/free bitrate index $brIdx")
      val srIdx = (b3 >> 2) & 0x3
      require(srIdx <= 2, "reserved samplerate index")
      val sr = SampleRateHz(srIdx)
      require(sampleRate < 0 || sampleRate == sr,
        "samplerate changes mid-stream")
      sampleRate = sr
      val kbps = BitrateKbps(brIdx)
      if (kbps > maxKbps) maxKbps = kbps
      if (kbps < minKbps) minKbps = kbps
      val len = frameLength(brIdx, srIdx, (b3 & 0x2) != 0)
      require(pos + len <= blob.length,
        s"frame at $pos overruns the blob (need $len bytes)")
      pos += len
      nFrames += 1
    }
    require(nFrames > 0, "no MP3 frames after the ID3 prefix")
    Mp3Info(nFrames, sampleRate, cbr = minKbps == maxKbps, maxKbps,
      nFrames.toLong * SamplesPerFrame * 1000L / sampleRate, hasId3)
  }
}
