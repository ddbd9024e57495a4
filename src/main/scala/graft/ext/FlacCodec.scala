package graft.ext

/** FLAC (RFC 9639 / xiph.org format spec) PIXEL-exact AUDIO decoding
  * — the lossless codec speech corpora actually ship in (LibriSpeech,
  * MLS and Common Voice exports distribute FLAC, not WAV). From
  * scratch on the public spec only: the `fLaC` metadata walk,
  * MSB-first bit cursor, frame-header CRC-8 and whole-frame CRC-16,
  * UTF-8-style frame numbers, rice/rice2 residual partitions, the
  * four fixed predictors, quantized-LPC prediction, and the three
  * stereo decorrelation modes.
  *
  * Because FLAC is LOSSLESS, a decoded member is bit-identical to the
  * PCM that produced it — so the SQL oracle's closed-form sample
  * arithmetic holds through this decoder unchanged (unlike ADPCM,
  * whose stateful lossy recursion is spec-tested instead).
  *
  * Supported subset (None for non-FLAC magic, LOUD failure for
  * corrupt or out-of-subset members — a silently-wrong sample is
  * worse than a failed row):
  *   - sample sizes 8–24 bits (code 7 / 32-bit returns a loud
  *     unsupported error; side channels at bps+1 up to 25 bits);
  *   - 1–8 channels, independent or left/side, right/side, mid/side;
  *   - fixed predictors 0–4, LPC orders 1–32, rice and rice2
  *     partitions including the raw-binary escape;
  *   - fixed and variable blocking strategies.
  *
  * Both CRCs are VERIFIED (header CRC-8, frame CRC-16) — corruption
  * fails at the damaged frame with its offset, never decodes
  * desynchronized.
  */
object FlacDecoder {

  final case class Flac(sampleRate: Int, channels: Int, bps: Int,
                        samples: Array[Array[Int]])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"FLAC: $msg")

  /** MSB-first bit cursor with loud end-of-payload failures. */
  private final class BitReader(val b: Array[Byte]) {
    var pos = 0L // bit position
    def bytePos: Int = (pos >> 3).toInt
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val bp = pos + k
        if ((bp >> 3) >= b.length)
          fail(s"payload truncated at bit $bp")
        v = (v << 1) | ((b((bp >> 3).toInt) >> (7 - (bp & 7).toInt)) & 1)
        k += 1
      }
      pos += n
      v
    }
    def bitsSigned(n: Int): Int = {
      val v = bits(n)
      if (n == 0) 0
      else (v << (32 - n)) >> (32 - n)
    }
    def bitsLong(n: Int): Long = {
      if (n <= 32) bits(n).toLong & 0xffffffffL
      else ((bits(n - 32).toLong & 0xffffffffL) << 32) |
        (bits(32).toLong & 0xffffffffL)
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) {
        q += 1
        if (q > (1 << 24)) fail(s"runaway unary code at bit $pos")
      }
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def atEof: Boolean = (pos >> 3) >= b.length
  }

  // CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0, MSB-first —
  // the spec's frame-header and frame checksums.
  private[ext] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[ext] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** The FIRST channel of a decoded FLAC payload — the fingerprint
    * path's view, mirroring [[AudioHeader.linearSamples]].
    */
  def firstChannel(b: Array[Byte]): Option[Array[Int]] =
    decode(b).map(_.samples(0))

  final case class StreamInfo(sampleRate: Int, channels: Int, bps: Int,
                              totalSamples: Long)

  private def isFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C'

  /** Header-only STREAMINFO parse — the cheap metadata scan a corpus
    * census runs without touching frame data. None for non-FLAC
    * magic; loud on malformed metadata like [[decode]].
    */
  def streamInfo(b: Array[Byte]): Option[StreamInfo] =
    if (!isFlac(b)) None
    else {
      val r = new BitReader(b)
      r.pos = 32
      Some(readStreamInfo(r))
    }

  /** Walk the metadata section (cursor at bit 32), returning the
    * mandatory STREAMINFO and leaving the cursor at the first frame.
    */
  private def readStreamInfo(r: BitReader): StreamInfo = {
    val b = r.b
    var last = false
    var info: StreamInfo = null
    while (!last) {
      last = r.bits(1) == 1
      val btype = r.bits(7)
      val len = r.bits(24)
      if (btype == 0) {
        if (len != 34) fail(s"STREAMINFO length $len != 34")
        r.bits(16); r.bits(16) // min/max block size
        r.bits(24); r.bits(24) // min/max frame size
        val sampleRate = r.bits(20)
        val channels = r.bits(3) + 1
        val bps = r.bits(5) + 1
        val total = r.bitsLong(36)
        r.pos += 128 // md5
        info = StreamInfo(sampleRate, channels, bps, total)
      } else if (btype == 127) {
        fail("invalid metadata block type 127")
      } else {
        if ((r.pos >> 3) + len > b.length)
          fail(s"metadata block (type $btype, $len bytes) overruns " +
            s"the ${b.length}-byte payload")
        r.pos += len.toLong * 8
      }
    }
    if (info == null) fail("no STREAMINFO block")
    info
  }

  /** Full decode: None unless the payload starts with `fLaC`. */
  def decode(b: Array[Byte]): Option[Flac] = {
    if (!isFlac(b)) return None
    val r = new BitReader(b)
    r.pos = 32
    val si = readStreamInfo(r)
    val sampleRate = si.sampleRate
    val channels = si.channels
    val bps = si.bps
    val total = si.totalSamples
    if (bps > 24) fail(s"$bps-bit samples outside the supported 8-24 subset")
    val out = Array.fill(channels)(
      new scala.collection.mutable.ArrayBuffer[Int](
        math.min(total, 1 << 20).toInt max 16))
    while (!r.atEof && (total == 0 || out(0).length < total)) {
      decodeFrame(r, sampleRate, channels, bps, out)
    }
    if (total != 0 && out(0).length != total)
      fail(s"stream ended with ${out(0).length} of $total samples")
    Some(Flac(sampleRate, channels, bps, out.map(_.toArray)))
  }

  private def decodeFrame(
      r: BitReader, siRate: Int, siChannels: Int, siBps: Int,
      out: Array[scala.collection.mutable.ArrayBuffer[Int]]): Unit = {
    val frameStart = r.bytePos
    if (r.bits(14) != 0x3ffe)
      fail(s"lost frame sync at byte $frameStart")
    if (r.bits(1) != 0) fail(s"reserved bit set at byte $frameStart")
    r.bits(1) // blocking strategy (both legal; number field differs only in range)
    val bsCode = r.bits(4)
    val srCode = r.bits(4)
    val chanAsgn = r.bits(4)
    val ssCode = r.bits(3)
    if (r.bits(1) != 0) fail(s"reserved bit set at byte $frameStart")
    // UTF-8-style coded frame/sample number
    val first = r.bits(8)
    val extra = Integer.numberOfLeadingZeros(~(first << 24)) match {
      case 0 => 0
      case 1 => fail(s"malformed coded number at byte $frameStart")
      case k if k <= 7 => k - 1
      case _ => fail(s"malformed coded number at byte $frameStart")
    }
    var k = 0
    while (k < extra) {
      if (r.bits(2) != 2) fail(s"malformed coded number continuation " +
        s"at byte $frameStart")
      r.bits(6)
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => fail("reserved block size code 0")
      case 1 => 192
      case n if n <= 5 => 576 << (n - 2)
      case 6 => r.bits(8) + 1
      case 7 => r.bits(16) + 1
      case n => 256 << (n - 8)
    }
    srCode match {
      case 0 => // from STREAMINFO
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case 15 => fail("invalid sample rate code 15")
      case _ => // table-coded rates carry no extra field
    }
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 3 => fail("reserved sample size code 3")
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => fail("32-bit samples outside the supported subset")
    }
    val channels = if (chanAsgn < 8) chanAsgn + 1 else 2
    if (channels != siChannels)
      fail(s"frame declares $channels channels, STREAMINFO $siChannels")
    if (chanAsgn > 10) fail(s"reserved channel assignment $chanAsgn")
    val headerEnd = r.bytePos
    val wantCrc8 = r.bits(8)
    val gotCrc8 = crc8(r.b, frameStart, headerEnd)
    if (wantCrc8 != gotCrc8)
      fail(f"frame header CRC-8 mismatch at byte $frameStart " +
        f"(got $gotCrc8%02x, stored $wantCrc8%02x)")
    val chans = Array.ofDim[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      // decorrelated side channels carry one extra bit
      val extraBit = chanAsgn match {
        case 8 if c == 1 => 1  // left/side
        case 9 if c == 0 => 1  // right(side first)/side... see below
        case 10 if c == 1 => 1 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + extraBit)
      c += 1
    }
    r.alignByte()
    val frameEnd = r.bytePos
    val wantCrc16 = r.bits(16)
    val gotCrc16 = crc16(r.b, frameStart, frameEnd)
    if (wantCrc16 != gotCrc16)
      fail(f"frame CRC-16 mismatch at byte $frameStart " +
        f"(got $gotCrc16%04x, stored $wantCrc16%04x)")
    // undo stereo decorrelation (side = left - right throughout)
    chanAsgn match {
      case 8 => // left/side: ch0 = left, ch1 = side
        var i = 0
        while (i < blockSize) {
          val l = chans(0)(i); val s = chans(1)(i)
          chans(1)(i) = l - s
          i += 1
        }
      case 9 => // right/side: ch0 = side, ch1 = right
        var i = 0
        while (i < blockSize) {
          val s = chans(0)(i); val rt = chans(1)(i)
          chans(0)(i) = rt + s
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val s = chans(1)(i)
          val m2 = (chans(0)(i) << 1) | (s & 1)
          chans(0)(i) = (m2 + s) >> 1
          chans(1)(i) = (m2 - s) >> 1
          i += 1
        }
      case _ =>
    }
    c = 0
    while (c < channels) {
      out(c) ++= chans(c)
      c += 1
    }
  }

  private def decodeSubframe(r: BitReader, blockSize: Int,
                             bps: Int): Array[Int] = {
    if (r.bits(1) != 0) fail(s"subframe pad bit set at bit ${r.pos}")
    val stype = r.bits(6)
    val wasted =
      if (r.bits(1) == 1) r.unary() + 1
      else 0
    val eff = bps - wasted
    if (eff <= 0) fail(s"$wasted wasted bits leave no sample bits")
    val s = stype match {
      case 0 => // CONSTANT: ONE value, replicated
        val v0 = r.bitsSigned(eff)
        Array.fill(blockSize)(v0)
      case 1 => // VERBATIM: blockSize independent values
        Array.fill(blockSize)(r.bitsSigned(eff))
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        val warm = Array.fill(order)(r.bitsSigned(eff))
        val res = decodeResidual(r, blockSize, order)
        val v = new Array[Int](blockSize)
        System.arraycopy(warm, 0, v, 0, order)
        var i = order
        while (i < blockSize) {
          val p = order match {
            case 0 => 0
            case 1 => v(i - 1)
            case 2 => 2 * v(i - 1) - v(i - 2)
            case 3 => 3 * v(i - 1) - 3 * v(i - 2) + v(i - 3)
            case _ => 4 * v(i - 1) - 6 * v(i - 2) + 4 * v(i - 3) -
              v(i - 4)
          }
          v(i) = p + res(i - order)
          i += 1
        }
        v
      case t if t >= 32 => // LPC order 1-32
        val order = (t & 31) + 1
        if (order > blockSize)
          fail(s"LPC order $order exceeds the $blockSize-sample block")
        val warm = Array.fill(order)(r.bitsSigned(eff))
        val precision = r.bits(4) + 1
        if (precision == 16) fail("invalid LPC precision code 15")
        val shift = r.bitsSigned(5)
        if (shift < 0) fail(s"negative LPC shift $shift")
        val coef = Array.fill(order)(r.bitsSigned(precision))
        val res = decodeResidual(r, blockSize, order)
        val v = new Array[Int](blockSize)
        System.arraycopy(warm, 0, v, 0, order)
        var i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) {
            acc += coef(j).toLong * v(i - 1 - j)
            j += 1
          }
          v(i) = (acc >> shift).toInt + res(i - order)
          i += 1
        }
        v
      case t => fail(s"reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < s.length) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  private def decodeResidual(r: BitReader, blockSize: Int,
                             order: Int): Array[Int] = {
    val method = r.bits(2)
    if (method > 1) fail(s"reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.bits(4)
    if ((blockSize >> po) << po != blockSize)
      fail(s"partition order $po does not divide block size $blockSize")
    val perPart = blockSize >> po
    if (perPart <= order && po > 0 || blockSize <= order)
      fail(s"partition order $po leaves no residual samples")
    val res = new Array[Int](blockSize - order)
    var at = 0
    var p = 0
    while (p < (1 << po)) {
      val n = if (p == 0) perPart - order else perPart
      val param = r.bits(paramBits)
      if (param == escape) {
        val raw = r.bits(5)
        var i = 0
        while (i < n) { res(at + i) = r.bitsSigned(raw); i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.unary()
          val u = (q.toLong << param) | r.bits(param).toLong
          res(at + i) = ((u >>> 1) ^ -(u & 1)).toInt
          i += 1
        }
      }
      at += n
      p += 1
    }
    res
  }
}

/** Minimal FLAC ENCODER for fixtures and round-trip specs — one
  * subframe strategy per call so each decoder path is driven
  * deliberately: `constant`, `verbatim`, `fixed0`–`fixed4`, or `lpc`
  * (order-2 quantized coefficients [2, -1], the fixed-2 predictor
  * expressed through the LPC path so its decode is exercised
  * bit-exactly). Stereo input additionally selects a channel
  * assignment (`independent`, `leftside`, `rightside`, `midside`).
  * Rice parameter per partition is cost-minimized with the raw escape
  * as fallback; every stream round-trips bit-exactly by construction
  * (FLAC is lossless).
  */
object FlacEncoder {

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1).toInt
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        k -= 1
      }
    }
    def alignByte(): Unit = if (nb > 0) bits(0, 8 - nb)
    def bytes: Array[Byte] = { require(nb == 0); out.toByteArray }
  }

  def encode(channelData: Array[Array[Int]], sampleRate: Int,
             bps: Int = 16, mode: String = "fixed2",
             blockSize: Int = 4096,
             assignment: String = "independent"): Array[Byte] = {
    val channels = channelData.length
    require(channels >= 1 && channels <= 8, s"$channels channels")
    require(channelData.forall(_.length == channelData(0).length),
      "ragged channels")
    require(channels == 2 || assignment == "independent",
      s"assignment $assignment needs stereo input")
    val total = channelData(0).length
    require(total > 0, "FLAC encode: empty input")
    val head = new BitWriter
    head.bits(0x664c6143L, 32) // fLaC
    head.bits(1, 1); head.bits(0, 7); head.bits(34, 24)
    head.bits(blockSize.toLong, 16); head.bits(blockSize.toLong, 16)
    head.bits(0, 24); head.bits(0, 24)
    head.bits(sampleRate.toLong, 20)
    head.bits((channels - 1).toLong, 3)
    head.bits((bps - 1).toLong, 5)
    head.bits(total.toLong, 36)
    head.bits(0, 64); head.bits(0, 64) // md5 unset (legal)
    val outAll = new java.io.ByteArrayOutputStream()
    outAll.write(head.bytes)
    var at = 0
    var frameNo = 0L
    while (at < total) {
      val n = math.min(blockSize, total - at)
      val fw = new BitWriter
      fw.bits(0x3ffe, 14); fw.bits(0, 1); fw.bits(0, 1) // fixed blocking
      fw.bits(7, 4)  // block size: 16-bit field at header end
      fw.bits(0, 4)  // sample rate: STREAMINFO
      val asgnCode = assignment match {
        case "independent" => channels - 1
        case "leftside" => 8
        case "rightside" => 9
        case "midside" => 10
        case other => throw new IllegalArgumentException(
          s"FLAC encode: unknown assignment $other")
      }
      fw.bits(asgnCode.toLong, 4)
      fw.bits(bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5
        case 24 => 6
        case other => throw new IllegalArgumentException(
          s"FLAC encode: unsupported bps $other")
      }, 3)
      fw.bits(0, 1)
      writeCodedNumber(fw, frameNo)
      fw.bits((n - 1).toLong, 16)
      val headerBytes = { fw.alignByte(); fw.bytes }
      val fw2 = new BitWriter
      headerBytes.foreach(b => fw2.bits(b & 0xffL, 8))
      fw2.bits(FlacDecoder.crc8(headerBytes, 0, headerBytes.length).toLong, 8)
      // subframes (with decorrelation when requested)
      val subs: Array[(Array[Int], Int)] = asgnCode match {
        case 8 =>
          val l = channelData(0).slice(at, at + n)
          val r = channelData(1).slice(at, at + n)
          Array((l, bps),
            (Array.tabulate(n)(i => l(i) - r(i)), bps + 1))
        case 9 =>
          val l = channelData(0).slice(at, at + n)
          val r = channelData(1).slice(at, at + n)
          Array((Array.tabulate(n)(i => l(i) - r(i)), bps + 1),
            (r, bps))
        case 10 =>
          val l = channelData(0).slice(at, at + n)
          val r = channelData(1).slice(at, at + n)
          Array((Array.tabulate(n)(i => (l(i) + r(i)) >> 1), bps),
            (Array.tabulate(n)(i => l(i) - r(i)), bps + 1))
        case _ =>
          channelData.map(ch => (ch.slice(at, at + n), bps))
      }
      for ((s, sbps) <- subs) writeSubframe(fw2, s, sbps, mode)
      fw2.alignByte()
      val frameBytes = fw2.bytes
      val fin = new BitWriter
      frameBytes.foreach(b => fin.bits(b & 0xffL, 8))
      fin.bits(FlacDecoder.crc16(frameBytes, 0, frameBytes.length).toLong, 16)
      outAll.write(fin.bytes)
      at += n
      frameNo += 1
    }
    outAll.toByteArray
  }

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.bits(v, 8); return }
    var len = 2
    while (len <= 7 && v >= (1L << (if (len == 7) 36 else 6 * len - len + 1)))
      len += 1
    require(len <= 7, s"coded number $v exceeds the 7-byte/36-bit form")
    // capacity for len bytes: (7 - len) + 6 * (len - 1) bits
    val capBits = (7 - len) + 6 * (len - 1)
    require(v < (1L << capBits), s"coded number $v too large")
    val lead = (0xff << (8 - len)) & 0xff
    w.bits((lead | ((v >> (6 * (len - 1))) &
      ((1 << (7 - len)) - 1))).toLong, 8)
    var k = len - 2
    while (k >= 0) {
      w.bits(0x80L | ((v >> (6 * k)) & 0x3f), 8)
      k -= 1
    }
  }

  private def writeSubframe(w: BitWriter, s: Array[Int], bps: Int,
                            mode: String): Unit = {
    val effMode =
      if (s.nonEmpty && s.forall(_ == s(0)) && mode != "verbatim")
        "constant"
      else mode
    effMode match {
      case "constant" =>
        w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
        w.bits(s(0).toLong & ((1L << bps) - 1), bps)
      case "verbatim" =>
        w.bits(0, 1); w.bits(1, 6); w.bits(0, 1)
        s.foreach(v => w.bits(v.toLong & ((1L << bps) - 1), bps))
      case m if m.startsWith("fixed") =>
        val order = m.drop(5).toInt
        require(order >= 0 && order <= 4 && order < s.length,
          s"fixed order $order on a ${s.length}-sample block")
        w.bits(0, 1); w.bits((8 + order).toLong, 6); w.bits(0, 1)
        for (i <- 0 until order)
          w.bits(s(i).toLong & ((1L << bps) - 1), bps)
        writeResidual(w, fixedResidual(s, order))
      case "lpc" =>
        // order-2, coefficients [2, -1], precision 4, shift 0 — the
        // fixed-2 predictor routed through the LPC decode path
        require(s.length > 2, "lpc needs > 2 samples")
        w.bits(0, 1); w.bits((32 | 1).toLong, 6); w.bits(0, 1)
        w.bits(s(0).toLong & ((1L << bps) - 1), bps)
        w.bits(s(1).toLong & ((1L << bps) - 1), bps)
        w.bits(3, 4)  // precision - 1
        w.bits(0, 5)  // shift
        w.bits(2L & 0xf, 4); w.bits((-1L) & 0xf, 4)
        writeResidual(w, fixedResidual(s, 2))
      case other => throw new IllegalArgumentException(
        s"FLAC encode: unknown mode $other")
    }
  }

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] =
    Array.tabulate(s.length - order) { k =>
      val i = k + order
      val p = order match {
        case 0 => 0
        case 1 => s(i - 1)
        case 2 => 2 * s(i - 1) - s(i - 2)
        case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      s(i) - p
    }

  /** One partition (order 0), rice parameter cost-minimized with the
    * 5-bit raw escape as fallback.
    */
  private def writeResidual(w: BitWriter, res: Array[Int]): Unit = {
    w.bits(0, 2) // 4-bit rice
    w.bits(0, 4) // partition order 0
    val zig = res.map(e => ((e.toLong << 1) ^ (e.toLong >> 63)))
    var bestP = 0
    var bestCost = Long.MaxValue
    for (p <- 0 to 14) {
      var c = 0L
      var i = 0
      while (i < zig.length && c < bestCost) {
        c += (zig(i) >>> p) + 1 + p
        i += 1
      }
      if (c < bestCost) { bestCost = c; bestP = p }
    }
    val maxBits =
      if (zig.isEmpty) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(zig.max max 1L)
    val escCost = 5L + maxBits.toLong * zig.length
    if (escCost < bestCost) {
      w.bits(15, 4) // escape
      w.bits(maxBits.toLong, 5)
      // raw residuals are SIGNED n-bit values
      res.foreach(e => w.bits(e.toLong & ((1L << maxBits) - 1), maxBits))
    } else {
      w.bits(bestP.toLong, 4)
      for (u <- zig) {
        val q = (u >>> bestP).toInt
        var k = 0
        while (k < q) { w.bits(0, 1); k += 1 }
        w.bits(1, 1)
        w.bits(u & ((1L << bestP) - 1), bestP)
      }
    }
  }
}
