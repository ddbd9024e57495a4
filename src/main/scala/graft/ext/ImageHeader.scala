package graft.ext

/** Pure-JVM container-header parsing for the public PNG / GIF / BMP
  * image formats — byte-level, no codec dependency. Replaces the
  * hash stand-in for payloads that really are images; the reference
  * formats are public specs (PNG: RFC 2083 §3.1/§4.1.1, GIF:
  * GIF89a specification §17-18, BMP: BITMAPCOREHEADER /
  * BITMAPINFOHEADER layouts).
  */
object ImageHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** Parse `(format, width, height)` from the container header, or
    * None for payloads that are not PNG/GIF/BMP.
    *
    * Detection is strict enough that text payloads cannot misparse:
    * PNG's signature starts with a non-ASCII byte, GIF requires the
    * exact 6-byte version magic, and BMP additionally requires the
    * four reserved bytes to be zero and a known DIB header size —
    * fields that printable text (no NUL bytes) can never satisfy.
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && ascii(b, 1, "PNG") &&
        b(4) == 0x0d.toByte && b(5) == 0x0a.toByte &&
        b(6) == 0x1a.toByte && b(7) == 0x0a.toByte &&
        ascii(b, 12, "IHDR"))
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 10 &&
        (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")))
      Some(("gif", le16(b, 6), le16(b, 8)))
    else if (b.length >= 26 && ascii(b, 0, "BM") &&
        le32(b, 6) == 0) le32(b, 14) match {
      // BITMAPCOREHEADER: 16-bit dims at 18/20
      case 12 => Some(("bmp", le16(b, 18), le16(b, 20)))
      // BITMAPINFOHEADER and its extensions: 32-bit dims at 18/22;
      // height may be negative (top-down rows) — size is |height|
      case 40 | 52 | 56 | 108 | 124 =>
        Some(("bmp", le32(b, 18), math.abs(le32(b, 22))))
      case _ => None
    }
    else None
  }
}
