package graft.sources.tar

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** From-spec ustar writer — the fixture side of [[TarWalk]]: q188
  * assembles REAL WebDataset shards executor-side and the round specs
  * build longname/PAX/truncation cases from it. POSIX.1-1988 headers
  * (leading-zero octal numerics, unsigned checksum, `ustar` magic +
  * version "00"); names past the 100-byte field emit a GNU 'L' longname
  * meta entry, the same shape GNU tar writes and [[TarWalk]] resolves. */
object TarBuild {

  private final val Block = 512

  /** One 512-byte header block. `size` is the payload length the entry
    * will carry; `name` must fit the 100-byte field (longer names go
    * through [[entry]]'s 'L' road). */
  def header(name: String, typeflag: Char, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"name too long for a ustar header: $name")
    // the 12-byte size field holds 11 octal digits = sizes < 8 GiB; a
    // longer rendering would silently overrun into the mtime field and
    // still checksum clean — fail loudly instead (bigger members need
    // the base-256 / PAX encodings this writer deliberately omits)
    require(size >= 0 && size < (1L << 33),
      s"size $size exceeds the 11-digit octal field (8 GiB)")
    val h = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      // leading-zero octal, NUL terminated — len-1 digits
      val s = ("%0" + (len - 1) + "o").format(v)
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    octal(420, 100, 8) // mode 0644
    octal(0, 108, 8) // uid
    octal(0, 116, 8) // gid
    octal(size, 124, 12)
    octal(0, 136, 12) // mtime: fixed 0 keeps fixtures deterministic
    h(156) = typeflag.toByte
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'
    h(263) = '0'; h(264) = '0'
    // checksum: unsigned sum with the chksum field read as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val cs = "%06o".format(sum).getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(cs, 0, h, 148, cs.length)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Header + payload padded to the 512-byte block grid; a name past the
    * 100-byte field is carried by a preceding GNU 'L' meta entry (name
    * `././@LongLink`, payload = the full name NUL-terminated). Dataless
    * typeflags '1'-'6' (links, devices, dirs, fifos) must carry NO data —
    * POSIX stores no records for them and [[TarWalk]] faithfully consumes
    * none, so building one with a payload would desynchronize every
    * reader; the require makes that misuse loud at build time. */
  def entry(name: String, data: Array[Byte], typeflag: Char = '0'): Array[Byte] = {
    require(data.isEmpty || typeflag < '1' || typeflag > '6',
      s"typeflag '$typeflag' entries carry no data records (POSIX)")
    val out = new ByteArrayOutputStream(Block + data.length + Block)
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    if (nameBytes.length > 100) {
      val longData = new Array[Byte](nameBytes.length + 1) // NUL-terminated
      System.arraycopy(nameBytes, 0, longData, 0, nameBytes.length)
      out.write(header("././@LongLink", 'L', longData.length.toLong))
      writePadded(out, longData)
      // the real header carries the BYTE-truncated name (GNU tar's
      // behavior) — cut at a UTF-8 boundary so re-encoding can't expand
      // a split trailing character past the field
      var end = 100
      while (end > 0 && (nameBytes(end) & 0xc0) == 0x80) end -= 1
      out.write(header(new String(nameBytes, 0, end, StandardCharsets.UTF_8),
        typeflag, data.length.toLong))
    } else out.write(header(name, typeflag, data.length.toLong))
    writePadded(out, data)
    out.toByteArray
  }

  /** A PAX 'x' extended-header entry carrying `records` (each rendered as
    * the self-length-counting `"<len> <key>=<value>\n"` form) — overrides
    * apply to the member that follows it. */
  def paxEntry(records: Seq[(String, String)]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    records.foreach { case (k, v) =>
      val payload = s" $k=$v\n".getBytes(StandardCharsets.UTF_8)
      // len counts its own digits: fixed point over the digit count
      var len = payload.length + 1
      while (len.toString.length + payload.length != len) {
        len = len.toString.length + payload.length
      }
      body.write(len.toString.getBytes(StandardCharsets.US_ASCII))
      body.write(payload)
    }
    val data = body.toByteArray
    val out = new ByteArrayOutputStream(Block + data.length)
    out.write(header("./PaxHeaders/x", 'x', data.length.toLong))
    writePadded(out, data)
    out.toByteArray
  }

  /** A complete archive: member entries in order + the two-zero-block
    * end-of-archive marker the spec prescribes. */
  def archive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (n, d) => out.write(entry(n, d)) }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  private def writePadded(out: ByteArrayOutputStream, data: Array[Byte]): Unit = {
    out.write(data)
    val pad = (Block - data.length % Block) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }
}
