package graft.sources.xls

/** Minimal Compound File Binary (CFB / OLE2) container reader — the outer
  * envelope of legacy `.xls` workbooks. Implemented from the public
  * [MS-CFB] structure spec: header → DIFAT → FAT → directory; streams
  * smaller than the mini-stream cutoff (4096) live in 64-byte mini sectors
  * chained by the miniFAT inside the root entry's stream.
  *
  * Scope: read-only lookup of one named stream, which is all the BIFF
  * reader needs. Legacy workbooks are bounded by the format itself
  * (65536 rows × 256 cols per sheet), so whole-file byte arrays are fine.
  */
object Cfb {

  private val Signature = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val MaxChain = 1 << 20 // cycle guard

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** The bytes of the first stream whose name matches any of `names`
    * (exact match, e.g. "Workbook"/"Book"), or None if the container or
    * stream is absent/corrupt. */
  def readStream(bytes: Array[Byte], names: Seq[String]): Option[Array[Byte]] = {
    if (bytes.length < 512) return None
    if (!Signature.indices.forall(i => bytes(i) == Signature(i))) return None
    try {
      val sectShift = u16(bytes, 30)
      val sectSize = 1 << sectShift
      val miniSize = 1 << u16(bytes, 32)
      val numFat = u32(bytes, 44)
      val firstDir = u32(bytes, 48)
      val miniCutoff = u32(bytes, 56)
      val firstMiniFat = u32(bytes, 60)
      val firstDifat = u32(bytes, 68)
      val idsPerSect = sectSize / 4

      // Per MS-CFB §2.1 sector n starts at (n+1) << sectorShift: the header
      // occupies a full sector, so for v4 containers (4096-byte sectors)
      // sector 0 is at 4096, not 512. (sid+1)*sectSize is equivalent to the
      // common v3 512-byte case and correct for v4.
      def sectorOffset(sid: Int): Int = (sid + 1) * sectSize

      // FAT sector ids: 109 header DIFAT entries + chained DIFAT sectors
      val fatSectors = {
        val ids = Seq.newBuilder[Int]
        var taken = 0
        var i = 0
        while (i < 109 && taken < numFat) {
          val id = u32(bytes, 76 + i * 4)
          if (id >= 0) { ids += id; taken += 1 }
          i += 1
        }
        var difat = firstDifat
        var guard = 0
        while (difat >= 0 && difat != EndOfChain && guard < MaxChain) {
          val base = sectorOffset(difat)
          var j = 0
          while (j < idsPerSect - 1 && taken < numFat) {
            val id = u32(bytes, base + j * 4)
            if (id >= 0) { ids += id; taken += 1 }
            j += 1
          }
          difat = u32(bytes, base + (idsPerSect - 1) * 4)
          guard += 1
        }
        ids.result()
      }
      val fat: Array[Int] = fatSectors.toArray.flatMap { sid =>
        val base = sectorOffset(sid)
        Array.tabulate(idsPerSect)(j => u32(bytes, base + j * 4))
      }

      def chain(start: Int): Seq[Int] = {
        val out = Seq.newBuilder[Int]
        var sid = start
        var guard = 0
        while (sid >= 0 && sid != EndOfChain && guard < MaxChain) {
          out += sid
          sid = if (sid < fat.length) fat(sid) else EndOfChain
          guard += 1
        }
        out.result()
      }

      def readChain(start: Int, size: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start).foreach { sid =>
          val off = sectorOffset(sid)
          out.write(bytes, off, math.min(sectSize, bytes.length - off))
        }
        val all = out.toByteArray
        if (size >= 0 && size < all.length) all.take(size.toInt) else all
      }

      // directory entries (128 bytes each) from the directory chain
      val dirBytes = readChain(firstDir, -1L)
      final case class Entry(name: String, objType: Int, start: Int, size: Long)
      val entries = (0 until dirBytes.length / 128).map { i =>
        val o = i * 128
        val nameLen = u16(dirBytes, o + 64) // bytes incl. terminator
        val name =
          if (nameLen >= 2)
            new String(dirBytes, o, nameLen - 2, "UTF-16LE")
          else ""
        Entry(name, dirBytes(o + 66) & 0xff, u32(dirBytes, o + 116),
          u32(dirBytes, o + 120).toLong & 0xFFFFFFFFL)
      }
      val root = entries.find(_.objType == 5).getOrElse(return None)

      entries.find(e => e.objType == 2 && names.contains(e.name)).map { e =>
        if (e.size >= miniCutoff) readChain(e.start, e.size)
        else {
          // mini-stream path: 64-byte sectors inside the root stream,
          // chained by the miniFAT (itself a regular FAT chain)
          val miniStream = readChain(root.start, root.size)
          val miniFatBytes = readChain(firstMiniFat, -1L)
          val miniFat = Array.tabulate(miniFatBytes.length / 4)(j =>
            u32(miniFatBytes, j * 4))
          val out = new java.io.ByteArrayOutputStream()
          var sid = e.start
          var guard = 0
          while (sid >= 0 && sid != EndOfChain && guard < MaxChain) {
            val off = sid * miniSize
            if (off < miniStream.length)
              out.write(miniStream, off,
                math.min(miniSize, miniStream.length - off))
            sid = if (sid < miniFat.length) miniFat(sid) else EndOfChain
            guard += 1
          }
          val all = out.toByteArray
          if (e.size < all.length) all.take(e.size.toInt) else all
        }
      }
    } catch { case _: Exception => None }
  }
}
