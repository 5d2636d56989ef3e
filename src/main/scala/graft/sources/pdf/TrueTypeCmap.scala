package graft.sources.pdf

/** GID → Unicode recovery from an embedded TrueType/OpenType font program
  * (`/FontFile2`), for Identity-H CID fonts that ship WITHOUT a
  * `/ToUnicode` CMap — the common case in the wild (ISO 32000-1 §9.6.6.4
  * names exactly this fallback: "the font's 'cmap' table shall be used").
  * With `/Encoding /Identity-H` the 2-byte string codes ARE CIDs, the
  * default `/CIDToGIDMap /Identity` makes CID = GID, and the font's own
  * 'cmap' (Unicode → GID) inverted gives GID → Unicode.
  *
  * Parses the sfnt table directory and 'cmap' subtable formats 4
  * (segmented BMP — the overwhelmingly common one) and 12 (u32 groups),
  * preferring (platform 3, encoding 10), then (3, 1), then platform 0 —
  * the standard Unicode-subtable priority. Everything is bounds-checked;
  * malformed fonts yield an empty map (the caller keeps its code-point
  * fallback). All from the public TrueType/OpenType 'cmap' spec; the
  * reference gets this behavior from tabula's PDFBox dependency
  * (`/root/reference/main.py:371-412`).
  */
object TrueTypeCmap {

  /** Inverted 'cmap': glyph id → Unicode string (smallest code point wins
    * when several map to one glyph, so the result is deterministic). */
  def gidToUnicode(font: Array[Byte]): Map[Int, String] = {
    try {
      val uni2gid = unicodeToGid(font)
      val out = scala.collection.mutable.HashMap.empty[Int, Int]
      uni2gid.foreach { case (u, g) =>
        if (!out.get(g).exists(_ <= u)) out(g) = u
      }
      out.iterator
        .map { case (g, u) => g -> new String(Character.toChars(u)) }
        .toMap
    } catch { case _: Exception => Map.empty }
  }

  /** The font's best Unicode 'cmap' subtable as code point → GID. */
  def unicodeToGid(b: Array[Byte]): Map[Int, Int] = {
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      (u16(o).toLong << 16) | u16(o + 2).toLong
    if (b.length < 12) return Map.empty
    val numTables = u16(4)
    var cmapOff = -1L
    var i = 0
    while (i < numTables && cmapOff < 0) {
      val rec = 12 + 16 * i
      if (rec + 16 > b.length) return Map.empty
      val tag = new String(b, rec, 4, "ISO-8859-1")
      if (tag == "cmap") cmapOff = u32(rec + 8)
      i += 1
    }
    if (cmapOff < 0 || cmapOff + 4 > b.length) return Map.empty
    val c = cmapOff.toInt
    val n = u16(c + 2)
    // encoding-record priority: (3,10) full Unicode, (3,1) BMP, platform 0
    var best = -1L
    var bestRank = Int.MaxValue
    var j = 0
    while (j < n) {
      val rec = c + 4 + 8 * j
      if (rec + 8 > b.length) return Map.empty
      val (plat, enc, off) = (u16(rec), u16(rec + 2), u32(rec + 4))
      val rank = (plat, enc) match {
        case (3, 10) => 0
        case (3, 1)  => 1
        case (0, _)  => 2
        case _       => 9
      }
      if (rank < bestRank) { bestRank = rank; best = c + off }
      j += 1
    }
    if (best < 0 || bestRank == 9 || best + 2 > b.length) return Map.empty
    val s = best.toInt
    u16(s) match {
      case 4 =>
        val segCount = u16(s + 6) / 2
        val endAt = s + 14
        val startAt = endAt + 2 * segCount + 2
        val deltaAt = startAt + 2 * segCount
        val rangeAt = deltaAt + 2 * segCount
        if (rangeAt + 2 * segCount > b.length) return Map.empty
        val out = Map.newBuilder[Int, Int]
        var seg = 0
        while (seg < segCount) {
          val end = u16(endAt + 2 * seg)
          val start = u16(startAt + 2 * seg)
          val delta = u16(deltaAt + 2 * seg)
          val ro = u16(rangeAt + 2 * seg)
          var ch = start
          while (ch <= end && ch != 0xffff) {
            val gid =
              if (ro == 0) (ch + delta) & 0xffff
              else {
                val addr = rangeAt + 2 * seg + ro + 2 * (ch - start)
                if (addr + 2 > b.length) 0
                else {
                  val g = u16(addr)
                  if (g == 0) 0 else (g + delta) & 0xffff
                }
              }
            if (gid != 0) out += ch -> gid
            ch += 1
          }
          seg += 1
        }
        out.result()
      case 12 =>
        val nGroups = u32(s + 12)
        if (nGroups > 100000 || s + 16 + 12 * nGroups > b.length)
          return Map.empty
        val out = Map.newBuilder[Int, Int]
        var g = 0
        while (g < nGroups) {
          val rec = s + 16 + 12 * g
          val start = u32(rec).toInt
          val end = u32(rec + 4).toInt
          val gid0 = u32(rec + 8).toInt
          var ch = start
          // cap pathological group widths; real groups are narrow
          while (ch <= end && ch - start < 65536) {
            if (Character.isValidCodePoint(ch)) out += ch -> (gid0 + ch - start)
            ch += 1
          }
          g += 1
        }
        out.result()
      case _ => Map.empty
    }
  }
}
