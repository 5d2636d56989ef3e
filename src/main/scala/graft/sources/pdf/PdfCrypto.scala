package graft.sources.pdf

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import PdfParser._

/** Standard security handler (ISO 32000-1 §7.6, 32000-2 §7.6.4) — the
  * encryption layer the round-4 review listed as the parser's largest
  * remaining real-world gap (tabula/PDFBox handle encrypted files; most
  * "secured" PDFs in the wild use an EMPTY user password so readers can
  * open them, which is exactly the case supported here).
  *
  * Supported: /Filter /Standard with
  *   - V1/V2 (RC4, 40..128-bit, R2/R3) — §7.6.3.1-2,
  *   - V4 with /CFM /V2 (RC4) or /AESV2 (AES-128-CBC, R4) — §7.6.3.3,
  *   - V5 with /AESV3 (AES-256, R5 and the ISO 32000-2 R6 hardened hash),
  * each validated/derived from the empty user password. Password-locked
  * files (non-empty user password) and public-key (/Filter /Adobe.PPKLite)
  * handlers are out of scope — the document then parses as if its streams
  * were unreadable, surfacing the importer's never-throw Failed answer.
  *
  * RC4 is hand-rolled (10 lines, avoids JCE provider variance for a
  * legacy cipher); AES-CBC comes from the always-present JDK SunJCE.
  */
object PdfCrypto {

  /** §7.6.3.3 algorithm 2's 32-byte password pad. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Per-document decryptor. `aes` selects CBC-with-IV payloads; for
    * V5 (`useObjectKey = false`) the file key is used directly. */
  final class Decryptor(
      fileKey: Array[Byte],
      aes: Boolean,
      useObjectKey: Boolean) {

    /** Decrypt one string/stream payload belonging to object (num, gen). */
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val key = if (useObjectKey) objectKey(num, gen) else fileKey
      if (aes) aesCbcDecrypt(key, data) else rc4(key, data)
    }

    /** §7.6.2 algorithm 1: per-object key = MD5(fileKey ∥ objnum₃LE ∥
      * gen₂LE [∥ "sAlT" for AES]), truncated to min(len+5, 16). */
    private def objectKey(num: Int, gen: Int): Array[Byte] = {
      val md = MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54)) // "sAlT"
      md.digest().take(math.min(fileKey.length + 5, 16))
    }
  }

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-CBC with the 16-byte IV prepended to the payload (§7.6.2) and
    * PKCS#5 padding stripped; malformed payloads decrypt to empty. */
  private def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length % 16) != 0)
      return Array.emptyByteArray
    try {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(data.take(16)))
      val plain = c.doFinal(data.drop(16))
      val padLen = plain.last & 0xff
      if (padLen >= 1 && padLen <= 16 && padLen <= plain.length)
        plain.dropRight(padLen)
      else plain
    } catch { case _: Exception => Array.emptyByteArray }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** Build a decryptor from the trailer's /Encrypt dict + /ID, trying the
    * empty user password. None ⇒ unsupported scheme or wrong password. */
  def fromEncrypt(
      resolve: PObj => PObj,
      encrypt: PDict,
      fileId: Array[Byte]): Option[Decryptor] = {
    def num(k: String): Option[Int] = resolve(encrypt.entries.getOrElse(k, PNull)) match {
      case PNum(v) => Some(v.toInt); case _ => None
    }
    def str(k: String): Option[Array[Byte]] = resolve(encrypt.entries.getOrElse(k, PNull)) match {
      case PString(b) => Some(b); case _ => None
    }
    val filter = resolve(encrypt.entries.getOrElse("Filter", PNull)) match {
      case PName(n) => n; case _ => return None
    }
    if (filter != "Standard") return None
    val v = num("V").getOrElse(0)
    val r = num("R").getOrElse(2)
    val o = str("O").getOrElse(return None)
    val p = num("P").getOrElse(-1)

    if (v == 5) {
      // R5/R6 AES-256 (§7.6.4.3.3 / .4): U = hash48(pwd, valSalt) ∥
      // valSalt(8) ∥ keySalt(8); file key = AES-CBC-noIV-decrypt(UE) with
      // hash(pwd, keySalt)
      val u = str("U").getOrElse(return None)
      val ue = str("UE").getOrElse(return None)
      if (u.length < 48 || ue.length != 32) return None
      val valSalt = u.slice(32, 40)
      val keySalt = u.slice(40, 48)
      val pwd = Array.emptyByteArray
      val expected = hash2b(r, pwd, valSalt, Array.emptyByteArray)
      if (!java.util.Arrays.equals(expected, u.take(32))) return None
      val ikey = hash2b(r, pwd, keySalt, Array.emptyByteArray)
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(ikey, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      val fileKey = c.doFinal(ue)
      return Some(new Decryptor(fileKey, aes = true, useObjectKey = false))
    }

    // V1/V2/V4: RC4-family key schedule (§7.6.3.3 algorithm 2)
    val lengthBits = num("Length").getOrElse(40)
    val keyLen = if (v == 1) 5 else lengthBits / 8
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    var key = md5(Pad, o.take(32), pLe, fileId).take(keyLen)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(keyLen); i += 1 }
    }
    // Validate the empty USER password (algorithms 4/5, §7.6.3.4): R2's
    // U is RC4(key, pad); R3+'s first 16 U bytes are the 20-pass XOR-key
    // RC4 of MD5(pad ∥ fileId). A mismatch means the file needs a real
    // password — report unsupported instead of emitting garbage text.
    str("U").foreach { u =>
      val ok =
        if (r == 2) java.util.Arrays.equals(u.take(32), rc4(key, Pad))
        else {
          var x = md5(Pad, fileId)
          var pass = 0
          while (pass < 20) {
            val kp = key.map(b => (b ^ pass).toByte)
            x = rc4(kp, x)
            pass += 1
          }
          java.util.Arrays.equals(u.take(16), x.take(16))
        }
      if (!ok) return None
    }
    // AES vs RC4 for V4 comes from /CF → /StdCF → /CFM
    val aes = v == 4 && (for {
      cf <- Some(resolve(encrypt.entries.getOrElse("CF", PNull)))
        .collect { case d: PDict => d }
      std <- Some(resolve(cf.entries.getOrElse("StdCF", PNull)))
        .collect { case d: PDict => d }
      cfm <- Some(resolve(std.entries.getOrElse("CFM", PNull)))
        .collect { case PName(n) => n }
    } yield cfm == "AESV2").getOrElse(false)
    Some(new Decryptor(key, aes, useObjectKey = true))
  }

  /** §7.6.4.3.4 algorithm 2.B — the R6 iterated hash (R5: plain SHA-256).
    * `extra` is the 48-byte U entry when computing owner-password hashes
    * (empty for user-password hashes). */
  private def hash2b(r: Int, pwd: Array[Byte], salt: Array[Byte],
      extra: Array[Byte]): Array[Byte] = {
    val sha256 = MessageDigest.getInstance("SHA-256")
    sha256.update(pwd); sha256.update(salt); sha256.update(extra)
    var k = sha256.digest()
    if (r == 5) return k
    var round = 0
    var lastByte = 0
    var done = false
    while (!done) {
      // K1 = (pwd ∥ K ∥ extra) × 64; E = AES-128-CBC(key=K[0..15],
      // iv=K[16..31], K1); K = SHA-(256+((E[0..15] mod 3)·64))(E)
      val block = pwd ++ k ++ extra
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1
      }
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val mod = (e.take(16).foldLeft(0)((acc, b) => acc + (b & 0xff))) % 3
      val algo = mod match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = MessageDigest.getInstance(algo).digest(e)
      lastByte = e(e.length - 1) & 0xff
      round += 1
      done = round >= 64 && lastByte <= round - 32
    }
    k.take(32)
  }
}
