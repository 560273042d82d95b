package graft.pdf.crypto

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._

/** RC4 stream cipher (40-128 bit) — tiny, public algorithm. */
object Rc4 {
  def apply(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
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
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }
}

/** SHA-2 "hardened hash" for R6 key derivation (ISO 32000-2
  * Algorithm 2.B): 64+ rounds of AES-128-CBC over password‖K‖udata
  * ×64 with SHA-256/384/512 selected by the cipher output. */
object R6Hash {
  def apply(password: Array[Byte], salt: Array[Byte],
            udata: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    var k = MessageDigest.getInstance("SHA-256")
      .digest(password ++ salt ++ udata)
    var round = 0
    var done = false
    var lastE: Array[Byte] = Array.emptyByteArray
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(java.util.Arrays.copyOf(k, 16), "AES"),
        new IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      lastE = c.doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += lastE(i) & 0xff; i += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = MessageDigest.getInstance(alg).digest(lastE)
      round += 1
      if (round >= 64 && (lastE(lastE.length - 1) & 0xff) <= round - 32) done = true
    }
    java.util.Arrays.copyOf(k, 32)
  }
}

/** Standard security handler, empty-user-password scope (reference:
  * src/encryption/handler.rs:38-171 — it too auto-authenticates the
  * empty password, document.rs:276-288). Supports V1/V2 (RC4), V4
  * with /CFM AESV2 (AES-128-CBC), and V5/R6 with /CFM AESV3
  * (AES-256-CBC, SHA-2 hardened key derivation via /U //UE).
  */
final class StdSecurityHandler(encDict: Dict, fileId: Array[Byte]) {

  /** Standard 32-byte password pad (ISO 32000-1 Table 7.6.3.3-1). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41, 0x64, 0x00, 0x4e, 0x56,
    0xff, 0xfa, 0x01, 0x08, 0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  val v: Int = encDict.long("V").getOrElse(0L).toInt
  val r: Int = encDict.long("R").getOrElse(2L).toInt
  private val lengthBits: Int = encDict.long("Length").getOrElse(40L).toInt
  private val keyLen: Int = if (v == 1) 5 else math.max(5, math.min(16, lengthBits / 8))

  /** crypt-filter method: "V2" = RC4, "AESV2"/"AESV3" = AES-CBC. */
  val cfm: String =
    if (v < 4) "V2"
    else {
      val cf = encDict.get("CF").flatMap(_.asDict).getOrElse(Dict.empty)
      val stmF = encDict.name("StmF").getOrElse("StdCF")
      cf.get(stmF).flatMap(_.asDict).flatMap(_.name("CFM"))
        .getOrElse(if (v == 5) "AESV3" else "V2")
    }

  if (v > 5) throw new UnsupportedOperationException(s"encryption V=$v not supported")
  if (cfm != "V2" && cfm != "AESV2" && cfm != "AESV3")
    throw new UnsupportedOperationException(s"crypt filter $cfm not supported")

  /** File key from the EMPTY user password. V≤4: Algorithm 2 (MD5/RC4
    * lineage). V5/R6: /U = hash(pw‖validationSalt) ‖ vs ‖ ks; file key
    * decrypted from /UE with key hash(pw‖keySalt) (Algorithm 2.A). */
  val fileKey: Array[Byte] = if (v == 5) {
    val u = encDict.get("U").flatMap(_.asStr)
      .getOrElse(throw new UnsupportedOperationException("V5 without /U"))
    val ue = encDict.get("UE").flatMap(_.asStr)
      .getOrElse(throw new UnsupportedOperationException("V5 without /UE"))
    require(u.length >= 48, "V5 /U must be 48 bytes")
    val validationSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val keySalt = java.util.Arrays.copyOfRange(u, 40, 48)
    // validate the empty user password (lenient: proceed regardless,
    // like the reference's auto-auth — garbage keys yield error rows)
    val expected = R6Hash(Array.emptyByteArray, validationSalt)
    val _ok = java.util.Arrays.equals(expected, java.util.Arrays.copyOf(u, 32))
    val inter = R6Hash(Array.emptyByteArray, keySalt)
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(inter, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    c.doFinal(java.util.Arrays.copyOf(ue, 32))
  } else {
    val md = MessageDigest.getInstance("MD5")
    md.update(Pad) // empty password → pad alone
    val o = encDict.get("O").flatMap(_.asStr).getOrElse(Array.emptyByteArray)
    md.update(o, 0, math.min(32, o.length))
    val p = encDict.long("P").getOrElse(-1L).toInt
    md.update(Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte))
    md.update(fileId)
    val encryptMetadata = encDict.get("EncryptMetadata") match {
      case Some(Bool(b)) => b
      case _             => true
    }
    if (r >= 4 && !encryptMetadata)
      md.update(Array[Byte](-1, -1, -1, -1))
    var digest = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        val m2 = MessageDigest.getInstance("MD5")
        m2.update(digest, 0, keyLen)
        digest = m2.digest()
        i += 1
      }
    }
    java.util.Arrays.copyOf(digest, keyLen)
  }

  /** Per-object key (Algorithm 1): MD5(fileKey ‖ num₃LE ‖ gen₂LE
    * [‖ sAlT for AES]), truncated to min(keyLen+5, 16). V5 uses the
    * file key directly (no per-object derivation). */
  private def objectKey(num: Int, gen: Int): Array[Byte] = {
    if (v == 5) return fileKey
    val md = MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      gen.toByte, (gen >> 8).toByte))
    if (cfm == "AESV2") md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54)) // "sAlT"
    java.util.Arrays.copyOf(md.digest(), math.min(keyLen + 5, 16))
  }

  def decrypt(data: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    if (data.isEmpty) return data
    val key = objectKey(num, gen)
    if (cfm == "AESV2" || cfm == "AESV3") {
      if (data.length < 16) return Array.emptyByteArray
      val iv = java.util.Arrays.copyOf(data, 16)
      try {
        val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
        c.doFinal(data, 16, data.length - 16)
      } catch {
        case _: Throwable =>
          // lenient: NoPadding + manual strip for non-conformant producers
          try {
            val c = Cipher.getInstance("AES/CBC/NoPadding")
            c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
            val out = c.doFinal(data, 16, data.length - 16)
            val padLen = if (out.nonEmpty) out(out.length - 1) & 0xff else 0
            if (padLen >= 1 && padLen <= 16 && padLen <= out.length)
              java.util.Arrays.copyOf(out, out.length - padLen)
            else out
          } catch { case _: Throwable => Array.emptyByteArray }
      }
    } else Rc4(key, data)
  }

  def encrypt(data: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    // test-support: RC4 is symmetric; AES encrypt used by fixtures
    val key = objectKey(num, gen)
    if (cfm == "AESV2" || cfm == "AESV3") {
      val iv = new Array[Byte](16)
      // deterministic IV for fixture reproducibility (fine for tests)
      var i = 0
      while (i < 16) { iv(i) = ((num * 31 + gen * 7 + i) & 0xff).toByte; i += 1 }
      val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    } else Rc4(key, data)
  }

  /** /U entry for the empty user password (Algorithms 4/5) — lets
    * fixtures produce structurally conformant files. */
  def computeU(): Array[Byte] = {
    if (r == 2) Rc4(fileKey, Pad)
    else {
      val md = MessageDigest.getInstance("MD5")
      md.update(Pad)
      md.update(fileId)
      var x = Rc4(fileKey, md.digest())
      var i = 1
      while (i <= 19) {
        val k = fileKey.map(b => (b ^ i).toByte)
        x = Rc4(k, x)
        i += 1
      }
      x ++ new Array[Byte](16) // arbitrary 16-byte pad
    }
  }
}

object StdSecurityHandler {
  /** Build from a trailer's /Encrypt (resolved) + /ID. Returns None for
    * non-Standard or unsupported configurations. */
  def fromTrailer(encDict: Dict, idObj: PdfObj): Option[StdSecurityHandler] = {
    if (!encDict.name("Filter").forall(_ == "Standard")) return None
    val fileId: Array[Byte] = idObj match {
      case Arr(items) if items.nonEmpty =>
        items.head.asStr.getOrElse(Array.emptyByteArray)
      case _ => Array.emptyByteArray
    }
    try Some(new StdSecurityHandler(encDict, fileId))
    catch { case _: Throwable => None }
  }
}
