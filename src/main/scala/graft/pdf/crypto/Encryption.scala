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

/** Standard security handler with full password authentication
  * (reference: src/encryption/handler.rs:71-100 authenticate();
  * algorithms.rs:35-188 — the reference verifies USER passwords for
  * V≤4 and auto-auths the empty password, document.rs:276-288; this
  * implementation additionally verifies OWNER passwords, ISO 32000-1
  * Algorithms 3/7, and both password kinds for V5 via ISO 32000-2
  * Algorithm 2.A). Supports V1/V2 (RC4), V4 with /CFM AESV2
  * (AES-128-CBC), and V5 R5/R6 with /CFM AESV3 (AES-256-CBC).
  *
  * Auth ladder: user(password) → owner(password) → user("") →
  * owner(""). On total failure the handler stays constructible with a
  * lenient empty-password key (`authMode = "none"`) so the caller
  * decides the failure policy (ExtractJob maps it to an error row).
  */
final class StdSecurityHandler(encDict: Dict, fileId: Array[Byte],
                               password: Array[Byte] = Array.emptyByteArray) {

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

  private val oEntry = encDict.get("O").flatMap(_.asStr).getOrElse(Array.emptyByteArray)
  private val uEntry = encDict.get("U").flatMap(_.asStr).getOrElse(Array.emptyByteArray)
  private val pFlags = encDict.long("P").getOrElse(-1L).toInt
  private val encryptMetadata = encDict.get("EncryptMetadata") match {
    case Some(Bool(b)) => b
    case _             => true
  }

  /** Pad/truncate a password to exactly 32 bytes (ISO 32000-1 Alg 2a). */
  private def pad32(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pw.length, 32)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  /** Algorithm 2: file key from an already-padded 32-byte password. */
  private def keyFromPadded(padded: Array[Byte]): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(padded)
    md.update(oEntry, 0, math.min(32, oEntry.length))
    md.update(Array[Byte](pFlags.toByte, (pFlags >> 8).toByte,
      (pFlags >> 16).toByte, (pFlags >> 24).toByte))
    md.update(fileId)
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

  /** Algorithm 4 (r2) / 5 (r≥3): expected /U for a candidate key. */
  private def expectedU(key: Array[Byte]): Array[Byte] = {
    if (r == 2) Rc4(key, Pad)
    else {
      val md = MessageDigest.getInstance("MD5")
      md.update(Pad)
      md.update(fileId)
      var x = md.digest()
      var i = 0
      while (i < 20) {
        x = Rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x
    }
  }

  /** User-password auth for V≤4 (reference algorithms.rs:106-138):
    * derive key via Algorithm 2, verify the first 16 (32 for r2) bytes
    * of /U. */
  private def authUserV4(pw: Array[Byte]): Option[Array[Byte]] = {
    val key = keyFromPadded(pad32(pw))
    val n = if (r == 2) 32 else 16
    val exp = expectedU(key)
    if (uEntry.length >= n && exp.length >= n &&
        java.util.Arrays.equals(java.util.Arrays.copyOf(exp, n),
          java.util.Arrays.copyOf(uEntry, n))) Some(key)
    else None
  }

  /** Owner-password auth for V≤4 (Algorithms 3 step a-d + 7): RC4-key
    * from the owner password, decrypt /O back to the padded USER
    * password, then verify that via Algorithm 4/5. (Beyond the
    * reference, whose owner path is a TODO — handler.rs:92-93.) */
  private def authOwnerV4(pw: Array[Byte]): Option[Array[Byte]] = {
    if (oEntry.length < 32) return None
    var digest = MessageDigest.getInstance("MD5").digest(pad32(pw))
    if (r >= 3) {
      var i = 0
      while (i < 50) { digest = MessageDigest.getInstance("MD5").digest(digest); i += 1 }
    }
    val rc4Key = java.util.Arrays.copyOf(digest, keyLen)
    var data = java.util.Arrays.copyOf(oEntry, 32)
    if (r == 2) data = Rc4(rc4Key, data)
    else {
      var i = 19
      while (i >= 0) {
        data = Rc4(rc4Key.map(b => (b ^ i).toByte), data)
        i -= 1
      }
    }
    // data is now the PADDED user password — feed Algorithm 2 directly
    val key = keyFromPadded(data)
    val n = if (r == 2) 32 else 16
    val exp = expectedU(key)
    if (uEntry.length >= n &&
        java.util.Arrays.equals(java.util.Arrays.copyOf(exp, n),
          java.util.Arrays.copyOf(uEntry, n))) Some(key)
    else None
  }

  /** V5 password hash: R5 = plain SHA-256(pw‖salt‖udata); R6 = the
    * hardened Algorithm 2.B loop. Passwords are capped at 127 bytes of
    * UTF-8 (ISO 32000-2 7.6.4.3.3). */
  private def hashV5(pw: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    val p = if (pw.length > 127) java.util.Arrays.copyOf(pw, 127) else pw
    if (r <= 5) MessageDigest.getInstance("SHA-256").digest(p ++ salt ++ udata)
    else R6Hash(p, salt, udata)
  }

  private def aesNoIvDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    c.doFinal(data)
  }

  /** V5 user auth (ISO 32000-2 Algorithm 2.A / 11): /U =
    * hash(pw‖validationSalt) ‖ vs ‖ ks; file key = AES-dec(/UE) with
    * hash(pw‖keySalt). */
  private def authUserV5(pw: Array[Byte]): Option[Array[Byte]] = {
    if (uEntry.length < 48) return None
    val ue = encDict.get("UE").flatMap(_.asStr).getOrElse(return None)
    if (ue.length < 32) return None
    val vs = java.util.Arrays.copyOfRange(uEntry, 32, 40)
    val ks = java.util.Arrays.copyOfRange(uEntry, 40, 48)
    if (!java.util.Arrays.equals(hashV5(pw, vs, Array.emptyByteArray),
        java.util.Arrays.copyOf(uEntry, 32))) return None
    Some(aesNoIvDecrypt(hashV5(pw, ks, Array.emptyByteArray),
      java.util.Arrays.copyOf(ue, 32)))
  }

  /** V5 owner auth (Algorithm 2.A / 12): like user auth but salts come
    * from /O and the full 48-byte /U participates as udata; file key
    * decrypts from /OE. */
  private def authOwnerV5(pw: Array[Byte]): Option[Array[Byte]] = {
    if (oEntry.length < 48 || uEntry.length < 48) return None
    val oe = encDict.get("OE").flatMap(_.asStr).getOrElse(return None)
    if (oe.length < 32) return None
    val u48 = java.util.Arrays.copyOf(uEntry, 48)
    val vs = java.util.Arrays.copyOfRange(oEntry, 32, 40)
    val ks = java.util.Arrays.copyOfRange(oEntry, 40, 48)
    if (!java.util.Arrays.equals(hashV5(pw, vs, u48),
        java.util.Arrays.copyOf(oEntry, 32))) return None
    Some(aesNoIvDecrypt(hashV5(pw, ks, u48), java.util.Arrays.copyOf(oe, 32)))
  }

  /** Auth ladder result: (key, mode). Lenient fallback derives the
    * empty-user key without validation — like the reference's
    * auto-auth, garbage keys surface as error rows downstream. */
  private val authResult: (Array[Byte], String) = {
    val empty = Array.emptyByteArray
    val ladder: Seq[(Array[Byte], String)] =
      Seq((password, "user"), (password, "owner"), (empty, "user"), (empty, "owner"))
    val hit = ladder.view.flatMap { case (pw, mode) =>
      val k = (v, mode) match {
        case (5, "user")  => authUserV5(pw)
        case (5, "owner") => authOwnerV5(pw)
        case (_, "user")  => authUserV4(pw)
        case (_, "owner") => authOwnerV4(pw)
      }
      k.map(_ -> mode)
    }.headOption
    hit.getOrElse {
      // Lenient: derive a key from the SUPPLIED password without
      // verification (dicts lacking /U can't verify anything; fixture
      // builders rely on this to mint keys before /U exists).
      if (v == 5) {
        val ue = encDict.get("UE").flatMap(_.asStr)
          .getOrElse(throw new UnsupportedOperationException("V5 without /UE"))
        require(uEntry.length >= 48, "V5 /U must be 48 bytes")
        val ks = java.util.Arrays.copyOfRange(uEntry, 40, 48)
        (aesNoIvDecrypt(hashV5(password, ks, Array.emptyByteArray),
          java.util.Arrays.copyOf(ue, 32)), "none")
      } else (keyFromPadded(pad32(password)), "none")
    }
  }

  val fileKey: Array[Byte] = authResult._1

  /** "user" | "owner" | "none" (none = nothing verified; lenient key). */
  val authMode: String = authResult._2
  def authenticated: Boolean = authMode != "none"

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

  /** /U entry for the CURRENT file key (Algorithms 4/5) — lets
    * fixtures produce structurally conformant files. */
  def computeU(): Array[Byte] = {
    val x = expectedU(fileKey)
    if (r == 2) x else x ++ new Array[Byte](16) // arbitrary 16-byte pad
  }

  /** Fixture support: /O for a given owner/user password pair
    * (Algorithm 3 complete), so specs can build files that only open
    * with the right password. */
  def computeO(ownerPw: Array[Byte], userPw: Array[Byte]): Array[Byte] = {
    var digest = MessageDigest.getInstance("MD5").digest(pad32(ownerPw))
    if (r >= 3) {
      var i = 0
      while (i < 50) { digest = MessageDigest.getInstance("MD5").digest(digest); i += 1 }
    }
    val rc4Key = java.util.Arrays.copyOf(digest, keyLen)
    var data = pad32(userPw)
    if (r == 2) data = Rc4(rc4Key, data)
    else {
      var i = 0
      while (i <= 19) {
        data = Rc4(rc4Key.map(b => (b ^ i).toByte), data)
        i += 1
      }
    }
    data
  }
}

object StdSecurityHandler {
  /** Build from a trailer's /Encrypt (resolved) + /ID. Returns None for
    * non-Standard or unsupported configurations. */
  def fromTrailer(encDict: Dict, idObj: PdfObj,
                  password: Array[Byte] = Array.emptyByteArray): Option[StdSecurityHandler] = {
    if (!encDict.name("Filter").forall(_ == "Standard")) return None
    val fileId: Array[Byte] = idObj match {
      case Arr(items) if items.nonEmpty =>
        items.head.asStr.getOrElse(Array.emptyByteArray)
      case _ => Array.emptyByteArray
    }
    try Some(new StdSecurityHandler(encDict, fileId, password))
    catch { case _: Throwable => None }
  }
}
