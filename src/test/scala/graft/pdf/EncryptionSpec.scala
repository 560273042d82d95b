package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._
import graft.pdf.crypto.{Rc4, StdSecurityHandler}
import graft.pdf.testgen.PdfBuilder

/** Empty-user-password encryption (reference scope: auto-auth of the
  * empty password, document.rs:276-288; handler.rs:38-171). Fixtures
  * are built with the same key-derivation primitives (self-consistent
  * round-trip) plus an independent RC4 known-answer vector. */
class EncryptionSpec extends AnyFunSuite {

  test("RC4 known-answer vector (RFC 6229 style: Key/Plaintext)") {
    // classic test vector: key "Key", plaintext "Plaintext" → BBF316E8D940AF0AD3
    val out = Rc4("Key".getBytes, "Plaintext".getBytes)
    assert(out.map(b => f"${b & 0xff}%02X").mkString == "BBF316E8D940AF0AD3")
  }

  private val fileId: Array[Byte] =
    (0 until 16).map(i => (i * 17 + 3).toByte).toArray
  private def idHex: String = fileId.map(b => f"${b & 0xff}%02X").mkString

  private def encDictObj(v: Int, r: Int, length: Int, cf: String): Dict = {
    val o = (0 until 32).map(i => (i * 7 + 1).toByte).toArray // arbitrary /O
    val base = Map[String, PdfObj](
      "Filter" -> Name("Standard"),
      "V" -> Int64(v), "R" -> Int64(r), "Length" -> Int64(length),
      "P" -> Int64(-3904L), "O" -> Str(o))
    val withCf =
      if (cf.isEmpty) base
      else base ++ Map(
        "CF" -> Dict(Map("StdCF" -> Dict(Map(
          "CFM" -> Name(cf), "Length" -> Int64(16))))),
        "StmF" -> Name("StdCF"), "StrF" -> Name("StdCF"))
    Dict(withCf)
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

  private def encryptedPdf(v: Int, r: Int, length: Int, cf: String,
                           text: String): Array[Byte] = {
    val ed = encDictObj(v, r, length, cf)
    val h = new StdSecurityHandler(ed, fileId)
    val b = new PdfBuilder()
    val catId = b.reserveId()   // 1
    val pagesId = b.reserveId() // 2
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>") // 3
    val contentId = b.reserveId() // 4
    val content = s"BT /F1 12 Tf 100 700 Td (${PdfBuilder.esc(text)}) Tj ET".getBytes(ISO_8859_1)
    val enc = h.encrypt(content, contentId, 0)
    b.addStreamAt(contentId, "", enc, flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $contentId 0 R >>") // 5
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val oHex = hex(ed.get("O").get.asStr.get)
    val uHex = hex(h.computeU().take(32).padTo(32, 0.toByte))
    val cfStr = if (cf.isEmpty) ""
      else s"/CF << /StdCF << /CFM /$cf /Length 16 >> >> /StmF /StdCF /StrF /StdCF "
    val encId = b.addObject(s"<< /Filter /Standard /V $v /R $r /Length $length " +
      s"/P -3904 /O <$oHex> /U <$uHex> $cfStr>>")
    b.build(catId, s"/Encrypt $encId 0 R /ID [<$idHex> <$idHex>] ")
  }

  test("RC4 40-bit (V1/R2) encrypted content stream decrypts") {
    val pdf = encryptedPdf(v = 1, r = 2, length = 40, cf = "", text = "Secret forty")
    assert(PdfExtractor.extract(pdf).text == "Secret forty")
  }

  test("RC4 128-bit (V2/R3) encrypted content stream decrypts") {
    val pdf = encryptedPdf(v = 2, r = 3, length = 128, cf = "", text = "Secret one two eight")
    assert(PdfExtractor.extract(pdf).text == "Secret one two eight")
  }

  test("AES-128 (V4/R4 AESV2) encrypted content stream decrypts") {
    val pdf = encryptedPdf(v = 4, r = 4, length = 128, cf = "AESV2", text = "Secret aes payload")
    assert(PdfExtractor.extract(pdf).text == "Secret aes payload")
  }

  test("AES-256 (V5/R6 AESV3) with empty user password decrypts") {
    import javax.crypto.Cipher
    import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
    import graft.pdf.crypto.R6Hash
    val fileKey = (0 until 32).map(i => (i * 11 + 5).toByte).toArray
    val vs = (0 until 8).map(i => (i + 1).toByte).toArray
    val ks = (0 until 8).map(i => (i + 101).toByte).toArray
    val u = R6Hash(Array.emptyByteArray, vs) ++ vs ++ ks
    val inter = R6Hash(Array.emptyByteArray, ks)
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(inter, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    val ue = c.doFinal(fileKey)
    val o = new Array[Byte](48) // owner entries unused for empty-user auth
    val oe = new Array[Byte](32)
    val ed = Dict(Map(
      "Filter" -> Name("Standard"), "V" -> Int64(5), "R" -> Int64(6),
      "Length" -> Int64(256), "P" -> Int64(-3904L),
      "U" -> Str(u), "UE" -> Str(ue), "O" -> Str(o), "OE" -> Str(oe),
      "CF" -> Dict(Map("StdCF" -> Dict(Map("CFM" -> Name("AESV3"), "Length" -> Int64(32))))),
      "StmF" -> Name("StdCF"), "StrF" -> Name("StdCF")))
    val h = new StdSecurityHandler(ed, fileId)
    assert(h.fileKey.sameElements(fileKey), "round-tripped file key")

    // full document fixture
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val contentId = b.reserveId()
    val content = "BT /F1 12 Tf 100 700 Td (Secret r6 payload) Tj ET".getBytes(ISO_8859_1)
    b.addStreamAt(contentId, "", h.encrypt(content, contentId, 0), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $contentId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val encId = b.addObject(s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -3904 " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> /O <${hex(o)}> /OE <${hex(oe)}> " +
      s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>")
    val pdf = b.build(catId, s"/Encrypt $encId 0 R /ID [<$idHex> <$idHex>] ")
    assert(PdfExtractor.extract(pdf).text == "Secret r6 payload")
  }

  /** Password-protected fixture: /O derived from (owner, user) via
    * Algorithm 3, /U from the user-password key via Algorithm 4/5. */
  private def passwordPdf(v: Int, r: Int, length: Int, cf: String,
                          userPw: String, ownerPw: String,
                          text: String): Array[Byte] = {
    val edNoO = encDictObj(v, r, length, cf)
    val oBytes = new StdSecurityHandler(edNoO, fileId).computeO(
      ownerPw.getBytes(ISO_8859_1), userPw.getBytes(ISO_8859_1))
    val ed = Dict(edNoO.entries ++ Map[String, PdfObj]("O" -> Str(oBytes)))
    val h = new StdSecurityHandler(ed, fileId, userPw.getBytes(ISO_8859_1))
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val contentId = b.reserveId()
    val content = s"BT /F1 12 Tf 100 700 Td (${PdfBuilder.esc(text)}) Tj ET".getBytes(ISO_8859_1)
    b.addStreamAt(contentId, "", h.encrypt(content, contentId, 0), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $contentId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val uHex = hex(h.computeU().take(32).padTo(32, 0.toByte))
    val cfStr = if (cf.isEmpty) ""
      else s"/CF << /StdCF << /CFM /$cf /Length 16 >> >> /StmF /StdCF /StrF /StdCF "
    val encId = b.addObject(s"<< /Filter /Standard /V $v /R $r /Length $length " +
      s"/P -3904 /O <${hex(oBytes)}> /U <$uHex> $cfStr>>")
    b.build(catId, s"/Encrypt $encId 0 R /ID [<$idHex> <$idHex>] ")
  }

  test("RC4-128 user password: right password decrypts, wrong fails, owner works") {
    val pdf = passwordPdf(2, 3, 128, "", userPw = "hunter2", ownerPw = "admin",
      text = "User locked content")
    val opts = ConversionOptions(password = "hunter2")
    assert(PdfExtractor.extract(pdf, opts).text == "User locked content")
    // owner password recovers the user key via Algorithm 7
    assert(PdfExtractor.extract(pdf, ConversionOptions(password = "admin")).text ==
      "User locked content")
    // wrong/empty password → load exception ("password required")
    val err = intercept[Throwable](PdfExtractor.extract(pdf))
    assert(err.getMessage.contains("password"))
    val err2 = intercept[Throwable](
      PdfExtractor.extract(pdf, ConversionOptions(password = "nope")))
    assert(err2.getMessage.contains("password"))
  }

  test("AES-128 (V4/R4) user password decrypts end-to-end") {
    val pdf = passwordPdf(4, 4, 128, "AESV2", userPw = "pw128", ownerPw = "own128",
      text = "Aes user secret")
    assert(PdfExtractor.extract(pdf, ConversionOptions(password = "pw128")).text ==
      "Aes user secret")
    assert(PdfExtractor.extract(pdf, ConversionOptions(password = "own128")).text ==
      "Aes user secret")
    intercept[Throwable](PdfExtractor.extract(pdf))
  }

  test("AES-256/R6 user AND owner passwords authenticate (Algorithm 2.A)") {
    import javax.crypto.Cipher
    import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
    import graft.pdf.crypto.R6Hash
    val userPw = "s3cret".getBytes(ISO_8859_1)
    val ownerPw = "m4ster".getBytes(ISO_8859_1)
    val fileKey = (0 until 32).map(i => (i * 13 + 7).toByte).toArray
    def aesEnc(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      c.doFinal(data)
    }
    val uvs = (1 to 8).map(_.toByte).toArray
    val uks = (101 to 108).map(_.toByte).toArray
    val u = R6Hash(userPw, uvs) ++ uvs ++ uks
    val ue = aesEnc(R6Hash(userPw, uks), fileKey)
    val ovs = (51 to 58).map(_.toByte).toArray
    val oks = (151 to 158).map(_.toByte).toArray
    val o = R6Hash(ownerPw, ovs, u) ++ ovs ++ oks
    val oe = aesEnc(R6Hash(ownerPw, oks, u), fileKey)
    val ed = Dict(Map(
      "Filter" -> Name("Standard"), "V" -> Int64(5), "R" -> Int64(6),
      "Length" -> Int64(256), "P" -> Int64(-3904L),
      "U" -> Str(u), "UE" -> Str(ue), "O" -> Str(o), "OE" -> Str(oe),
      "CF" -> Dict(Map("StdCF" -> Dict(Map("CFM" -> Name("AESV3"), "Length" -> Int64(32))))),
      "StmF" -> Name("StdCF"), "StrF" -> Name("StdCF")))
    val hu = new StdSecurityHandler(ed, fileId, userPw)
    assert(hu.authenticated && hu.authMode == "user")
    assert(hu.fileKey.sameElements(fileKey))
    val ho = new StdSecurityHandler(ed, fileId, ownerPw)
    assert(ho.authenticated && ho.authMode == "owner")
    assert(ho.fileKey.sameElements(fileKey))
    val hw = new StdSecurityHandler(ed, fileId, "bad".getBytes(ISO_8859_1))
    assert(!hw.authenticated)

    // end-to-end: document only opens with one of the passwords
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val contentId = b.reserveId()
    val content = "BT /F1 12 Tf 100 700 Td (R6 pw payload) Tj ET".getBytes(ISO_8859_1)
    b.addStreamAt(contentId, "", hu.encrypt(content, contentId, 0), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $contentId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val encId = b.addObject(s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -3904 " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> /O <${hex(o)}> /OE <${hex(oe)}> " +
      s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>")
    val pdf = b.build(catId, s"/Encrypt $encId 0 R /ID [<$idHex> <$idHex>] ")
    assert(PdfExtractor.extract(pdf, ConversionOptions(password = "s3cret")).text == "R6 pw payload")
    assert(PdfExtractor.extract(pdf, ConversionOptions(password = "m4ster")).text == "R6 pw payload")
    intercept[Throwable](PdfExtractor.extract(pdf))
  }

  test("malformed V5 dict (short /U) yields error row, not crash") {
    val pdf = encryptedPdf(v = 1, r = 2, length = 40, cf = "", text = "x")
    val s = new String(pdf, ISO_8859_1).replace("/V 1 /R 2", "/V 5 /R 6")
    val doc = try {
      PdfExtractor.extract(s.getBytes(ISO_8859_1)); None
    } catch { case e: Throwable => Some(e) }
    assert(doc.isDefined) // load exception → ExtractJob maps to status=error
  }
}
