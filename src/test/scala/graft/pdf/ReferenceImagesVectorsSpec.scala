package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.PdfDocument
import graft.pdf.extract.{Images, PdfImage}
import graft.pdf.testgen.PdfBuilder

/** Ports of the reference's images.rs inline test vectors (reference:
  * src/extractors/images.rs:635-1139, 33 tests), re-expressed through
  * this engine's public surfaces (extract → toPixels/toPng/toJpeg).
  * Porting found and fixed two real divergences:
  *  - cmyk_to_rgb truncates (`as u8`) where the r4 engine rounded —
  *    +1 on every fractional product (images.rs:526-558);
  *  - parse_color_space REJECTS unsupported families / non-name
  *    objects (images.rs:341-404), where the r4 engine kept the image
  *    as unknown-treated-as-gray.
  * Tests with no analog here: PdfImage::new/with_bbox/clone (Rust
  * struct plumbing; the case class is covered structurally),
  * save_raw_as_jpeg (the engine encodes raw pixels to PNG only — the
  * reference's JPEG re-encode needs the `image` crate's encoder and
  * the sink never uses it for raw data). */
class ReferenceImagesVectorsSpec extends AnyFunSuite {

  private def pdfWithImage(w: Int, h: Int, bpc: Int, csEntry: String,
                           samples: Array[Byte],
                           dct: Boolean = false,
                           extraObjs: PdfBuilder => String = _ => ""): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val pre = extraObjs(b)
    val cs = if (csEntry.startsWith("@")) pre else csEntry
    val imgId =
      if (dct) b.addStream(s"/Subtype /Image /Width $w /Height $h /BitsPerComponent $bpc " +
        s"/ColorSpace $cs /Filter /DCTDecode ", samples, flate = false)
      else b.addStream(s"/Subtype /Image /Width $w /Height $h /BitsPerComponent $bpc " +
        s"/ColorSpace $cs ", samples, flate = true)
    val content = s"q $w 0 0 $h 100 500 cm /Im1 Do Q".getBytes("ISO-8859-1")
    val cId = b.addStream("", content, flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  private def extractAll(pdf: Array[Byte]): Vector[PdfImage] = {
    val doc = new PdfDocument(pdf)
    Images.extract(doc, doc.pages.head)
  }

  private def cmykPixels(cmyk: Array[Byte]): Array[Int] = {
    val n = cmyk.length / 4
    val img = extractAll(pdfWithImage(n, 1, 8, "/DeviceCMYK", cmyk)).head
    val (px, ch) = Images.toPixels(img).get
    assert(ch == 3)
    px.map(_ & 0xff)
  }

  test("components per color space (test_color_space_components + pixel formats)") {
    // Gray → 1 channel, RGB → 3, CMYK → 3 after conversion (the
    // reference's PixelFormat mapping: Indexed renders as RGB)
    val gray = extractAll(pdfWithImage(2, 1, 8, "/DeviceGray", Array[Byte](0, 127))).head
    assert(Images.toPixels(gray).get._2 == 1)
    val rgb = extractAll(pdfWithImage(1, 1, 8, "/DeviceRGB", Array[Byte](1, 2, 3))).head
    assert(Images.toPixels(rgb).get._2 == 3)
    val cmyk = extractAll(pdfWithImage(1, 1, 8, "/DeviceCMYK", Array[Byte](0, 0, 0, 0))).head
    assert(Images.toPixels(cmyk).get._2 == 3)
    val idx = extractAll(pdfWithImage(1, 1, 8, "@p", Array[Byte](0), extraObjs = { b =>
      val pal = b.addStream("", Array[Byte](9, 8, 7), flate = true)
      s"[/Indexed /DeviceRGB 0 $pal 0 R]"
    })).head
    assert(Images.toPixels(idx).get._2 == 3)
  }

  test("cmyk_to_rgb pure cyan (images.rs:663)") {
    assert(cmykPixels(Array[Byte](0xff.toByte, 0, 0, 0)).toSeq == Seq(0, 255, 255))
  }

  test("cmyk_to_rgb pure magenta (images.rs:674)") {
    assert(cmykPixels(Array[Byte](0, 0xff.toByte, 0, 0)).toSeq == Seq(255, 0, 255))
  }

  test("cmyk_to_rgb pure yellow (images.rs:685)") {
    assert(cmykPixels(Array[Byte](0, 0, 0xff.toByte, 0)).toSeq == Seq(255, 255, 0))
  }

  test("cmyk_to_rgb black (images.rs:696)") {
    assert(cmykPixels(Array[Byte](0, 0, 0, 0xff.toByte)).toSeq == Seq(0, 0, 0))
  }

  test("cmyk_to_rgb white (images.rs:707)") {
    assert(cmykPixels(Array[Byte](0, 0, 0, 0)).toSeq == Seq(255, 255, 255))
  }

  test("cmyk_to_rgb multiple pixels (images.rs:718)") {
    assert(cmykPixels(Array[Byte](0xff.toByte, 0, 0, 0, 0, 0xff.toByte, 0, 0)).toSeq ==
      Seq(0, 255, 255, 255, 0, 255))
  }

  test("cmyk_to_rgb fractional products TRUNCATE like the reference's `as u8`") {
    // C=100/255, K=50/255: (1-c)(1-k)*255 = 124.63… → 124 (not 125)
    val px = cmykPixels(Array[Byte](100, 0, 0, 50))
    val c = 100f / 255f; val k = 50f / 255f
    assert(px(0) == ((1 - c) * (1 - k) * 255f).toInt)
    assert(px(0) == 124)
    assert(px(1) == ((1 - k) * 255f).toInt && px(1) == 205)
  }

  test("parse_color_space bare names accepted (images.rs:919-941)") {
    assert(extractAll(pdfWithImage(1, 1, 8, "/DeviceRGB", Array[Byte](1, 2, 3)))
      .head.colorSpace == "DeviceRGB")
    assert(extractAll(pdfWithImage(1, 1, 8, "/DeviceGray", Array[Byte](1)))
      .head.colorSpace == "DeviceGray")
    assert(extractAll(pdfWithImage(1, 1, 8, "/DeviceCMYK", Array[Byte](1, 2, 3, 4)))
      .head.colorSpace == "DeviceCMYK")
  }

  test("parse_color_space Indexed array accepted (images.rs:943)") {
    val img = extractAll(pdfWithImage(1, 1, 8, "@p", Array[Byte](0), extraObjs = { b =>
      val pal = b.addStream("", Array[Byte](1, 2, 3), flate = true)
      s"[/Indexed /DeviceRGB 0 $pal 0 R]"
    })).head
    assert(img.colorSpace == "Indexed")
  }

  test("parse_color_space unsupported name rejected (images.rs:951)") {
    // the reference returns Err → the image never reaches the results
    assert(extractAll(pdfWithImage(1, 1, 8, "/UnsupportedColorSpace",
      Array[Byte](1, 2, 3))).isEmpty)
  }

  test("parse_color_space invalid object rejected (images.rs:959)") {
    // Integer 42 as /ColorSpace → Err in the reference
    assert(extractAll(pdfWithImage(1, 1, 8, "42", Array[Byte](1, 2, 3))).isEmpty)
  }

  test("parse_color_space unsupported ARRAY family rejected (images.rs:385-392)") {
    assert(extractAll(pdfWithImage(1, 1, 8, "[/NotARealFamily 1 2]",
      Array[Byte](1, 2, 3))).isEmpty)
  }

  test("extract_image_from_xobject jpeg pass-through (images.rs:967)") {
    val jpegHdr = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val img = extractAll(pdfWithImage(100, 200, 8, "/DeviceRGB", jpegHdr, dct = true)).head
    assert(img.width == 100 && img.height == 200)
    assert(img.colorSpace == "DeviceRGB" && img.bitsPerComponent == 8)
    assert(img.isJpeg)
    assert(Images.toJpeg(img).get.toSeq == jpegHdr.toSeq)
    assert(Images.toPng(img).isEmpty) // raw-path PNG refuses JPEG data
  }

  test("extract_image_from_xobject raw RGB (images.rs:998)") {
    val raw = Array[Byte](0xff.toByte, 0, 0, 0, 0xff.toByte, 0,
      0, 0, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    val img = extractAll(pdfWithImage(2, 2, 8, "/DeviceRGB", raw)).head
    assert(img.width == 2 && img.height == 2)
    assert(img.colorSpace == "DeviceRGB")
    assert(!img.isJpeg)
    val (px, ch) = Images.toPixels(img).get
    assert(ch == 3 && px.toSeq == raw.toSeq)
  }

  test("extract_image_from_xobject grayscale (images.rs:1031)") {
    val raw = Array[Byte](0, 128.toByte, 192.toByte, 0xff.toByte)
    val img = extractAll(pdfWithImage(2, 2, 8, "/DeviceGray", raw)).head
    assert(img.colorSpace == "DeviceGray")
    val (px, ch) = Images.toPixels(img).get
    assert(ch == 1 && px.toSeq == raw.toSeq)
  }

  test("extract_image_from_xobject jpeg Filter ARRAY form (images.rs:1111)") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val jpegHdr = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val imgId = b.addStream("/Subtype /Image /Width 50 /Height 50 /BitsPerComponent 8 " +
      "/ColorSpace /DeviceRGB /Filter [/DCTDecode] ", jpegHdr, flate = false)
    val cId = b.addStream("", "q 50 0 0 50 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1"), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val img = extractAll(b.build(catId)).head
    assert(img.isJpeg)
    assert(Images.toJpeg(img).get.toSeq == jpegHdr.toSeq)
  }

  test("save_raw_rgb_as_png round-trip (images.rs:785)") {
    val raw = Array[Byte](10, 20, 30, 40, 50, 60)
    val img = extractAll(pdfWithImage(2, 1, 8, "/DeviceRGB", raw)).head
    val (px, _, _, ch) = Images.decodePngForTest(Images.toPng(img).get)
    assert(ch == 3 && px.toSeq == raw.toSeq)
  }

  test("save_raw_grayscale_as_png round-trip (images.rs:803)") {
    val raw = Array[Byte](0, 64, 128.toByte, 255.toByte)
    val img = extractAll(pdfWithImage(4, 1, 8, "/DeviceGray", raw)).head
    val (px, _, _, ch) = Images.decodePngForTest(Images.toPng(img).get)
    assert(ch == 1 && px.toSeq == raw.toSeq)
  }

  test("save_raw_cmyk_as_png converts then encodes (images.rs:816)") {
    // pure cyan pixel → PNG decodes to (0,255,255)
    val img = extractAll(pdfWithImage(1, 1, 8, "/DeviceCMYK",
      Array[Byte](0xff.toByte, 0, 0, 0))).head
    val (px, _, _, ch) = Images.decodePngForTest(Images.toPng(img).get)
    assert(ch == 3)
    assert(px.map(_ & 0xff).toSeq == Seq(0, 255, 255))
  }
}
