package graft.pdf.testgen

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater
import scala.collection.mutable

/** Deterministic spec-minimal PDF writer for fixtures and benchmarks.
  * No wall-clock, no randomness — same inputs ⇒ same bytes (FIXTURES.md
  * §3). Lives in main so Bench/pages-synthesis can reuse it; it is a
  * *generator*, not part of the extraction engine.
  */
final class PdfBuilder(version: String = "1.4") {

  private val objects = mutable.ArrayBuffer.empty[(Int, Array[Byte])] // (id, body incl. "N 0 obj ... endobj")
  private var nextId = 1

  def reserveId(): Int = { val id = nextId; nextId += 1; id }

  def addObject(body: String): Int = addObjectAt(reserveId(), body)

  def addObjectAt(id: Int, body: String): Int = {
    val bytes = s"$id 0 obj\n$body\nendobj\n".getBytes(ISO_8859_1)
    objects += ((id, bytes))
    id
  }

  def addStream(dictExtra: String, data: Array[Byte],
                flate: Boolean = false): Int = addStreamAt(reserveId(), dictExtra, data, flate)

  def addStreamAt(id: Int, dictExtra: String, data: Array[Byte],
                  flate: Boolean): Int = {
    val payload = if (flate) PdfBuilder.deflate(data) else data
    val filter = if (flate) "/Filter /FlateDecode " else ""
    val head = s"$id 0 obj\n<< $filter/Length ${payload.length} $dictExtra>>\nstream\n".getBytes(ISO_8859_1)
    val tail = "\nendstream\nendobj\n".getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + payload.length + tail.length)
    out.write(head, 0, head.length)
    out.write(payload, 0, payload.length)
    out.write(tail, 0, tail.length)
    objects += ((id, out.toByteArray))
    id
  }

  /** Serialize with a classic xref table. `extraTrailer` is spliced
    * into the trailer dict (e.g. `/Encrypt 9 0 R /ID [<...> <...>]`). */
  def build(rootId: Int, extraTrailer: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1), 0, s.length)
    w(s"%PDF-$version\n%âãÏÓ\n")
    val offsets = mutable.HashMap.empty[Int, Int]
    objects.sortBy(_._1).foreach { case (id, bytes) =>
      offsets(id) = out.size()
      out.write(bytes, 0, bytes.length)
    }
    val xrefOff = out.size()
    val maxId = if (objects.isEmpty) 0 else objects.map(_._1).max
    w(s"xref\n0 ${maxId + 1}\n")
    w(f"${0}%010d ${65535}%05d f \n")
    var id = 1
    while (id <= maxId) {
      offsets.get(id) match {
        case Some(off) => w(f"$off%010d ${0}%05d n \n")
        case None      => w(f"${0}%010d ${65535}%05d f \n")
      }
      id += 1
    }
    w(s"trailer\n<< /Size ${maxId + 1} /Root $rootId 0 R $extraTrailer>>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Serialize with a PDF 1.5 xref stream (+ optionally packing the
    * small non-stream objects into an ObjStm). */
  def buildXrefStream(rootId: Int, useObjStm: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1), 0, s.length)
    w(s"%PDF-1.5\n%âãÏÓ\n")

    var inline = objects.sortBy(_._1).toVector
    var compressed = Vector.empty[(Int, Array[Byte])] // (id, bare body)
    var objStmId = -1
    if (useObjStm) {
      // pack non-stream objects into one ObjStm
      val (strm, plain) = inline.partition { case (_, b) =>
        new String(b, ISO_8859_1).contains("stream\n")
      }
      if (plain.nonEmpty) {
        compressed = plain.map { case (id, b) =>
          val s = new String(b, ISO_8859_1)
          val body = s.substring(s.indexOf("obj\n") + 4, s.lastIndexOf("\nendobj"))
          (id, body.getBytes(ISO_8859_1))
        }
        inline = strm
        objStmId = nextId; nextId += 1
      }
    }

    val offsets = mutable.HashMap.empty[Int, Int]
    inline.foreach { case (id, bytes) =>
      offsets(id) = out.size()
      out.write(bytes, 0, bytes.length)
    }

    val idxInStm = mutable.HashMap.empty[Int, Int]
    if (objStmId > 0) {
      val header = new StringBuilder
      val bodyBuf = new ByteArrayOutputStream()
      var off = 0
      compressed.zipWithIndex.foreach { case ((id, body), k) =>
        header.append(s"$id $off ")
        bodyBuf.write(body, 0, body.length)
        bodyBuf.write('\n')
        off += body.length + 1
        idxInStm(id) = k
      }
      val hdrBytes = header.toString.getBytes(ISO_8859_1)
      val stmData = new ByteArrayOutputStream()
      stmData.write(hdrBytes, 0, hdrBytes.length)
      bodyBuf.writeTo(stmData)
      val payload = PdfBuilder.deflate(stmData.toByteArray)
      offsets(objStmId) = out.size()
      w(s"$objStmId 0 obj\n<< /Type /ObjStm /N ${compressed.size} /First ${hdrBytes.length} " +
        s"/Filter /FlateDecode /Length ${payload.length} >>\nstream\n")
      out.write(payload, 0, payload.length)
      w("\nendstream\nendobj\n")
    }

    // xref stream object
    val xrefId = nextId; nextId += 1
    val xrefOff = out.size()
    // cover sparse high ids placed via addObjectAt (e.g. the ObjStm
    // vector tests use member ids like 10000)
    val maxId = (Iterable(xrefId) ++ offsets.keys ++ idxInStm.keys).max
    val rows = new ByteArrayOutputStream()
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
      rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    row(0, 0, 65535)
    var id = 1
    while (id <= maxId) {
      if (id == xrefId) row(1, xrefOff.toLong, 0)
      else if (idxInStm.contains(id)) row(2, objStmId.toLong, idxInStm(id))
      else offsets.get(id) match {
        case Some(o) => row(1, o.toLong, 0)
        case None    => row(0, 0, 65535)
      }
      id += 1
    }
    val xrefPayload = PdfBuilder.deflate(rows.toByteArray)
    w(s"$xrefId 0 obj\n<< /Type /XRef /Size ${maxId + 1} /W [1 4 2] /Root $rootId 0 R " +
      s"/Filter /FlateDecode /Length ${xrefPayload.length} >>\nstream\n")
    out.write(xrefPayload, 0, xrefPayload.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}

object PdfBuilder {

  // thread-local reusable deflater (native init/end churn — same
  // reason as Codecs' inflater pool)
  private val deflaterTL = ThreadLocal.withInitial[Deflater](() => new Deflater(Deflater.BEST_SPEED))

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = deflaterTL.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** Escape text for a PDF literal string. */
  def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c < 256 => c.toString
      case _ => "?" // non-Latin1 needs hex strings / Type0; not used here
    }

  final case class Line(x: Float, y: Float, size: Float, font: String, text: String)

  /** Single-page document over standard-14 fonts with WinAnsiEncoding. */
  def singlePage(lines: Seq[Line], compress: Boolean = false,
                 pageWidth: Int = 612, pageHeight: Int = 792,
                 xrefStream: Boolean = false, objStm: Boolean = false,
                 extraFonts: Map[String, String] = Map.empty): Array[Byte] =
    multiPage(Seq(lines), compress, pageWidth, pageHeight, xrefStream, objStm, extraFonts)

  /** Multi-page document; each element is one page's lines.
    * Fonts: /F1 Helvetica, /F2 Helvetica-Bold + any extras (name→BaseFont). */
  def multiPage(pages: Seq[Seq[Line]], compress: Boolean = false,
                pageWidth: Int = 612, pageHeight: Int = 792,
                xrefStream: Boolean = false, objStm: Boolean = false,
                extraFonts: Map[String, String] = Map.empty): Array[Byte] = {
    val b = new PdfBuilder(if (xrefStream) "1.5" else "1.4")
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val fontDefs = Map("F1" -> "Helvetica", "F2" -> "Helvetica-Bold") ++ extraFonts
    val fontIds = fontDefs.toSeq.sortBy(_._1).map { case (n, base) =>
      n -> b.addObject(s"<< /Type /Font /Subtype /Type1 /BaseFont /$base /Encoding /WinAnsiEncoding >>")
    }
    val fontRes = fontIds.map { case (n, id) => s"/$n $id 0 R" }.mkString(" ")
    val pageIds = pages.map { lines =>
      val content = contentStream(lines)
      val cId = b.addStream("", content.getBytes(ISO_8859_1), flate = compress)
      b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 $pageWidth $pageHeight] " +
        s"/Resources << /Font << $fontRes >> >> /Contents $cId 0 R >>")
    }
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [${pageIds.map(i => s"$i 0 R").mkString(" ")}] /Count ${pageIds.size} >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    if (xrefStream) b.buildXrefStream(catId, useObjStm = objStm) else b.build(catId)
  }

  def contentStream(lines: Seq[Line]): String = {
    val sb = new StringBuilder("BT\n")
    lines.foreach { l =>
      sb.append(s"/${l.font} ${fmt(l.size)} Tf\n")
      sb.append(s"1 0 0 1 ${fmt(l.x)} ${fmt(l.y)} Tm\n")
      sb.append(s"(${esc(l.text)}) Tj\n")
    }
    sb.append("ET\n")
    sb.toString
  }

  private def fmt(f: Float): String =
    if (f == f.toLong.toFloat) f.toLong.toString else f.toString
}
