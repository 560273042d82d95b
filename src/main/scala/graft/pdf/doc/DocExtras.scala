package graft.pdf.doc

import scala.collection.mutable
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._

/** Secondary document-level extracts (reference: src/outline.rs:12,
  * src/annotations.rs:12, src/extractors/forms.rs:12-58) + doc-string
  * decoding (PDFDocEncoding / UTF-16BE BOM, reference:
  * document.rs:1509-1639).
  */
object DocExtras {

  /** PDFDocEncoding high-range differences from Latin-1 (subset that
    * occurs in titles; rest maps through as Latin-1). */
  private val pdfDocHigh: Map[Int, Char] = Map(
    0x18 -> '˘', 0x19 -> 'ˇ', 0x1a -> 'ˆ', 0x1b -> '˙',
    0x1c -> '˝', 0x1d -> '˛', 0x1e -> '˚', 0x1f -> '˜',
    0x80 -> '•', 0x81 -> '†', 0x82 -> '‡', 0x83 -> '…',
    0x84 -> '—', 0x85 -> '–', 0x86 -> 'ƒ', 0x87 -> '⁄',
    0x88 -> '‹', 0x89 -> '›', 0x8a -> '−', 0x8b -> '‰',
    0x8c -> '„', 0x8d -> '“', 0x8e -> '”', 0x8f -> '‘',
    0x90 -> '’', 0x91 -> '‚', 0x92 -> '™', 0x93 -> 'ﬁ',
    0x94 -> 'ﬂ', 0x95 -> 'Ł', 0x96 -> 'Œ', 0x97 -> 'Š',
    0x98 -> 'Ÿ', 0x99 -> 'Ž', 0x9a -> 'ı', 0x9b -> 'ł',
    0x9c -> 'œ', 0x9d -> 'š', 0x9e -> 'ž', 0xa0 -> '€')

  /** Doc-level string: UTF-16BE with BOM, else PDFDocEncoding. */
  def decodeDocString(bytes: Array[Byte]): String = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, "UTF-16BE")
    else {
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach { b =>
        val c = b & 0xff
        pdfDocHigh.get(c) match {
          case Some(ch)            => sb.append(ch)
          case None if c >= 0x20   => sb.append(c.toChar)
          case None if c == 0x09 || c == 0x0a || c == 0x0d => sb.append(c.toChar)
          case None                => ()
        }
      }
      sb.toString
    }
  }

  final case class OutlineItem(title: String, level: Int,
      /** /Dest or GoTo /A target (same encoding as Annot.dest). */
      dest: String = "")

  /** Bookmark tree, pre-order with levels (reference: src/outline.rs). */
  def outline(doc: PdfDocument): Vector[OutlineItem] = {
    val out = Vector.newBuilder[OutlineItem]
    val visited = mutable.HashSet.empty[Int]
    def walk(itemObj: PdfObj, level: Int): Unit = {
      var cur = itemObj
      var guard = 0
      while (guard < 10000) {
        guard += 1
        cur match {
          case r: Ref if !visited.add(r.id) => return
          case _ => ()
        }
        val d = doc.resolveDict(cur)
        if (d.entries.isEmpty) return
        d.get("Title").map(doc.resolve) match {
          case Some(Str(b)) =>
            val dest = d.get("Dest").map(o => destString(doc, o)).orElse {
              doc.dictGet(d, "A") match {
                case ad: Dict if ad.name("S").contains("GoTo") =>
                  ad.get("D").map(o => destString(doc, o))
                case _ => None
              }
            }.getOrElse("")
            out += OutlineItem(decodeDocString(b), level, dest)
          case _ => ()
        }
        d.get("First").foreach(f => if (level < 32) walk(f, level + 1))
        d.get("Next") match {
          case Some(n) => cur = n
          case None    => return
        }
      }
    }
    val root = doc.resolveDict(doc.catalog.get("Outlines").getOrElse(Null))
    root.get("First").foreach(walk(_, 0))
    out.result()
  }

  final case class Annot(
      subtype: String,
      contents: String,
      /** /A URI action target — the web-graph link surface
        * (reference: annotations.rs:311-323 LinkAction::Uri). */
      uri: String = "",
      /** /Dest or GoTo /A destination: "named:<name>" or
        * "page:<obj-or-index> <FitType>" (annotations.rs:239-289). */
      dest: String = "",
      /** /A action /S type when not URI/GoTo (Launch, Named, …). */
      actionType: String = "")

  /** Destination encoding shared by annotations + outlines
    * (reference: annotations.rs:239-289 parse_destination):
    * "named:<name>" or "page:<obj-or-index> <FitType>". */
  private def destString(doc: PdfDocument, o: PdfObj): String = doc.resolve(o) match {
    case Str(b)  => "named:" + decodeDocString(b)
    case Name(n) => "named:" + n
    case Arr(items) if items.nonEmpty =>
      val pg = items.head match {
        case Ref(id, _) => id.toString
        case Int64(v)   => v.toString
        case _          => "0"
      }
      val fit = items.lift(1).flatMap(_.asName).getOrElse("Fit")
      s"page:$pg $fit"
    case _ => ""
  }

  /** Page annotations with contents, link URIs and destinations
    * (reference: src/annotations.rs:150-360 parse_annotation /
    * parse_destination / parse_action). */
  def annotations(doc: PdfDocument, page: Page): Vector[Annot] = {
    doc.dictGet(page.dict, "Annots").asArr.getOrElse(Vector.empty).flatMap { a =>
      val d = doc.resolveDict(a)
      if (d.entries.isEmpty) None
      else {
        var uri = ""
        var dest = d.get("Dest").map(o => destString(doc, o)).getOrElse("")
        var actionType = ""
        doc.dictGet(d, "A") match {
          case ad: Dict =>
            actionType = ad.name("S").getOrElse("")
            actionType match {
              case "URI" =>
                uri = ad.get("URI").map(doc.resolve).flatMap(_.asStr)
                  .map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
                  .getOrElse("")
              case "GoTo" =>
                if (dest.isEmpty) dest = ad.get("D").map(o => destString(doc, o)).getOrElse("")
              case _ => ()
            }
          case _ => ()
        }
        Some(Annot(
          d.name("Subtype").getOrElse(""),
          d.get("Contents").map(doc.resolve).flatMap(_.asStr)
            .map(decodeDocString).getOrElse(""),
          uri, dest, actionType))
      }
    }
  }

  /** Document /Info /Title (decoded); empty when absent. */
  def docTitle(doc: PdfDocument): String = {
    val info = doc.resolveDict(doc.trailer.get("Info").getOrElse(Null))
    info.get("Title").map(doc.resolve) match {
      case Some(Str(b)) => decodeDocString(b)
      case _            => ""
    }
  }

  final case class ImageInfo(name: String, width: Int, height: Int,
                             filter: String, nBytes: Int)

  /** Image XObject inventory per page — metadata only; pixel decoding
    * is out of the north rule's text scope (reference:
    * src/extractors/images.rs:30; SURVEY §2.1 image sink). */
  def images(doc: PdfDocument, page: Page): Vector[ImageInfo] = {
    doc.dictGet(page.resources, "XObject") match {
      case xd: Dict =>
        xd.entries.keys.toVector.sorted.flatMap { name =>
          doc.resolve(xd.get(name).getOrElse(Null)) match {
            case Stream(d, raw) if d.name("Subtype").contains("Image") =>
              Some(ImageInfo(name,
                doc.dictGet(d, "Width").asLong.getOrElse(0L).toInt,
                doc.dictGet(d, "Height").asLong.getOrElse(0L).toInt,
                doc.dictGet(d, "Filter") match {
                  case Name(n) => n
                  case Arr(xs) => xs.flatMap(_.asName).mkString("+")
                  case _       => "none"
                },
                raw.length))
            case _ => None
          }
        }
      case _ => Vector.empty
    }
  }

  final case class FormField(name: String, value: String, fieldType: String)

  /** AcroForm fields, flattened with dotted names
    * (reference: src/extractors/forms.rs:12-58). */
  def formFields(doc: PdfDocument): Vector[FormField] = {
    val out = Vector.newBuilder[FormField]
    val visited = mutable.HashSet.empty[Int]
    def walk(fieldObj: PdfObj, prefix: String, inheritedFt: String, depth: Int): Unit = {
      if (depth > 32) return
      fieldObj match {
        case r: Ref if !visited.add(r.id) => return
        case _ => ()
      }
      val d = doc.resolveDict(fieldObj)
      if (d.entries.isEmpty) return
      val name = d.get("T").map(doc.resolve).flatMap(_.asStr).map(decodeDocString)
        .map(t => if (prefix.isEmpty) t else s"$prefix.$t").getOrElse(prefix)
      val ft = d.name("FT").getOrElse(inheritedFt)
      val kids = doc.dictGet(d, "Kids").asArr.getOrElse(Vector.empty)
      if (kids.nonEmpty) kids.foreach(walk(_, name, ft, depth + 1))
      else {
        val v = doc.resolve(d.get("V").getOrElse(Null)) match {
          case Str(b)  => decodeDocString(b)
          case Name(n) => n
          case Int64(n) => n.toString
          case Real(n)  => n.toString
          // multi-select choice fields: /V is an array of selected
          // values (reference: FieldValue::Array, forms.rs:parse_field_
          // value + vector forms.rs:428-441) — flatten into one column
          case Arr(xs) => xs.map(doc.resolve).flatMap {
            case Str(b)  => Some(decodeDocString(b))
            case Name(n) => Some(n)
            case _       => None
          }.mkString(", ")
          case _        => ""
        }
        out += FormField(name, v, ft)
      }
    }
    val acro = doc.resolveDict(doc.catalog.get("AcroForm").getOrElse(Null))
    doc.dictGet(acro, "Fields").asArr.getOrElse(Vector.empty)
      .foreach(walk(_, "", "", 0))
    out.result()
  }
}
