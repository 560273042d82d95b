package graft.pdf.structure

import scala.collection.mutable
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._
import graft.pdf.doc.{Page, PdfDocument}

/** Tagged-PDF logical structure tree → MCID reading order
  * (reference: src/structure/parser.rs:31-98, traversal.rs:38-116;
  * invoked from document.rs:1793-1892).
  *
  * The /StructTreeRoot's /K forest is traversed pre-order; integer
  * children are MCIDs (scoped to the element's inherited /Pg page),
  * /MCR dicts carry explicit MCID+Pg. The resulting MCID sequence for
  * a page defines reading order for spans stamped with those MCIDs.
  */
object StructTree {

  /** Pre-order MCIDs for the given page, or None if the document has
    * no structure tree / no MCIDs for this page. */
  def readingOrder(doc: PdfDocument, page: Page): Option[Vector[Int]] = {
    val rootObj = doc.dictGet(doc.catalog, "StructTreeRoot")
    val root = rootObj match {
      case d: Dict => d
      case _       => return None
    }
    val out = Vector.newBuilder[Int]
    var found = false
    val visited = mutable.HashSet.empty[Int]

    def pageMatches(pg: PdfObj, inherited: Option[Int]): Option[Int] = pg match {
      case Ref(id, _) => Some(id)
      case _          => inherited
    }

    def walk(node: PdfObj, pgId: Option[Int], depth: Int): Unit = {
      if (depth > 64) return
      node match {
        case Ref(id, _) =>
          if (visited.add(id)) walk(doc.resolve(node), pgId, depth + 1)
        case Int64(mcid) =>
          // bare MCID, page from inherited /Pg
          if (pgId.forall(id => page.ref.contains(id))) {
            out += mcid.toInt
            found = true
          }
        case Arr(items) => items.foreach(walk(_, pgId, depth + 1))
        case d: Dict =>
          val thisPg = pageMatches(d.get("Pg").getOrElse(Null), pgId)
          d.name("Type") match {
            case Some("MCR") =>
              d.long("MCID").foreach { m =>
                if (thisPg.forall(id => page.ref.contains(id))) { out += m.toInt; found = true }
              }
            case Some("OBJR") => () // object reference (annotation): no text
            case _ =>
              d.get("K").foreach(k => walk(k, thisPg, depth + 1))
          }
        case _ => ()
      }
    }

    root.get("K").foreach(k => walk(k, None, 0))
    if (found) Some(out.result().distinct) else None
  }
}
