package graft.pdf.doc

import scala.collection.mutable

/** Cross-reference table (reference: src/xref.rs:19-93).
  * Maps object id → entry; supports classic tables and PDF 1.5 xref
  * streams. Entries from earlier (more recent) sections win over /Prev
  * chains, matching incremental-update semantics.
  */
sealed trait XRefEntry
object XRefEntry {
  final case class Free(nextFree: Long, gen: Int) extends XRefEntry
  final case class Uncompressed(offset: Long, gen: Int) extends XRefEntry
  /** Object lives inside object stream `streamId` at index `idx`. */
  final case class Compressed(streamId: Int, idx: Int) extends XRefEntry
}

final class XRefTable {
  private val entries = mutable.HashMap.empty[Int, XRefEntry]
  /** Add only if absent — newest section is parsed first and wins. */
  def addIfAbsent(id: Int, e: XRefEntry): Unit =
    if (!entries.contains(id)) entries.update(id, e)
  def put(id: Int, e: XRefEntry): Unit = entries.update(id, e)
  def get(id: Int): Option[XRefEntry] = entries.get(id)
  def size: Int = entries.size
  def ids: Iterator[Int] = entries.keysIterator
}
