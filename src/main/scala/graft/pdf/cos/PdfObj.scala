package graft.pdf.cos

/** PDF COS object model (ISO 32000-1 §7.3).
  *
  * Semantic twin of the reference's dynamic object enum
  * (reference: src/object.rs:8-35) expressed as an idiomatic Scala ADT.
  * Strings are raw byte arrays (PDF strings are NOT UTF-8); `Name` is
  * the post-#xx-unescape string. These values never cross a Spark
  * encoder boundary — they live entirely inside the per-row extractor.
  */
sealed trait PdfObj {
  import PdfObj._
  def asLong: Option[Long] = this match {
    case Int64(v) => Some(v)
    case Real(v)  => Some(v.toLong)
    case _        => None
  }
  def asDouble: Option[Double] = this match {
    case Int64(v) => Some(v.toDouble)
    case Real(v)  => Some(v)
    case _        => None
  }
  def asName: Option[String] = this match {
    case Name(v) => Some(v); case _ => None
  }
  def asDict: Option[Dict] = this match {
    case d: Dict      => Some(d)
    case Stream(d, _) => Some(d)
    case _            => None
  }
  def asArr: Option[Vector[PdfObj]] = this match {
    case Arr(v) => Some(v); case _ => None
  }
  def asStr: Option[Array[Byte]] = this match {
    case Str(b) => Some(b); case _ => None
  }
}

object PdfObj {
  case object Null extends PdfObj
  final case class Bool(v: Boolean) extends PdfObj
  final case class Int64(v: Long) extends PdfObj
  final case class Real(v: Double) extends PdfObj
  /** Raw string bytes (literal or hex source — indistinguishable after parse). */
  final case class Str(bytes: Array[Byte]) extends PdfObj
  final case class Name(v: String) extends PdfObj
  final case class Arr(items: Vector[PdfObj]) extends PdfObj
  final case class Dict(entries: Map[String, PdfObj]) extends PdfObj {
    def get(key: String): Option[PdfObj] = entries.get(key)
    def name(key: String): Option[String] = entries.get(key).flatMap(_.asName)
    def long(key: String): Option[Long] = entries.get(key).flatMap(_.asLong)
    def double(key: String): Option[Double] = entries.get(key).flatMap(_.asDouble)
  }
  object Dict { val empty: Dict = Dict(Map.empty) }
  /** Stream with its dictionary and RAW (still-encoded, possibly encrypted) data. */
  final case class Stream(dict: Dict, raw: Array[Byte]) extends PdfObj
  /** Indirect reference `id gen R` (reference: src/object.rs:38-44). */
  final case class Ref(id: Int, gen: Int) extends PdfObj
}
