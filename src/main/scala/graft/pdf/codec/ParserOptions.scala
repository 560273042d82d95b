package graft.pdf.codec

/** Parser configuration, mirroring the reference's public
  * `ParserOptions` surface (reference: src/parser_config.rs:33-160)
  * with the same presets and default values.
  *
  * Live semantics — in the reference exactly two knobs are consumed
  * at runtime (src/decoders/mod.rs:143-152): `maxDecompressionRatio`
  * and `maxDecompressedSize`, which bound the filter pipeline's
  * decompression-bomb guard. The remaining fields (strict,
  * skipInvalidObjects, maxErrors, maxNesting, allowMissingEndobj,
  * allowMalformedStreams, maxRecursionDepth, maxFileSize) are dead
  * config there — `should_continue` is marked `#[allow(dead_code)]`
  * and no other module reads them; the engine is unconditionally
  * lenient. They are carried here for API parity so a reference user
  * can port call sites unchanged, and deliberately NOT wired to
  * behavior the reference does not have. Our always-on lenient
  * behaviors (scan fallback, truncated-container parses, Null
  * replacement for malformed objects) match the reference's shipped
  * lenient runtime.
  *
  * A ratio/size limit of 0 disables that check, as in the reference.
  */
final case class ParserOptions(
    strict: Boolean = false,
    skipInvalidObjects: Boolean = true,
    maxErrors: Int = 1000,
    maxNesting: Int = 100,
    allowMissingEndobj: Boolean = true,
    allowMalformedStreams: Boolean = true,
    maxDecompressionRatio: Long = 100L,
    maxDecompressedSize: Long = 100L * 1024 * 1024,
    maxRecursionDepth: Int = 100,
    maxFileSize: Long = 500L * 1024 * 1024)

object ParserOptions {

  /** Strict mode: fail on any parsing error (parser_config.rs:104-121). */
  val strict: ParserOptions = ParserOptions(
    strict = true, skipInvalidObjects = false, maxErrors = 1)

  /** Lenient mode (the default, parser_config.rs:123-140). */
  val lenient: ParserOptions = ParserOptions()

  /** Very lenient: maximum compatibility for damaged PDFs
    * (parser_config.rs:142-160). */
  val veryLenient: ParserOptions = ParserOptions(
    maxErrors = 0, maxNesting = 200,
    maxDecompressionRatio = 200L,
    maxDecompressedSize = 200L * 1024 * 1024,
    maxRecursionDepth = 200,
    maxFileSize = 1024L * 1024 * 1024)
}
