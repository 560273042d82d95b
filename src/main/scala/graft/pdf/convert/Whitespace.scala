package graft.pdf.convert

/** Whitespace + page-artifact cleanup (reference:
  * src/converters/whitespace.rs). Hand-rolled single-pass scanners —
  * the original regex pipeline (4-6 full-text passes per page) was the
  * top CPU consumer in thread profiles of the extraction job; these
  * loops keep identical semantics at ~10x less work/garbage.
  *
  * Semantics preserved from the regex version:
  *  - interior runs of 2+ spaces collapse to one (line-leading
  *    indentation preserved)
  *  - trailing spaces/tabs stripped per line
  *  - 4+ newlines capped at 3; result trimmed
  *  - markdown: artifact lines removed ("Page N", "- N -", "[N]",
  *    bare 1-3 digit lines, ---/=== separators) — reference quirk kept:
  *    legitimate bare numbers are removed too (SURVEY §7.4.9)
  */
object Whitespace {

  /** Bit set of the scanner's stop chars: \t(9) \n(10) \r(13) ' '(32)
    * — all < 64, so membership is `c < 64 && ((1L << c) & mask) != 0`. */
  private final val StopMask: Long =
    (1L << '\n') | (1L << '\r') | (1L << ' ') | (1L << '\t')

  /** Plain-text cleanup (reference: whitespace.rs:284-345). */
  def cleanPlainText(s: CharSequence): String = clean(s, markdown = false)

  /** Markdown cleanup (reference: whitespace.rs:91-114, 247-255). */
  def cleanMarkdown(s: CharSequence): String = clean(s, markdown = true)

  /** Zero-copy entry: clean `s(0 until n)` IN PLACE (the array is
    * consumed — caller must not reuse it). Lets producers that already
    * assemble into a char[] (TextAssembler) skip the StringBuilder's
    * latin1 byte→char→byte double conversion entirely. Identical state
    * machine — `clean(cs, md)` delegates here after its bulk copy. */
  private[convert] def cleanArray(s: Array[Char], n: Int, markdown: Boolean): String =
    run(s, n, markdown)

  private def clean(cs: CharSequence, markdown: Boolean): String = {
    // One bulk copy into a primitive char array up front: String.charAt
    // on UTF16 strings pays a checkIndex per call that the JIT was not
    // eliminating (12% of mixed-corpus samples); array loads in a
    // canonical loop get their bounds checks hoisted.
    val n = cs.length
    val s = new Array[Char](n)
    cs match {
      case str: String                  => str.getChars(0, n, s, 0)
      case sb: java.lang.StringBuilder  => sb.getChars(0, n, s, 0)
      case other =>
        var k = 0
        while (k < n) { s(k) = other.charAt(k); k += 1 }
    }
    run(s, n, markdown)
  }

  private def run(s: Array[Char], n: Int, markdown: Boolean): String = {
    // Output compacts IN PLACE over the same array (no StringBuilder:
    // bulk appends paid ensureCapacity + latin1 probing per call — 5%
    // of JFR samples; no second array either). Safety: every consumed
    // char emits ≤ 1 output char (emitted newlines ≤ newlines read,
    // emitted spaces ≤ spaces read, visible runs 1:1), so w ≤ i always
    // — writes never reach unread input, and the visible-run
    // System.arraycopy is a forward overlap (memmove-safe).
    val o = s
    var w = 0
    var i = 0
    var pendingNl = 0      // newlines not yet emitted
    var pendingWs = 0      // spaces/tabs not yet emitted (since last visible)
    var pendingHasTab = false
    var lineHasVisible = false // a visible char emitted on current line
    var started = false    // first visible char seen (leading trim)
    var lineStart = 0      // offset of current line in o
    var nlBeforeLine = 0   // newlines emitted just before current line

    // NOTE the line-end handling is manually inlined at its two call
    // sites: a nested def closing over mutable locals boxes ALL of them
    // as IntRef/BooleanRef, and this loop is the job's hottest scanner
    // (every character access paid a heap deref — top leaf frame in
    // JFR).
    //
    // The four stop chars (\n \r space \t) all sit below code point
    // 64, so "is this char a stop?" is one compare + shift + mask
    // instead of a 4-compare chain — this test runs once per input
    // char in the dispatch below AND once per char in the visible-run
    // scan, and clean() was 45% of large-doc leaf samples (r5 JFR)
    // with the run scan as the inner loop. Visible chars (the common
    // case by far) are dispatched first.

    while (i < n) {
      val c = s(i)
      if (c >= 64 || ((1L << c) & StopMask) == 0) {
        // ---- visible char (common case) ----
        if (started) {
          if (pendingNl > 0) {
            // blanked-first-line case: nothing emitted yet (w == 0) ⇒
            // drop the newlines entirely (the old capNewlines pass
            // trimmed these leading runs)
            val emit = if (w == 0) 0 else math.min(pendingNl, 3)
            var k = 0
            while (k < emit) { o(w) = '\n'; w += 1; k += 1 }
            pendingNl = 0
            nlBeforeLine = emit
            lineStart = w
            // line-leading ws = indentation: preserve count (spaces)
            var q = 0
            while (q < pendingWs) { o(w) = ' '; w += 1; q += 1 }
          } else if (pendingWs > 0) {
            if (!lineHasVisible) {
              var q = 0
              while (q < pendingWs) { o(w) = ' '; w += 1; q += 1 }
            } else if (pendingHasTab) { o(w) = '\t'; w += 1 }
            else { o(w) = ' '; w += 1 } // interior run collapses to one
          }
        } else {
          pendingNl = 0
          lineStart = w
        }
        pendingWs = 0; pendingHasTab = false
        // bulk-copy the whole visible run (one range copy instead of
        // a per-character append — words are ~6 chars, and per-char
        // StringBuilder.append was a top JFR frame)
        var j = i + 1
        while (j < n && {
          val cj = s(j)
          cj >= 64 || ((1L << cj) & StopMask) == 0
        }) j += 1
        System.arraycopy(s, i, o, w, j - i)
        w += j - i
        i = j - 1
        lineHasVisible = true
        started = true
      } else if (c == '\n' || c == '\r') {
        // end line: strip trailing ws (pending dropped), blank artifact
        // lines in markdown mode. Blanking ALSO un-emits the newlines
        // that preceded the line and returns them to pendingNl, so the
        // runs on both sides of a removed artifact merge and cap at 3
        // on the next emission — this replaces the former capNewlines
        // second pass (it was 2% of mixed-corpus leaf samples).
        pendingWs = 0; pendingHasTab = false
        if (markdown && lineHasVisible && isArtifactLine(o, lineStart, w)) {
          w = lineStart - nlBeforeLine
          pendingNl = nlBeforeLine
        }
        lineHasVisible = false
        pendingNl += 1
        if (c == '\r' && i + 1 < n && s(i + 1) == '\n') i += 1
      } else { // ' ' or '\t'
        pendingWs += 1
        if (c == '\t') pendingHasTab = true
      }
      i += 1
    }
    // final end-line (same as above; newline rewind is moot — trailing
    // newlines are trimmed next anyway)
    if (markdown && lineHasVisible && isArtifactLine(o, lineStart, w)) w = lineStart
    // drop trailing blank lines (trim) — artifacts may leave a run of
    // newlines at the end
    while (w > 0 && (o(w - 1) == '\n' || o(w - 1) == ' ')) w -= 1
    new String(o, 0, w)
  }

  /** Matches the artifact regex set on one rendered line [from, to). */
  private def isArtifactLine(o: Array[Char], from: Int, to: Int): Boolean = {
    var a = from
    var b = to
    while (a < b && o(a) == ' ') a += 1
    while (b > a && o(b - 1) == ' ') b -= 1
    val len = b - a
    if (len == 0) return false
    def allDigits(x: Int, y: Int): Boolean = {
      if (y <= x) return false
      var i = x
      while (i < y) { if (!Character.isDigit(o(i))) return false; i += 1 }
      true
    }
    def allOf(ch: Char): Boolean = {
      var i = a
      while (i < b) { if (o(i) != ch) return false; i += 1 }
      true
    }
    // ^\d{1,3}$
    if (len <= 3 && allDigits(a, b)) return true
    // ^-{3,}$ | ^={3,}$
    if (len >= 3 && (allOf('-') || allOf('='))) return true
    // ^Page \d+$
    if (len > 5 && o(a) == 'P' && o(a + 1) == 'a' &&
        o(a + 2) == 'g' && o(a + 3) == 'e' &&
        o(a + 4) == ' ' && allDigits(a + 5, b)) return true
    // ^- \d+ -$
    if (len >= 5 && o(a) == '-' && o(a + 1) == ' ' &&
        o(b - 1) == '-' && o(b - 2) == ' ' &&
        allDigits(a + 2, b - 2)) return true
    // ^\[\d+\]$
    if (len >= 3 && o(a) == '[' && o(b - 1) == ']' &&
        allDigits(a + 1, b - 1)) return true
    false
  }
}
