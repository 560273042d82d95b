package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Head-metadata extraction from crawl HTML — the per-page signals a
  * crawl pipeline consumes BEFORE content extraction:
  *  - `<title>` (ranking/display signal, dedup tie-breaker);
  *  - `<link rel="canonical" href=…>` — the page's self-declared
  *    canonical url, resolved like an anchor href; pages default to
  *    self-canonical when absent (the universal crawler convention),
  *    so the canonical column is always joinable as a dedup key;
  *  - `<meta name="robots" content="…">` → noindex / nofollow flags
  *    (indexing-policy gate; nofollow also gates [[WebGraph.anchors]]
  *    edge emission in a full pipeline).
  *
  * Same robustness contract as the anchor scanner (crawl HTML, not
  * XHTML): tags and attribute names case-insensitive, all three quote
  * styles, attribute order free, unterminated markup dropped. Per-row
  * kernel over the pages scan — no shuffle at any scale.
  */
object PageMeta {

  final case class HeadMeta(title: String, canonical: String,
                            noindex: Boolean, nofollow: Boolean)

  /** Scan one page. `base` is the fetch url (canonical resolution +
    * self-canonical default). First title wins; first canonical link
    * wins; robots flags OR across ALL robots metas (the conservative
    * read when a page carries several). */
  def headMeta(base: String, html: String): HeadMeta = {
    var title: String = null
    var canonical: String = null
    var noindex = false
    var nofollow = false
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) { i = n }
      else {
        val gt = html.indexOf('>', lt + 1)
        if (gt < 0) { i = n } // unterminated tag at EOF
        else if (title == null && tagIs(html, lt + 1, gt, "title")) {
          val close = indexOfCloseTag(html, gt + 1, "title")
          val end = if (close < 0) n else close
          title = WebGraph.innerText(html, gt + 1, end)
          i = if (close < 0) n else end + 1
        } else if (canonical == null && tagIs(html, lt + 1, gt, "link")) {
          val rel = WebGraph.attrValue(html, lt + 1 + 4, gt, "rel")
          if (rel != null && rel.equalsIgnoreCase("canonical")) {
            val href = WebGraph.attrValue(html, lt + 1 + 4, gt, "href")
            if (href != null && href.nonEmpty)
              canonical = WebGraph.resolve(base, href)
          }
          i = gt + 1
        } else if (tagIs(html, lt + 1, gt, "meta")) {
          val name = WebGraph.attrValue(html, lt + 1 + 4, gt, "name")
          if (name != null && name.equalsIgnoreCase("robots")) {
            val content = WebGraph.attrValue(html, lt + 1 + 4, gt, "content")
            if (content != null) {
              content.split("[,\\s]+").foreach { tok =>
                val t = tok.trim.toLowerCase
                if (t == "noindex") noindex = true
                else if (t == "nofollow") nofollow = true
              }
            }
          }
          i = gt + 1
        } else i = lt + 1
      }
    }
    HeadMeta(if (title == null) "" else title,
      if (canonical == null) base else canonical, noindex, nofollow)
  }

  /** Tag-name match at `from` (just past '<'), case-insensitive, with
    * a boundary after the name so `<metadata>` never matches `meta`. */
  private def tagIs(html: String, from: Int, gt: Int,
                    name: String): Boolean = {
    val n = name.length
    if (from + n > gt) return false
    var k = 0
    while (k < n && (html.charAt(from + k) | 0x20) == name.charAt(k)) k += 1
    k == n && (from + n == gt || {
      val c = html.charAt(from + n)
      WebGraph.isWs(c) || c == '>' || c == '/'
    })
  }

  /** First case-insensitive `</name` with a name boundary; -1 if
    * absent. */
  private def indexOfCloseTag(html: String, from: Int,
                              name: String): Int = {
    val n = html.length
    val m = name.length
    var i = from
    while (i + m + 2 <= n) {
      if (html.charAt(i) == '<' && html.charAt(i + 1) == '/') {
        var k = 0
        while (k < m && (html.charAt(i + 2 + k) | 0x20) == name.charAt(k)) k += 1
        if (k == m && (i + 2 + m >= n || {
          val c = html.charAt(i + 2 + m)
          WebGraph.isWs(c) || c == '>'
        })) return i
      }
      i += 1
    }
    -1
  }

  /** (url, html) pages → (url, title, canonical, noindex, nofollow,
    * is_self_canonical). Pure flatMap-free per-row map over the scan. */
  def extract(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url").cast("string"), col("html").cast("string"))
      .as[(String, String)]
      .map { case (u, h) =>
        val m = headMeta(u, h)
        (u, m.title, m.canonical, m.noindex, m.nofollow, m.canonical == u)
      }
      .toDF("url", "title", "canonical", "noindex", "nofollow",
        "is_self_canonical")
  }

  /** Deterministic head corpus over documents — five variant shapes,
    * each exercising one scanner hazard the closed-form oracle then
    * predicts:
    *  0 — plain title, no canonical, no robots meta;
    *  1 — uppercase TITLE tag + double-quoted canonical to another doc;
    *  2 — single-quoted RELATIVE canonical + "noindex, follow" robots
    *      meta + title with whitespace runs (collapsed by the scanner);
    *  3 — attribute order reversed (href before rel) + unquoted
    *      NOFOLLOW content + NO title;
    *  4 — unquoted "noindex,nofollow" + a decoy <link rel="stylesheet">
    *      and a decoy <metadata> tag that must not match <meta>. */
  def syntheticHeads(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val ds = d.cast("string")
    def urlOf(id: org.apache.spark.sql.Column) =
      concat(lit("https://host"), (id % 13).cast("string"),
        lit(".example/doc"), id.cast("string"))
    val canonTarget = (d * 3 + 1) % 500
    val head = when(d % 5 === 0,
        concat(lit("<head><title>Doc "), ds, lit("</title></head>")))
      .when(d % 5 === 1,
        concat(lit("<head><TITLE>Doc &amp;&#32;&#120; "), ds, lit("</TITLE>"),
          lit("<link rel=\"canonical\" href=\""), urlOf(canonTarget),
          lit("\"></head>")))
      .when(d % 5 === 2,
        concat(lit("<head><title>Doc   "), ds, lit("  x</title>"),
          lit("<link rel='canonical' href='/doc"), canonTarget.cast("string"),
          lit("'><meta name=\"robots\" content=\"noindex, follow\"></head>")))
      .when(d % 5 === 3,
        concat(lit("<head><link href=\""), urlOf(canonTarget),
          lit("\" rel=\"canonical\">"),
          lit("<META NAME=robots CONTENT=NOFOLLOW></head>")))
      .otherwise(
        concat(lit("<head><title>Doc "), ds, lit("</title>"),
          lit("<link rel=\"stylesheet\" href=\"/s.css\">"),
          lit("<metadata name=\"robots\" content=\"noindex\"></metadata>"),
          lit("<meta name=robots content=noindex,nofollow></head>")))
    docs.select(urlOf(d).as("url"),
      concat(head, lit("<body>b</body>")).as("html"))
  }

  /** Closed-form oracle for extract(syntheticHeads(documents)). The
    * relative canonical in variant 2 resolves against the page's HOST
    * (root-relative), so its canonical host differs from the target
    * doc's own home host — stated explicitly below, the same
    * base-resolution semantics web_links pins. */
  /** Shared closed-form CTE over documents: per-doc variant `v`, page
    * url and the two canonical-target spellings. Used by
    * [[headsOracleSql]] and the composed canonical-consolidation
    * oracles below. */
  private val headsUCte: String =
    """d AS (SELECT doc_id, doc_id % 5 AS v,
      |  CAST(doc_id AS VARCHAR) AS ds,
      |  (doc_id * 3 + 1) % 500 AS ct
      | FROM documents),
      |u AS (SELECT doc_id, v, ds,
      |  'https://host' || CAST(doc_id % 13 AS VARCHAR) || '.example/doc'
      |    || ds AS url,
      |  'https://host' || CAST(ct % 13 AS VARCHAR) || '.example/doc'
      |    || CAST(ct AS VARCHAR) AS canon_abs,
      |  'https://host' || CAST(doc_id % 13 AS VARCHAR) || '.example/doc'
      |    || CAST(ct AS VARCHAR) AS canon_rel
      | FROM d)""".stripMargin

  /** The canonical column's closed form over a `u` row. */
  private val canonicalCase: String =
    """CASE WHEN v = 1 OR v = 3 THEN canon_abs
      |      WHEN v = 2 THEN canon_rel
      |      ELSE url END""".stripMargin

  // NOTE on composition: these oracles are built by CONCATENATING the
  // pre-stripped fragments, never by interpolating them into another
  // `s"...".stripMargin` — the fragments' own lines start with `||`
  // SQL concats that a second stripMargin pass would eat.
  def headsOracleSql: String =
    "WITH " + headsUCte + "\n" +
      """SELECT url,
        | CASE WHEN v = 3 THEN ''
        |      WHEN v = 2 THEN 'Doc ' || ds || ' x'
        |      WHEN v = 1 THEN 'Doc & x ' || ds
        |      ELSE 'Doc ' || ds END AS title,
        | """.stripMargin + canonicalCase +
      """ AS canonical,
        | (v = 2 OR v = 4) AS noindex,
        | (v = 3 OR v = 4) AS nofollow,
        | (v = 0 OR v = 4) AS is_self_canonical
        |FROM u""".stripMargin

  // ------------------------------------------------------------------
  // Canonical-url consolidation (redirect collapse + declared canonical)
  // ------------------------------------------------------------------

  /** url → canonical-url consolidation map — the standard pre-dedup
    * canonicalization a crawl corpus runs so a page, its redirect
    * aliases, and its declared-canonical variants count as ONE
    * document:
    *
    *  1. collapse each url's HTTP-redirect chain to its terminal
    *     ([[WebGraph.resolveRedirects]], pointer doubling — O(log L)
    *     shuffles);
    *  2. apply the TERMINAL page's self-declared `rel=canonical`
    *     (from [[extract]]), ONE hop only — the same single-application
    *     rule search engines use (repeated application can oscillate
    *     between mutually-canonical pages, so chains of canonicals are
    *     deliberately not followed);
    *  3. a terminal with no fetched page (redirect out of the corpus)
    *     canonicalizes to the terminal url itself; a url on a redirect
    *     LOOP keeps itself (is_cycle=true) — a loop has no trustworthy
    *     canonical.
    *
    * Input: `meta` = [[extract]] output (url, canonical, …);
    * `redirects` = (src, dst) fetch-time redirect edges. Output:
    * (url, canonical_url, redirect_hops, declared, is_cycle) — one row
    * per meta row; `declared` marks rows whose step-2 hop actually
    * changed the url (terminal page exists and self-declares a
    * DIFFERENT canonical).
    *
    * Scale shape (10^12 pages): redirect resolution touches only the
    * redirect table (a few % of fetches); the map itself is two
    * hash-partitioned equi-joins on url — no driver state, no
    * broadcast of anything page-sized. Both joins key on the same url
    * domain, so with the meta table bucketed by url the second join's
    * exchange reuses the first's partitioning. */
  def canonicalMap(meta: DataFrame, redirects: DataFrame,
                   maxRounds: Int = 20): DataFrame = {
    val resolved = WebGraph.resolveRedirects(redirects, maxRounds)
      .select(col("src").as("r_src"), col("final_dst"),
        col("hops"), col("is_cycle").as("r_cycle"))
    // two consumers (stepped join + the terminal's canonical lookup):
    // checkpoint so the caller's head-parse subtree runs once (round 6)
    val m = meta.select(col("url"), col("canonical")).localCheckpoint(false)
    val stepped = m.join(resolved, m("url") === resolved("r_src"), "left")
      .select(m("url"),
        when(col("r_cycle"), m("url"))
          .otherwise(coalesce(col("final_dst"), m("url"))).as("term"),
        when(col("r_cycle"), lit(0L))
          .otherwise(coalesce(col("hops"), lit(0L))).as("redirect_hops"),
        coalesce(col("r_cycle"), lit(false)).as("is_cycle"))
    val tm = m.select(col("url").as("t_url"),
      col("canonical").as("t_canonical"))
    stepped.join(tm, stepped("term") === tm("t_url"), "left")
      .select(stepped("url"),
        when(col("is_cycle"), stepped("url"))
          .otherwise(coalesce(col("t_canonical"), col("term")))
          .as("canonical_url"),
        col("redirect_hops"),
        (!col("is_cycle") && col("t_url").isNotNull &&
          col("t_canonical") =!= col("term")).as("declared"),
        col("is_cycle"))
  }

  /** Canonical-cluster summary over a [[canonicalMap]] result: one row
    * per canonical_url with the cluster size, how many members arrived
    * via a declared canonical, and the representative url the corpus
    * keeps — the canonical_url itself when it was actually fetched
    * (it has a meta row), else the lexicographically smallest member
    * (deterministic fallback for canonicals pointing outside the
    * crawl). One shuffle on canonical_url + one membership join. */
  def canonicalClusters(mapping: DataFrame, meta: DataFrame): DataFrame = {
    val cl = mapping.groupBy(col("canonical_url"))
      .agg(min(col("url")).as("min_url"),
        count(lit(1)).as("cluster_size"),
        sum(col("declared").cast("long")).as("n_declared"))
    val pages = meta.select(col("url").as("p_url"))
    cl.join(pages, cl("canonical_url") === pages("p_url"), "left")
      .select(col("canonical_url"),
        when(col("p_url").isNotNull, col("canonical_url"))
          .otherwise(col("min_url")).as("rep_url"),
        col("cluster_size"), col("n_declared"))
  }

  /** Composed DuckDB oracle for
    * canonicalMap(extract(syntheticHeads(documents)),
    * syntheticRedirects(documents)) — built from the SAME closed-form
    * CTEs the component oracles use ([[headsUCte]] / [[canonicalCase]]
    * / [[WebGraph.redirectWalkCte]]), so the composition is checked,
    * not re-derived. The synthetic corpus is acyclic (is_cycle always
    * false; loop handling is pinned by unit specs). */
  /** Shared prefix of both composed oracles: heads closed form +
    * redirect walk + per-url terminal (`m`). */
  private def composedPrefix: String =
    "WITH RECURSIVE " + headsUCte + ",\n" +
      "heads AS (SELECT url, " + canonicalCase + " AS canonical FROM u),\n" +
      WebGraph.redirectWalkCte + ",\n" +
      """m AS (SELECT h.url,
        |       coalesce(t.t, h.url) AS term,
        |       coalesce(t.hops, 0) AS redirect_hops
        |      FROM heads h LEFT JOIN term t ON h.url = t.src)""".stripMargin

  def canonicalMapOracleSql: String =
    composedPrefix + "\n" +
      """SELECT m.url, coalesce(h2.canonical, m.term) AS canonical_url,
        |       CAST(m.redirect_hops AS BIGINT) AS redirect_hops,
        |       (h2.url IS NOT NULL AND h2.canonical <> m.term) AS declared,
        |       false AS is_cycle
        |FROM m LEFT JOIN heads h2 ON m.term = h2.url""".stripMargin

  /** Composed oracle for canonicalClusters(canonicalMap(…), …). */
  def canonicalClustersOracleSql: String =
    composedPrefix + ",\n" +
      """map AS (SELECT m.url,
        |        coalesce(h2.canonical, m.term) AS canonical_url,
        |        (h2.url IS NOT NULL AND h2.canonical <> m.term) AS declared
        |       FROM m LEFT JOIN heads h2 ON m.term = h2.url),
        |cl AS (SELECT canonical_url, min(url) AS min_url,
        |        COUNT(*) AS cluster_size,
        |        CAST(SUM(CASE WHEN declared THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_declared
        |       FROM map GROUP BY 1)
        |SELECT cl.canonical_url,
        |       CASE WHEN h3.url IS NOT NULL THEN cl.canonical_url
        |            ELSE cl.min_url END AS rep_url,
        |       cl.cluster_size, cl.n_declared
        |FROM cl LEFT JOIN heads h3 ON cl.canonical_url = h3.url""".stripMargin
}
