package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Web-graph layer: anchor-scanner vectors (hand-written markup, not
  * engine-generated), hand-computed integer PageRank, determinism
  * under repartitioning, and the synthetic-web construct+parse
  * round-trip against a Spark replication of the closed-form oracle. */
class WebGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val base = "https://h.example/a/page.html"

  private def edges(html: String): Seq[(String, String, Boolean)] =
    WebGraph.anchors(base, html).map(a => (a.dst, a.anchor, a.is_rel))

  // ---------------- scanner vectors --------------------------------

  test("quoting styles: double, single, unquoted") {
    val html = """<a href="https://x/1">one</a><a href='https://x/2'>two</a><a href=https://x/3>three</a>"""
    assert(edges(html) == Seq(
      ("https://x/1", "one", false),
      ("https://x/2", "two", false),
      ("https://x/3", "three", false)))
  }

  test("case-insensitive tag and attribute; boundary guards abbr/area") {
    val html = """<A HREF="https://x/up">UP</A><abbr href="https://no/1">n</abbr><area href="https://no/2">"""
    assert(edges(html) == Seq(("https://x/up", "UP", false)))
  }

  test("no-href and fragment-only anchors yield no edge") {
    val html = """<a name="top">skip</a><a href="#sec">frag</a><a href="">empty</a><a href="https://x/k">keep</a>"""
    assert(edges(html) == Seq(("https://x/k", "keep", false)))
  }

  test("anchor text strips nested tags and collapses whitespace") {
    val html = "<a href=\"https://x/1\">ref <b>2</b>\n\t more</a>"
    assert(edges(html) == Seq(("https://x/1", "ref 2 more", false)))
  }

  test("relative resolution: root, protocol, and path relative") {
    val html = """<a href="/doc9">r</a><a href="//cdn.example/f">p</a><a href="sub/x.html">s</a>"""
    assert(edges(html) == Seq(
      ("https://h.example/doc9", "r", true),
      ("https://cdn.example/f", "p", true),
      ("https://h.example/a/sub/x.html", "s", true)))
  }

  test("malformed markup never throws: unterminated tag / missing close") {
    assert(edges("<a href=\"https://x/1\"").isEmpty) // open tag hits EOF
    // missing </a>: text runs to EOF, edge still extracted
    assert(edges("<a href=\"https://x/1\">tail text") ==
      Seq(("https://x/1", "tail text", false)))
    assert(edges("text with < stray <a> and <a href=#>f</a> only") .isEmpty)
  }

  test("</abbr> does not close an anchor; real </a> does") {
    val html = "<a href=\"https://x/1\">t <abbr>q</abbr> end</a><a href=\"https://x/2\">n</a>"
    assert(edges(html) == Seq(
      ("https://x/1", "t q end", false), ("https://x/2", "n", false)))
  }

  // ---------------- url canonicalization ---------------------------

  test("normalizeUrl: case, ports, fragments, dot segments, bare query") {
    val n = WebGraph.normalizeUrl _
    assert(n("HTTPS://Host4.Example/Doc9") == "https://host4.example/Doc9")
    assert(n("https://h.example:443/x") == "https://h.example/x")
    assert(n("http://h.example:80/x") == "http://h.example/x")
    assert(n("http://h.example:443/x") == "http://h.example:443/x") // non-default kept
    assert(n("https://h.example:8443/x") == "https://h.example:8443/x")
    assert(n("https://h.example/a/../doc5") == "https://h.example/doc5")
    assert(n("https://h.example/a/./b/.") == "https://h.example/a/b/")
    assert(n("https://h.example/..") == "https://h.example/")
    assert(n("https://h.example/a/../../b") == "https://h.example/b")
    assert(n("https://h.example/a//b") == "https://h.example/a/b")
    assert(n("https://h.example/doc5#sec1") == "https://h.example/doc5")
    assert(n("https://h.example/doc5?") == "https://h.example/doc5")
    assert(n("https://h.example/doc5?a=1#f") == "https://h.example/doc5?a=1")
    assert(n("https://h.example") == "https://h.example/")
    assert(n("https://h.example?x=1") == "https://h.example/?x=1")
    assert(n("relative/path") == "relative/path") // non-absolute untouched
    // path/query case preserved; only scheme+authority fold
    assert(n("HTTP://A.B/KeepCase?Q=V") == "http://a.b/KeepCase?Q=V")
  }

  test("normalizeUrls collapses all messy variants to one canonical") {
    val s = spark
    import s.implicits._
    val docs = (0L until 60L).map(i => (i, "t")).toDF("doc_id", "text")
    val out = WebGraph.normalizeUrls(WebGraph.messyUrls(docs)).collect()
    assert(out.length == 60)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(2) ==
        s"https://host${id % 13}.example/doc$id", s"id=$id raw=${r.getString(1)}")
    }
    // non-vacuous: all six variant shapes occur and four are non-canonical
    assert(out.count(r => r.getString(1) != r.getString(2)) == 50)
  }

  // ---------------- graph kernels ----------------------------------

  private def edgeDf(rows: Seq[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  test("degrees: distinct edges, self-loops dropped, zero-filled") {
    val e = edgeDf(Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "A"),
      ("C", "C")))
    val d = WebGraph.degrees(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d == Set(("A", 2L, 1L), ("B", 1L, 1L), ("C", 0L, 1L)))
  }

  test("pageRankInt matches hand-computed integer fixed point") {
    // A -> B, A -> C, B -> A; C dangling. scale = 1e6, n = 3:
    // init = 333333, base = (15*333333)/100 = 49999
    // iter1: A = 49999 + (85*333333)/100        = 333332
    //        B = C = 49999 + (85*166666)/100    = 191665
    // iter2: A = 49999 + (85*191665)/100        = 212914
    //        B = C = 49999 + (85*(333332/2))/100 = 191665
    val e = edgeDf(Seq(("A", "B"), ("A", "C"), ("B", "A")))
    val r1 = WebGraph.pageRankInt(e, iterations = 1, scale = 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r1 == Map("A" -> 333332L, "B" -> 191665L, "C" -> 191665L))
    val r2 = WebGraph.pageRankInt(e, iterations = 2, scale = 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r2 == Map("A" -> 212914L, "B" -> 191665L, "C" -> 191665L))
  }

  test("hitsInt matches hand-computed integer fixed point") {
    // A -> B, A -> C, B -> C, D -> C. scale = 1000, n = 4, init = 250.
    // iter1: h_raw = (A 500, B 250, D 250), sum 1000
    //        h1    = (A 500, B 250, D 250, C 0)
    //        a_raw = (B 500, C 500+250+250 = 1000), sum 1500
    //        a1    = (B 500000//1500 = 333, C 1000000//1500 = 666)
    // iter2: h_raw = (A 333+666 = 999, B 666, D 666), sum 2331
    //        h2    = (A 999000//2331 = 428, B 285, D 285)
    //        a_raw = (B 428, C 428+285+285 = 998), sum 1426
    //        a2    = (B 428000//1426 = 300, C 998000//1426 = 699)
    val e = edgeDf(Seq(("A", "B"), ("A", "C"), ("B", "C"), ("D", "C")))
    val r1 = WebGraph.hitsInt(e, iterations = 1, scale = 1000L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(r1 == Map("A" -> ((500L, 0L)), "B" -> ((250L, 333L)),
      "C" -> ((0L, 666L)), "D" -> ((250L, 0L))))
    val r2 = WebGraph.hitsInt(e, iterations = 2, scale = 1000L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(r2 == Map("A" -> ((428L, 0L)), "B" -> ((285L, 300L)),
      "C" -> ((0L, 699L)), "D" -> ((285L, 0L))))
  }

  test("hitsInt is bit-identical across partitioning/parallelism") {
    val rows = (0 until 200).flatMap { i =>
      Seq((s"n${i % 37}", s"n${(i * 7 + 3) % 37}"),
        (s"n${i % 37}", s"n${(i * 11 + 5) % 37}"))
    }
    val a = WebGraph.hitsInt(edgeDf(rows).repartition(1), 4)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val b = WebGraph.hitsInt(edgeDf(rows).repartition(16), 4)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(a == b)
    // L1 renorm sanity: each score family totals at most `scale`
    assert(a.values.map(_._1).sum <= 100000000L)
    assert(a.values.map(_._2).sum <= 100000000L)
  }

  test("pageRankInt is bit-identical across partitioning/parallelism") {
    val rows = (0 until 200).flatMap { i =>
      Seq((s"n${i % 37}", s"n${(i * 7 + 3) % 37}"),
        (s"n${i % 37}", s"n${(i * 11 + 5) % 37}"))
    }
    val a = WebGraph.pageRankInt(edgeDf(rows).repartition(1), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = WebGraph.pageRankInt(edgeDf(rows).repartition(16), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
    // mass sanity: total never exceeds the initial mass
    assert(a.values.sum <= 1000000000000L)
  }

  test("pageRankSeeded matches hand-computed fixed point; absent seeds ignored") {
    // A -> B -> C -> A, D -> A; seeds = {A} (+ absent Z, ignored).
    // scale = 1e6, nS = 1: init = 1,000,000, base = 150,000.
    // iter1: A = 150000 (no in-mass: C and D hold 0)
    //        B = (85 * 1e6) / 100 = 850000; C = D = 0
    // iter2: A = 150000; B = (85*150000)/100 = 127500
    //        C = (85*850000)/100 = 722500; D = 0
    val sp = spark; import sp.implicits._
    val e = edgeDf(Seq(("A", "B"), ("B", "C"), ("C", "A"), ("D", "A")))
    val seeds = Seq("A", "Z").toDF("url")
    val r2 = WebGraph.pageRankSeeded(e, seeds, iterations = 2,
      scale = 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r2 == Map("A" -> 150000L, "B" -> 127500L, "C" -> 722500L,
      "D" -> 0L))
  }

  test("pageRankSeeded with full-universe seeds equals pageRankInt; partition-invariant") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 200).flatMap { i =>
      Seq((s"n${i % 37}", s"n${(i * 7 + 3) % 37}"),
        (s"n${i % 37}", s"n${(i * 11 + 5) % 37}"))
    }
    val allUrls = rows.flatMap(p => Seq(p._1, p._2)).distinct.toDF("url")
    val global = WebGraph.pageRankInt(edgeDf(rows), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val seeded = WebGraph.pageRankSeeded(edgeDf(rows).repartition(1),
      allUrls, 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val seeded16 = WebGraph.pageRankSeeded(edgeDf(rows).repartition(16),
      allUrls.repartition(3), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(seeded == global) // term-for-term reduction to the global kernel
    assert(seeded16 == seeded)
  }

  test("coCitation: hand-computed counts, dup edges/self-loops dropped, cap binds") {
    // S1→{A,B,C}, S2→{A,B} (A twice), S3→{A,B}, H→{A,B,C,D};
    // self-loop A→A ignored. With maxOutDegree=3, H (degree 4) is out:
    // AB co-cited by S1,S2,S3 = 3; AC/BC only by S1 → below minCount 2.
    val e = edgeDf(Seq(("S1", "A"), ("S1", "B"), ("S1", "C"),
      ("S2", "A"), ("S2", "A"), ("S2", "B"), ("S3", "A"), ("S3", "B"),
      ("H", "A"), ("H", "B"), ("H", "C"), ("H", "D"), ("A", "A")))
    val got = WebGraph.coCitation(e, minCount = 2, maxOutDegree = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", "B", 3L)))
    // uncapped: H participates, AB rises to 4 and AC/BC reach 2
    val unc = WebGraph.coCitation(e, minCount = 2, maxOutDegree = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(unc == Set(("A", "B", 4L), ("A", "C", 2L), ("B", "C", 2L)))
  }

  test("bibCoupling: in-degree cap excludes popular targets") {
    val e = edgeDf(Seq(("S1", "A"), ("S1", "B"), ("S1", "C"),
      ("S2", "A"), ("S2", "B"), ("S3", "A"), ("S3", "B"),
      ("H", "A"), ("H", "B"), ("H", "C"), ("H", "D")))
    // in-degrees: A 4, B 4, C 2, D 1. Cap 10: pairs via A,B (+C for H,S1)
    val all = WebGraph.bibCoupling(e, minCount = 2, maxInDegree = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(all == Set(("H", "S1", 3L), ("H", "S2", 2L), ("H", "S3", 2L),
      ("S1", "S2", 2L), ("S1", "S3", 2L), ("S2", "S3", 2L)))
    // cap 3 removes A and B; only C is shared (H,S1 once) → under min 2
    assert(WebGraph.bibCoupling(e, minCount = 2, maxInDegree = 3)
      .collect().isEmpty)
  }

  test("weaklyConnected: min-url labels, self-loop-only vertex labeled") {
    // {A,B,C} one component (min A), {X,Y} another, S only self-loops
    val e = edgeDf(Seq(("C", "B"), ("B", "A"), ("Y", "X"), ("S", "S")))
    val got = WebGraph.weaklyConnected(e).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("A" -> "A", "B" -> "A", "C" -> "A",
      "X" -> "X", "Y" -> "X", "S" -> "S"))
  }

  test("weaklyConnected: distributed star-contraction arm agrees with driver arm") {
    // 4 blocks of the affine permutation x -> 7x+3 (mod 25): expected
    // 7 components per block (six 4-cycles + the fixed point 12)
    val rows = (0L until 100L).map { d =>
      (s"u${d}", s"u${d - d % 25 + (d * 7 + 3) % 25}")
    }
    val viaDriver = WebGraph.weaklyConnected(edgeDf(rows)).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val viaStar = WebGraph.weaklyConnected(edgeDf(rows).repartition(16),
      driverSolveMaxEdges = 0L).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(viaDriver == viaStar)
    assert(viaDriver.values.toSet.size == 28) // 7 per block × 4 blocks
    assert(viaDriver.size == 100)
    // every label is the lexicographic min of its member set
    viaDriver.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
  }

  // ---------------- synthetic web round-trip ------------------------

  test("extractAnchors(syntheticWeb) equals the closed-form edge set") {
    val s = spark
    import s.implicits._
    val n = 50L
    val docs = (0L until n).map(i => (i, s"word$i text body"))
      .toDF("doc_id", "text")
    val got = WebGraph.extractAnchors(WebGraph.syntheticWeb(docs, n))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSet

    // Spark replication of the oracle's closed form (never parses html)
    def urlOf(id: Long) = s"https://host${id % 13}.example/doc$id"
    val expected = (0L until n).flatMap { d =>
      val abs = (1 to (1 + d % 3).toInt).map { k =>
        val t = (d * 7 + k * 11) % n
        (urlOf(d), urlOf(t), s"ref $k", false)
      }
      abs :+ ((urlOf(d),
        s"https://host${d % 13}.example/doc${(d * 3 + 5) % n}",
        "rel link", true))
    }.toSet
    assert(got == expected)
    // non-vacuous: every quoting style and the relative form occur
    assert(got.exists(_._3 == "ref 2") && got.exists(_._3 == "ref 3"))
    assert(got.count(_._4) == n)
  }

  // ---------------- redirect resolution ----------------------------

  test("resolveRedirects: chains to terminal with exact hops; dup src folds") {
    val s = spark
    import s.implicits._
    // a→b→c→d (len 3), e→f (len 1), g→b (joins mid-chain),
    // h has TWO rows (→z and →a): min(dst) = a wins deterministically
    val r = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"),
      ("g", "b"), ("h", "z"), ("h", "a")).toDF("src", "dst")
    val out = WebGraph.resolveRedirects(r).collect()
      .map(x => x.getString(0) ->
        ((x.getString(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(out("a") == (("d", 3L, false)))
    assert(out("b") == (("d", 2L, false)))
    assert(out("c") == (("d", 1L, false)))
    assert(out("e") == (("f", 1L, false)))
    assert(out("g") == (("d", 3L, false)))
    assert(out("h") == (("d", 4L, false))) // h→a→b→c→d
  }

  test("resolveRedirects: loops flagged, loop-feeders flagged, acyclic untouched") {
    val s = spark
    import s.implicits._
    val r = Seq(("p", "q"), ("q", "p"), ("in", "p"), ("ok", "t"))
      .toDF("src", "dst")
    val out = WebGraph.resolveRedirects(r, maxRounds = 6).collect()
      .map(x => x.getString(0) -> x.getBoolean(3)).toMap
    assert(out("p") && out("q") && out("in"))
    assert(!out("ok"))
  }

  test("resolveRedirects: 100-hop chain resolves within 8 doubling rounds") {
    val s = spark
    import s.implicits._
    val r = (0 until 100).map(i => (s"u$i", s"u${i + 1}")).toDF("src", "dst")
    // 2^7 = 128 ≥ 100 → 7 doubling rounds + 1 convergence probe round
    val out = WebGraph.resolveRedirects(r, maxRounds = 8).collect()
      .map(x => x.getString(0) ->
        ((x.getString(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(out("u0") == (("u100", 100L, false)))
    assert(out("u99") == (("u100", 1L, false)))
    assert(out.valuesIterator.forall(!_._3))
  }

  // ---------------- anchor-text profile ----------------------------

  test("anchorTextProfile: counts, distinct hosts, capped sorted anchors") {
    val s = spark
    import s.implicits._
    val e = Seq(
      ("https://a.x/1", "https://t.x/p", "zeta", false),
      ("https://a.x/2", "https://t.x/p", "alpha", false),
      ("https://a.x/2", "https://t.x/p", "alpha", false), // dup edge row
      ("https://b.x/1", "https://t.x/p", "mid", false),
      ("https://t.x/p", "https://t.x/p", "self", false), // self-loop: dropped
      ("https://a.x/1", "https://u.x/q", "only", false))
      .toDF("src", "dst", "anchor", "is_rel")
    val out = WebGraph.anchorTextProfile(e, maxAnchors = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    // t.x/p: 4 in-links (dup rows count), 2 distinct hosts (a.x, b.x),
    // anchors {alpha, mid, zeta} capped at 2 sorted → "alpha | mid"
    assert(out == Set(
      ("https://t.x/p", 4L, 2L, "alpha | mid"),
      ("https://u.x/q", 1L, 1L, "only")))
  }

  // ---------------- robots.txt -------------------------------------

  test("patternMatches: prefix, wildcard, end-anchor semantics") {
    val m = WebGraph.patternMatches _
    assert(m("/doc", "/doc5"))
    assert(m("/doc", "/doc"))
    assert(!m("/doc", "/d"))
    assert(!m("/doc", "/a/doc")) // prefix match starts at 0
    assert(m("/", "/anything"))
    assert(m("/*.bin$", "/doc5.bin"))
    assert(m("/*.bin$", "/a/b/c.bin"))
    assert(!m("/*.bin$", "/a/doc5.binx")) // $ anchor near-miss
    assert(!m("/*.bin$", "/.bi"))
    assert(m("/a*c", "/abxc"))
    assert(m("/a*c", "/ac"))
    assert(!m("/a*c", "/ab"))
    assert(m("/a*b*c", "/a-b-c-tail")) // unanchored prefix
    assert(!m("/doc$", "/doc5")) // anchored exact
    assert(m("/doc$", "/doc"))
    assert(m("/*", "/x"))
  }

  test("parseRobots: group selection, case, comments, empty values") {
    val txt = "# policy\nUser-Agent: Other\nDisallow: /x\n\n" +
      "User-agent: GraftBot\nUser-agent: extra\nDisallow: /doc\nAllow: /doc2\n" +
      "Crawl-delay: 5\nDisallow: /late\n\nUser-agent: *\nDisallow: /\n"
    // specific group (case-insensitive) wins; the post-Crawl-delay rule
    // still belongs to it (non-UA directives don't close the group)
    assert(WebGraph.parseRobots(txt, "graftbot") == Vector(
      WebGraph.RobotRule("/doc", false), WebGraph.RobotRule("/doc2", true),
      WebGraph.RobotRule("/late", false)))
    // unnamed agent falls back to the * group
    assert(WebGraph.parseRobots(txt, "nobody") ==
      Vector(WebGraph.RobotRule("/", false)))
    // empty specific group exists → applies exclusively (allow all)
    val txt2 = "User-agent: GraftBot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert(WebGraph.parseRobots(txt2, "graftbot").isEmpty)
    // no groups at all
    assert(WebGraph.parseRobots("# nothing\n", "graftbot").isEmpty)
  }

  test("evaluate: longest match wins, tie goes to allow, no match allows") {
    val rules = Vector(WebGraph.RobotRule("/priv/", false),
      WebGraph.RobotRule("/priv/pub/", true))
    assert(WebGraph.evaluate(rules, "/priv/doc1") == (false, "/priv/"))
    assert(WebGraph.evaluate(rules, "/priv/pub/doc1") == (true, "/priv/pub/"))
    assert(WebGraph.evaluate(rules, "/open") == (true, ""))
    val tie = Vector(WebGraph.RobotRule("/abc", false),
      WebGraph.RobotRule("/ab*", true))
    assert(WebGraph.evaluate(tie, "/abcd") == (true, "/ab*"))
    assert(WebGraph.evaluate(Vector.empty, "/x") == (true, ""))
  }

  test("parseRobotsFull: crawl-delay group exclusivity, min-wins, bad values") {
    val txt = "User-agent: GraftBot\nDisallow: /doc\nCrawl-delay: 10\n\n" +
      "User-agent: *\nDisallow: /\nCrawl-delay: 60\n"
    // specific group's delay applies exclusively; * delay ignored
    assert(WebGraph.parseRobotsFull(txt, "graftbot")._2 == Some(10000L))
    assert(WebGraph.parseRobotsFull(txt, "nobody")._2 == Some(60000L))
    // specific group exists but declares no delay → None (exclusive)
    val noDelay = "User-agent: GraftBot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 5\n"
    assert(WebGraph.parseRobotsFull(noDelay, "graftbot")._2.isEmpty)
    // two applicable groups → min; fractional seconds; junk skipped
    val multi = "User-agent: a\nCrawl-delay: 2.5\n\nUser-agent: a\nCrawl-delay: 1.25\n" +
      "\nUser-agent: b\nCrawl-delay: soon\n"
    assert(WebGraph.parseRobotsFull(multi, "a")._2 == Some(1250L))
    assert(WebGraph.parseRobotsFull(multi, "b")._2.isEmpty)
  }

  test("scheduleCrawl: per-host priority order, delay spacing, default fill") {
    val s = spark
    import s.implicits._
    val frontier = Seq(
      (1L, "https://h1.x/a", "h1.x", 5L),
      (2L, "https://h1.x/b", "h1.x", 9L),
      (3L, "https://h1.x/c", "h1.x", 9L), // priority tie → doc_id asc
      (4L, "https://h2.x/a", "h2.x", 1L))
      .toDF("doc_id", "url", "host", "priority")
    val delays = Seq(("h1.x", 2000L)).toDF("host", "delay_ms")
    val out = WebGraph.scheduleCrawl(frontier, delays, defaultDelayMs = 500L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(2L) == ((1L, 0L)))    // highest priority fetches first
    assert(out(3L) == ((2L, 2000L))) // tie broken by doc_id
    assert(out(1L) == ((3L, 4000L)))
    assert(out(4L) == ((1L, 0L)))    // default delay host, rank restarts
  }

  test("robotsFilter end-to-end incl. missing-policy host") {
    val s = spark
    import s.implicits._
    val frontier = Seq(
      (1L, "https://h0.x/priv/a"), (2L, "https://h0.x/priv/pub/a"),
      (3L, "https://h0.x/open"), (4L, "https://nopolicy.x/a"))
      .toDF("doc_id", "url")
    val robots = Seq(
      ("h0.x", "User-agent: *\nDisallow: /priv/\nAllow: /priv/pub/\n"))
      .toDF("host", "robots_txt")
    val out = WebGraph.robotsFilter(frontier, robots, "anybot").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getString(3))).toSet
    assert(out == Set((1L, false, "/priv/"), (2L, true, "/priv/pub/"),
      (3L, true, ""), (4L, true, "")))
  }

  test("robotsFilter over the synthetic corpus matches the closed form") {
    val s = spark
    import s.implicits._
    // 400 docs so the (hm=1, v∈{0,3}, id starts with '2') allow-carve
    // cell is populated (first witness: doc 213)
    val docs = (0L until 400L).map(i => (i, "t")).toDF("doc_id", "text")
    val out = WebGraph.robotsFilter(WebGraph.syntheticFrontier(docs),
      WebGraph.syntheticRobots(s), "graftbot").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getString(3)))).toMap
    assert(out.size == 400)
    (0L until 400L).foreach { d =>
      val hm = (d % 13) % 4
      val v = d % 5
      val ds = d.toString
      val expected =
        if (hm == 0 && v == 1) (false, "/priv/")
        else if (hm == 0 && v == 2) (true, "/priv/pub/")
        else if (hm == 1 && (v == 0 || v == 3))
          (if (ds.startsWith("2")) (true, "/doc2") else (false, "/doc"))
        else if (hm == 2 && v == 3) (false, "/*.bin$")
        else (true, "")
      assert(out(d) == expected, s"doc_id=$d hm=$hm v=$v")
    }
    // non-vacuous: every outcome class occurs
    assert(out.values.exists(_ == (false, "/priv/")))
    assert(out.values.exists(_ == (true, "/priv/pub/")))
    assert(out.values.exists(_ == (true, "/doc2")))
    assert(out.values.exists(_ == (false, "/doc")))
    assert(out.values.exists(_ == (false, "/*.bin$")))
  }

  // ---------------- BFS crawl depth --------------------------------

  private def seedDf(urls: String*): DataFrame = {
    val sp = spark
    import sp.implicits._
    urls.toSeq.toDF("url")
  }

  private def depths(e: DataFrame, sd: DataFrame, cap: Int = 10): Map[String, Int] =
    WebGraph.crawlDepth(e, sd, cap).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  test("crawlDepth: min depth wins when a url is reachable two ways") {
    // s -> a -> b -> c and s -> c directly: c must be depth 1, not 3
    val e = edgeDf(Seq("s" -> "a", "a" -> "b", "b" -> "c", "s" -> "c"))
    assert(depths(e, seedDf("s")) ==
      Map("s" -> 0, "a" -> 1, "b" -> 2, "c" -> 1))
  }

  test("crawlDepth: cycles terminate via early frontier exhaustion") {
    val e = edgeDf(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(depths(e, seedDf("a"), cap = 50) ==
      Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("crawlDepth: unreachable urls absent; isolated seed still depth 0") {
    val e = edgeDf(Seq("a" -> "b", "x" -> "y"))
    assert(depths(e, seedDf("a", "lonely")) ==
      Map("a" -> 0, "lonely" -> 0, "b" -> 1))
  }

  test("crawlDepth: depth cap truncates a long chain") {
    val e = edgeDf(Seq("n0" -> "n1", "n1" -> "n2", "n2" -> "n3", "n3" -> "n4"))
    assert(depths(e, seedDf("n0"), cap = 2) ==
      Map("n0" -> 0, "n1" -> 1, "n2" -> 2))
  }

  test("crawlDepth: two seeds race, closest wins; duplicate edges collapse") {
    val e = edgeDf(Seq("s1" -> "m", "s2" -> "m", "m" -> "t", "m" -> "t", "t" -> "s1"))
    assert(depths(e, seedDf("s1", "s2")) ==
      Map("s1" -> 0, "s2" -> 0, "m" -> 1, "t" -> 2))
  }

  test("crawlDepth: deterministic under repartitioning") {
    val e = edgeDf(Seq("s" -> "a", "a" -> "b", "s" -> "b", "b" -> "c"))
    val base = depths(e, seedDf("s"))
    val shuffled = depths(e.repartition(7), seedDf("s").repartition(3))
    assert(base == shuffled && base("b") == 1 && base("c") == 2)
  }

  // ---------------- link reciprocity -------------------------------

  private def recipMap(e: DataFrame): Map[String, (Long, Long, Long)] =
    WebGraph.reciprocity(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("reciprocity: mutual ring scores 10^6 ppm, one-way chain zero") {
    val e = edgeDf(Seq(
      "https://farm.x/1" -> "https://farm.x/2",
      "https://farm.x/2" -> "https://farm.x/1",
      "https://org.x/a" -> "https://org.x/b",
      "https://org.x/b" -> "https://org.x/c"))
    assert(recipMap(e) == Map(
      "farm.x" -> ((2L, 2L, 1000000L)),
      "org.x" -> ((2L, 0L, 0L))))
  }

  test("reciprocity: self-loops and duplicate edges are discarded first") {
    val e = edgeDf(Seq(
      "https://h.x/a" -> "https://h.x/a",   // self-loop: dropped
      "https://h.x/a" -> "https://h.x/b",   // duplicated below
      "https://h.x/a" -> "https://h.x/b",
      "https://h.x/b" -> "https://h.x/a"))
    assert(recipMap(e) == Map("h.x" -> ((2L, 2L, 1000000L))))
  }

  test("reciprocity: cross-host edges attribute to the SOURCE host") {
    // a->b reciprocated across hosts: each side's host gets 1 recip of 1
    val e = edgeDf(Seq(
      "https://h1.x/a" -> "https://h2.x/b",
      "https://h2.x/b" -> "https://h1.x/a",
      "https://h1.x/a" -> "https://h3.x/c"))
    assert(recipMap(e) == Map(
      "h1.x" -> ((2L, 1L, 500000L)),
      "h2.x" -> ((1L, 1L, 1000000L))))
  }

  test("reciprocity: integer ppm floors, never rounds") {
    // h1 has 1 of 3 reciprocated (the return edge lives on h2, so it
    // doesn't inflate h1's counts): 1000000 div 3 = 333333 (floor)
    val e = edgeDf(Seq(
      "https://h1.x/a" -> "https://h2.x/b",
      "https://h2.x/b" -> "https://h1.x/a",
      "https://h1.x/a" -> "https://h1.x/c",
      "https://h1.x/a" -> "https://h1.x/d"))
    assert(recipMap(e)("h1.x") == ((3L, 1L, 333333L)))
  }

  test("communities: two triangles with a bridge resolve to two uniform labels") {
    val e = edgeDf(Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),   // triangle 1
      ("x", "y"), ("y", "z"), ("z", "x"),   // triangle 2
      ("c", "x")))                          // bridge
    val out = WebGraph.communities(e, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set(out("a"), out("b"), out("c")).size == 1)
    assert(Set(out("x"), out("y"), out("z")).size == 1)
    assert(out("a") != out("x"))
  }

  test("communities: isolated-pair tie takes the smaller label; repartition-invariant") {
    val e = edgeDf(Seq(("q", "p")))
    val out = WebGraph.communities(e, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // p<->q swap labels each round; round 3 leaves both holding the
    // OTHER's original label or their own depending on parity — the
    // point is determinism, pinned here: after odd rounds each holds
    // the neighbor's label
    assert(out == Map("p" -> "q", "q" -> "p"))
    val rp = WebGraph.communities(e.repartition(5), rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rp == out)
  }

  test("crawlTraps: parameterized explosion flags, path templates don't") {
    val s = spark
    import s.implicits._
    val f = ((0 until 150).map(i => s"https://h1.x/cal?p=$i") ++
      (0 until 150).map(i => s"https://h1.x/page$i") ++
      Seq("https://h2.x/about")).toDF("url")
    val out = WebGraph.crawlTraps(f, threshold = 100).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      ("https://h{n}.x/cal?p={n}", 150L, true, true),
      ("https://h{n}.x/page{n}", 150L, false, false),
      ("https://h{n}.x/about", 1L, false, false)))
  }
}
