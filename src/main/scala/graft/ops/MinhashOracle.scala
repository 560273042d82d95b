package graft.ops

/** DuckDB replication of the FULL MinHash/LSH pipeline
  * (`Dedup.minhashSignatures` → banding → bucket join → est-Jaccard
  * filter, and the verified variant's exact-Jaccard re-check), so
  * `dedup_minhash_lsh` and `dedup_minhash_verified` get REAL
  * hash-checked oracles instead of rows-only checks.
  *
  * Every number the engine produces is deterministic seeded hashing:
  *  - token hash: FNV-1a 64 over chars (Dedup.hash64);
  *  - shingle hash: FNV chain over the w=3 token hashes, with the
  *    engine's short-document quirk (n = max(1, len-2); partial
  *    shingles at len<3; the FNV offset basis alone for empty docs);
  *  - k=64 permutations: splitmix64 finalizer of (h + j*GOLD), min
  *    taken in SIGNED 64-bit order (Scala Long `<`) — the SQL casts
  *    to BIGINT before MIN;
  *  - 16 band hashes: FNV chain seeded with (offset XOR band) over
  *    the 4 signature lanes in order (unsigned re-interpretation);
  *  - bucket cap, candidate self-join, matches/64 ≥ t — plain SQL.
  *
  * The mod-2^64 arithmetic style (HUGEINT + 32-bit-split mulmod, flat
  * CTE stages, per-seed literals precomputed here in Scala) follows
  * [[SimhashOracle]], whose helpers this reuses. Same corpus caveat:
  * tokens are ASCII, so `unicode(char)` equals the UTF-16 code unit
  * Scala hashes.
  */
object MinhashOracle {
  import SimhashOracle.{mulmod, xor64}

  private val M = "18446744073709551616"
  private val FNV_OFF = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
  private val FNV_P = "1099511628211"
  private val GOLD = BigInt(java.lang.Long.toUnsignedString(0xc2b2ae3d27d4eb4fL))
  private val SM1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
  private val SM2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
  private val SM3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)

  private def fnvStep(h: String, c: String): String = mulmod(xor64(h, c), FNV_P)

  /** FNV-1a over the chars of a (short, ASCII) token expression. */
  private def tokHash(t: String): String =
    s"list_reduce(list_prepend(CAST($FNV_OFF AS HUGEINT), " +
      s"list_transform(split($t, ''), x -> CAST(unicode(x) AS HUGEINT))), " +
      s"(h, c) -> ${fnvStep("h", "c")})"

  /** WITH-clause stages ending in `est(a_id, b_id, est_jaccard)` over
    * table `documents` (no threshold applied yet). */
  /** Stages toklist..sig(doc_id, j, s): per-doc k-perm signatures over
    * 3-token shingles (signed-min lanes) — shared by the LSH pipeline
    * and the host-overlap rollup. */
  private def sigStages(k: Int, docSrc: String = "documents"): String = {
    val seedRows = (0 until k).map { j =>
      s"($j, CAST('${(BigInt(j) * GOLD) % (BigInt(1) << 64)}' AS HUGEINT))"
    }.mkString(", ")
    val off = s"CAST($FNV_OFF AS HUGEINT)"
    s"""toklist AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0) AS ts
       |  FROM $docSrc),
       |docn AS (SELECT doc_id, ts, len(ts) AS tl, greatest(1, len(ts) - 2) AS n FROM toklist),
       |spos AS (SELECT doc_id, ts, tl, unnest(generate_series(1, n)) AS i FROM docn),
       |sh1 AS (SELECT doc_id, ts, tl, i,
       |  CASE WHEN i <= tl THEN ${fnvStep(off, tokHash("ts[i]"))} ELSE $off END AS h FROM spos),
       |sh2 AS (SELECT doc_id, ts, tl, i,
       |  CASE WHEN i + 1 <= tl THEN ${fnvStep("h", tokHash("ts[i+1]"))} ELSE h END AS h FROM sh1),
       |sh3 AS (SELECT doc_id,
       |  CASE WHEN i + 2 <= tl THEN ${fnvStep("h", tokHash("ts[i+2]"))} ELSE h END AS h FROM sh2),
       |seeds(j, jadd) AS (VALUES $seedRows),
       |mh0 AS (SELECT doc_id, j, (h + jadd) % $M AS z FROM sh3, seeds),
       |mh1 AS (SELECT doc_id, j, (z + $SM1) % $M AS z FROM mh0),
       |mh2 AS (SELECT doc_id, j, ${mulmod(xor64("z", s"z // ${1L << 30}"), SM2)} AS z FROM mh1),
       |mh3 AS (SELECT doc_id, j, ${mulmod(xor64("z", s"z // ${1L << 27}"), SM3)} AS z FROM mh2),
       |mh4 AS (SELECT doc_id, j, ${xor64("z", s"z // ${1L << 31}")} AS z FROM mh3),
       |sig AS (SELECT doc_id, j,
       |  min(CAST(CASE WHEN z >= 9223372036854775808 THEN z - $M ELSE z END AS BIGINT)) AS s
       |  FROM mh4 GROUP BY doc_id, j)""".stripMargin
  }

  private def pipeline(k: Int, bands: Int, bucketCap: Int,
                       docSrc: String = "documents"): String = {
    val r = k / bands
    val bandRows = (0 until bands).map { b =>
      s"($b, CAST('${java.lang.Long.toUnsignedString(0xcbf29ce484222325L ^ b)}' AS HUGEINT))"
    }.mkString(", ")
    s"""${sigStages(k, docSrc)},
       |bands(b, bstart) AS (VALUES $bandRows),
       |bh AS (SELECT doc_id, b,
       |  list_reduce(list_prepend(any_value(bstart),
       |    list(CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M ELSE CAST(s AS HUGEINT) END ORDER BY j)),
       |    (h, c) -> ${fnvStep("h", "c")}) AS h
       |  FROM sig JOIN bands ON sig.j // $r = bands.b GROUP BY doc_id, b),
       |capped AS (SELECT * FROM (
       |  SELECT doc_id, b, h, count(*) OVER (PARTITION BY b, h) AS bsz FROM bh) WHERE bsz <= $bucketCap),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM capped x JOIN capped y ON x.b = y.b AND x.h = y.h AND x.doc_id < y.doc_id),
       |est AS (SELECT a_id, b_id,
       |  CAST(sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS DOUBLE) / $k AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id AND sa.j = sb.j
       |  GROUP BY a_id, b_id)""".stripMargin
  }

  /** Oracle for `Dedup.minhashLsh(documents, 64, 16, 0.5)`. */
  def lshSql(k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
             bucketCap: Int = 1000): String =
    s"""WITH ${pipeline(k, bands, bucketCap)}
       |SELECT a_id, b_id, est_jaccard FROM est WHERE est_jaccard >= $threshold""".stripMargin

  /** Oracle for `Dedup.minhashLshIncremental(base = doc_id < split,
    * delta = doc_id >= split)` — the incremental path's contract IS
    * "the full-corpus pipeline restricted to delta-touching pairs",
    * so the oracle states exactly that: the complete replica plus the
    * restriction. An engine that quietly recomputed the base, capped
    * buckets on the delta alone, or lost delta-delta pairs diverges
    * from this. */
  def lshIncrementalSql(split: Long, k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5,
                        bucketCap: Int = 1000): String =
    s"""WITH ${pipeline(k, bands, bucketCap)}
       |SELECT a_id, b_id, est_jaccard FROM est
       |WHERE est_jaccard >= $threshold
       |  AND (a_id >= $split OR b_id >= $split)""".stripMargin

  /** Oracle for `Dedup.minhashVerified(documents)` — LSH candidates at
    * estThreshold, re-checked with exact distinct-token-set Jaccard. */
  def verifiedSql(k: Int = 64, bands: Int = 16, estThreshold: Double = 0.35,
                  exactThreshold: Double = 0.7, bucketCap: Int = 1000): String =
    s"""WITH ${pipeline(k, bands, bucketCap)},
       |dtoks AS (SELECT doc_id,
       |  list_distinct(list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0)) AS toks
       |  FROM documents),
       |ver AS (SELECT e.a_id, e.b_id,
       |  CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) /
       |    CAST(len(list_distinct(ta.toks || tb.toks)) AS DOUBLE) AS jaccard
       |  FROM est e
       |  JOIN dtoks ta ON ta.doc_id = e.a_id
       |  JOIN dtoks tb ON tb.doc_id = e.b_id
       |  WHERE e.est_jaccard >= $estThreshold)
       |SELECT a_id, b_id, jaccard FROM ver WHERE jaccard >= $exactThreshold""".stripMargin

  /** Oracle for `Dedup.editVerified(documents)` — the same
    * signature/banding/est replica, decided by DuckDB's levenshtein
    * (byte-based; equal to Spark's codepoint count on the all-ASCII
    * testdata — asserted in DedupEditSpec) with the identical lossless
    * length prefilter and exact integer sim_permille arithmetic. */
  def editVerifiedSql(k: Int = 64, bands: Int = 16,
                      estThreshold: Double = 0.35, maxDist: Int = 60,
                      bucketCap: Int = 1000): String =
    s"""WITH ${pipeline(k, bands, bucketCap)},
       |editv AS (SELECT e.a_id, e.b_id,
       |  levenshtein(ta.text, tb.text) AS dist,
       |  greatest(len(ta.text), len(tb.text)) AS maxlen
       |  FROM est e
       |  JOIN documents ta ON ta.doc_id = e.a_id
       |  JOIN documents tb ON tb.doc_id = e.b_id
       |  WHERE e.est_jaccard >= $estThreshold
       |    AND abs(len(ta.text) - len(tb.text)) <= $maxDist)
       |SELECT a_id, b_id, dist,
       |  ((maxlen - dist) * 1000) // maxlen AS sim_permille
       |FROM editv WHERE dist <= $maxDist""".stripMargin

  /** Oracle for `Dedup.fuzzyDecontaminate(corpus = doc_id >= split,
    * bench = doc_id < split)` — the same signature/banding replica,
    * but candidates come from the CROSS bucket join (bench side ×
    * corpus side, no self-join, no bucket cap — the cross shape needs
    * none) and the decision is the exact distinct-token-set Jaccard. */
  def fuzzyDecontaminateSql(split: Long, k: Int = 64, bands: Int = 16,
                            estThreshold: Double = 0.35,
                            exactThreshold: Double = 0.5): String = {
    val r = k / bands
    val bandRows = (0 until bands).map { b =>
      s"($b, CAST('${java.lang.Long.toUnsignedString(0xcbf29ce484222325L ^ b)}' AS HUGEINT))"
    }.mkString(", ")
    s"""WITH ${sigStages(k)},
       |bands(b, bstart) AS (VALUES $bandRows),
       |bh AS (SELECT doc_id, b,
       |  list_reduce(list_prepend(any_value(bstart),
       |    list(CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M ELSE CAST(s AS HUGEINT) END ORDER BY j)),
       |    (h, c) -> ${fnvStep("h", "c")}) AS h
       |  FROM sig JOIN bands ON sig.j // $r = bands.b GROUP BY doc_id, b),
       |cand AS (SELECT DISTINCT y.doc_id AS doc_id, x.doc_id AS bench_id
       |  FROM bh x JOIN bh y ON x.b = y.b AND x.h = y.h
       |  WHERE x.doc_id < $split AND y.doc_id >= $split),
       |est AS (SELECT c.doc_id, c.bench_id,
       |  CAST(sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS DOUBLE) / $k AS est_jaccard
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_id
       |  JOIN sig sb ON sb.doc_id = c.bench_id AND sa.j = sb.j
       |  GROUP BY c.doc_id, c.bench_id),
       |dtoks AS (SELECT doc_id,
       |  list_distinct(list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0)) AS toks
       |  FROM documents),
       |ver AS (SELECT e.doc_id, e.bench_id, e.est_jaccard,
       |  CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) /
       |    CAST(len(list_distinct(ta.toks || tb.toks)) AS DOUBLE) AS jaccard
       |  FROM est e
       |  JOIN dtoks ta ON ta.doc_id = e.doc_id
       |  JOIN dtoks tb ON tb.doc_id = e.bench_id
       |  WHERE e.est_jaccard >= $estThreshold)
       |SELECT doc_id, bench_id, est_jaccard, jaccard
       |FROM ver WHERE jaccard >= $exactThreshold""".stripMargin
  }

  /** Oracle for `Dedup.hostOverlap(documents)` — host-level minhash
    * union (elementwise signed min across the host's docs: the
    * signature of a UNION of shingle sets) and per-lane equality
    * counts between host pairs. */
  def hostOverlapSql(k: Int = 64, minMatches: Int = 1,
                     docSrc: String = "documents"): String =
    s"""WITH ${sigStages(k, docSrc)},
       |hmap AS (SELECT DISTINCT doc_id, source AS host FROM $docSrc),
       |hsig AS (SELECT h.host, s.j, min(s.s) AS s
       |  FROM sig s JOIN hmap h ON s.doc_id = h.doc_id
       |  GROUP BY h.host, s.j),
       |pairs AS (SELECT a.host AS a_host, b.host AS b_host,
       |  CAST(count(*) AS BIGINT) AS matches
       |  FROM hsig a JOIN hsig b
       |    ON a.j = b.j AND a.s = b.s AND a.host < b.host
       |  GROUP BY a.host, b.host)
       |SELECT a_host, b_host, matches,
       |  matches * 1000 // $k AS est_permille
       |FROM pairs WHERE matches >= $minMatches""".stripMargin

  /** Oracle for `Dedup.thresholdSweep(documents)` — the full
    * signature/banding replica on the audit-restricted corpus, with
    * ground truth derived from the SAME sh3 gram-hash stage the
    * signatures minimize over (DISTINCT doc grams → shared-gram
    * equi-join intersection counts — a different formulation from the
    * engine's array crossJoin: pairs sharing zero grams never appear,
    * which the ≥ t·uni filter makes equivalent), all-integer
    * threshold tests, LEFT join against the banding candidates. */
  def thresholdSweepSql(auditMax: Long = 800L,
                        thresholds: Seq[Int] = Seq(200, 350, 500, 650, 800),
                        k: Int = 64, bands: Int = 16,
                        bucketCap: Int = 1000): String = {
    val tRows = thresholds.map(t => s"($t)").mkString(", ")
    s"""WITH ${pipeline(k, bands, bucketCap,
          s"(SELECT * FROM documents WHERE doc_id < $auditMax)")},
       |gs AS (SELECT DISTINCT doc_id, h FROM sh3),
       |gn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |       FROM gs GROUP BY doc_id),
       |tp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |         CAST(count(*) AS BIGINT) AS inter
       |       FROM gs a JOIN gs b ON a.h = b.h AND a.doc_id < b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |tr AS (SELECT tp.a_id, tp.b_id, tp.inter,
       |         na.n + nb.n - tp.inter AS uni
       |       FROM tp JOIN gn na ON na.doc_id = tp.a_id
       |       JOIN gn nb ON nb.doc_id = tp.b_id
       |       WHERE tp.inter * 1000 >= (na.n + nb.n - tp.inter) * ${thresholds.min}),
       |fl AS (SELECT tr.inter, tr.uni,
       |         CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END AS caught
       |       FROM tr LEFT JOIN cand c
       |         ON c.a_id = tr.a_id AND c.b_id = tr.b_id),
       |ths(t) AS (VALUES $tRows)
       |SELECT CAST(t AS BIGINT) AS t_permille,
       |  CAST(count(*) AS BIGINT) AS n_truth,
       |  CAST(sum(caught) AS BIGINT) AS n_caught,
       |  CAST(sum(caught) * 1000 // count(*) AS BIGINT) AS recall_permille
       |FROM ths, fl WHERE inter * 1000 >= uni * t
       |GROUP BY t""".stripMargin
  }
}
