package graft.ops

/** DuckDB replication of the random-hyperplane LSH pipelines
  * ([[Similarity.nearDupPairsLsh]] and [[Similarity.lshTopK]]), so the
  * last two rows-only driver queries (`dedup_embedding`, `ann_lsh`)
  * get REAL hash-checked oracles.
  *
  * Why this is exactly replicable: every float the engine produces is
  * IEEE-754 double arithmetic over deterministic inputs —
  *  - hyperplane components are a splitmix64-style mix of
  *    (seed + bit·φ + d·SM2), converted via signed Long→double and
  *    divided by Long.MaxValue ([[Similarity.hyperplane]]); the SQL
  *    reproduces the mod-2^64 integer math (HUGEINT, 32-bit-split
  *    mulmod — [[SimhashOracle]] helpers) and the same two casts;
  *  - dot products / norms accumulate LEFT-TO-RIGHT over d (both the
  *    signature kernel and the exact-cosine re-check), which SQL
  *    mirrors with an ordered `list(...)`/`generate_series` fold —
  *    correctly-rounded IEEE ops in the same order are bit-identical
  *    across engines, so every sign bit and every `>= threshold` /
  *    rank decision agrees;
  *  - bucket join / cap / distinct / row_number are plain relational.
  *
  * Outputs are integer-only (id pairs; query/neighbor/rank), so the
  * driver hash compare is over exact values end-to-end.
  */
object EmbeddingOracle {
  import SimhashOracle.{mulmod, xor64}

  private val M = BigInt(1) << 64
  private val SM1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
  private val SM2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
  private val SM3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)

  /** Left-fold dot product of two float-list expressions in element
    * order (matches the engine kernels' accumulation order). */
  private def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(x, y) -> x + y)"

  private def cos(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** WITH stages ending in `sigs(vec_id, t, sig)` — the oracle for
    * [[Similarity.lshSignatures]] over table `embeddings`. */
  private def sigStages(nBits: Int, nTables: Int, dim: Int): String =
    s"""grid AS (
       |  SELECT t.g AS t, b.g AS bit, d.g AS d
       |  FROM generate_series(0, ${nTables - 1}) t(g), generate_series(0, ${nBits - 1}) b(g), generate_series(0, ${dim - 1}) d(g)),
       |hp0 AS (SELECT t, bit, d,
       |  (CAST(42 AS HUGEINT) + t * 1000003 + (bit * CAST($SM1 AS HUGEINT)) % $M + (d * CAST($SM2 AS HUGEINT)) % $M) % $M AS z
       |  FROM grid),
       |hp1 AS (SELECT t, bit, d, ${mulmod(xor64("z", s"z // ${1L << 30}"), SM2)} AS z FROM hp0),
       |hp2 AS (SELECT t, bit, d, ${mulmod(xor64("z", s"z // ${1L << 27}"), SM3)} AS z FROM hp1),
       |hp3 AS (SELECT t, bit, d, ${xor64("z", s"z // ${1L << 31}")} AS z FROM hp2),
       |hp AS (SELECT t, bit, d,
       |  CAST(CASE WHEN z >= ${BigInt(1) << 63} THEN z - $M ELSE z END AS DOUBLE) / 9223372036854775807.0 AS h
       |  FROM hp3),
       |prods AS (
       |  SELECT e.vec_id, h.t, h.bit, h.d, CAST(e.embedding[h.d + 1] AS DOUBLE) * h.h AS p
       |  FROM embeddings e, hp h),
       |dots AS (
       |  SELECT vec_id, t, bit,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY d)), (a, x) -> a + x) AS dot
       |  FROM prods GROUP BY vec_id, t, bit),
       |sigs AS (
       |  SELECT vec_id, t, sum(CASE WHEN dot >= 0 THEN 1 << bit ELSE 0 END) AS sig
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  /** Oracle for `Similarity.nearDupPairsLsh(embeddings, 0.45)`. */
  def nearDupSql(threshold: Double = 0.45, nBits: Int = 6, nTables: Int = 24,
                 dim: Int = 64, bucketCap: Int = 2000): String =
    s"""WITH ${sigStages(nBits, nTables, dim)},
       |capped AS (SELECT * FROM (
       |  SELECT vec_id, t, sig, count(*) OVER (PARTITION BY t, sig) AS bsz FROM sigs) WHERE bsz <= $bucketCap),
       |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM capped x JOIN capped y ON x.t = y.t AND x.sig = y.sig AND x.vec_id < y.vec_id),
       |pairs AS (SELECT c.a_id, c.b_id, ea.embedding AS av, eb.embedding AS bv
       |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.a_id JOIN embeddings eb ON eb.vec_id = c.b_id)
       |SELECT a_id, b_id FROM pairs
       |WHERE ${cos("av", "bv")} >= CAST($threshold AS DOUBLE)""".stripMargin

  /** Oracle for `Similarity.ivfTopK(emb, emb.filter(vec_id < 10), k)`:
    * replays the deterministic centroid stream (splitmix64 mix, seed
    * base 1299709 + cell·7919, bit fixed at 0), the per-(vec, cell)
    * cosine with ordered folds, the (cos DESC, cell ASC) cell ranking
    * (take-1 assignment / take-nProbe probes), the cell equi-join, and
    * the exact-cosine top-k re-rank — every decision the engine makes,
    * in the same IEEE order. */
  def ivfSql(k: Int = 5, nCells: Int = 16, nProbe: Int = 4, dim: Int = 64): String =
    s"""WITH cgrid AS (
       |  SELECT c.g AS cell, d.g AS d
       |  FROM generate_series(0, ${nCells - 1}) c(g), generate_series(0, ${dim - 1}) d(g)),
       |ch0 AS (SELECT cell, d,
       |  (CAST(1299709 AS HUGEINT) + cell * 7919 + (d * CAST($SM2 AS HUGEINT)) % $M) % $M AS z
       |  FROM cgrid),
       |ch1 AS (SELECT cell, d, ${mulmod(xor64("z", s"z // ${1L << 30}"), SM2)} AS z FROM ch0),
       |ch2 AS (SELECT cell, d, ${mulmod(xor64("z", s"z // ${1L << 27}"), SM3)} AS z FROM ch1),
       |ch3 AS (SELECT cell, d, ${xor64("z", s"z // ${1L << 31}")} AS z FROM ch2),
       |chp AS (SELECT cell, d,
       |  CAST(CASE WHEN z >= ${BigInt(1) << 63} THEN z - $M ELSE z END AS DOUBLE) / 9223372036854775807.0 AS h
       |  FROM ch3),
       |cn AS (SELECT cell,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list(h * h ORDER BY d)), (a, x) -> a + x) AS cn2
       |  FROM chp GROUP BY cell),
       |vn AS (SELECT e.vec_id, ${dot("e.embedding", "e.embedding")} AS vn2 FROM embeddings e),
       |cprods AS (
       |  SELECT e.vec_id, h.cell, h.d, CAST(e.embedding[h.d + 1] AS DOUBLE) * h.h AS p
       |  FROM embeddings e, chp h),
       |cdots AS (
       |  SELECT vec_id, cell,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY d)), (a, x) -> a + x) AS dot
       |  FROM cprods GROUP BY vec_id, cell),
       |cscored AS (
       |  SELECT t.vec_id, t.cell, t.dot / (sqrt(v.vn2) * sqrt(c.cn2)) AS ccos
       |  FROM cdots t JOIN vn v USING (vec_id) JOIN cn c USING (cell)),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscored) WHERE r = 1),
       |probes AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS r
       |  FROM cscored WHERE vec_id < 10) WHERE r <= $nProbe),
       |cand AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM probes q JOIN assign a ON a.cell = q.cell AND a.vec_id <> q.vec_id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |  ${cos("eq.embedding", "en.embedding")} AS cos
       |  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id JOIN embeddings en ON en.vec_id = c.neighbor_id)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin

  /** Oracle for `Similarity.sq8TopK(emb, emb.filter(vec_id < 10), k)` —
    * replays the whole SQ8 pipeline: FLOAT per-dim max-abs, the
    * floor(x·127/m) symmetric clamp in the identical IEEE step order,
    * the quantized-cosine candidate cut (exact integer dot/norms, one
    * sqrt + one division of exactly-representable doubles) under
    * (score DESC, id ASC), and the ordered-fold exact-cosine re-rank. */
  def sq8Sql(k: Int = 5, candidates: Int = 20, dim: Int = 64): String =
    s"""WITH rng AS (
       |  SELECT d.g AS d, max(abs(e.embedding[d.g + 1])) AS m
       |  FROM embeddings e, generate_series(0, ${dim - 1}) d(g) GROUP BY d.g),
       |codes AS (
       |  SELECT e.vec_id, r.d,
       |    CASE WHEN r.m = 0 THEN 0
       |         ELSE least(127, greatest(-127, CAST(floor(
       |           CAST(e.embedding[r.d + 1] AS DOUBLE) * 127.0 / CAST(r.m AS DOUBLE)) AS BIGINT)))
       |    END AS q
       |  FROM embeddings e, rng r),
       |norms AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM codes GROUP BY vec_id),
       |idots AS (
       |  SELECT cq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    CAST(sum(cq.q * cc.q) AS BIGINT) AS idot
       |  FROM codes cq JOIN codes cc ON cq.d = cc.d
       |  WHERE cq.vec_id < 10 AND cq.vec_id <> cc.vec_id
       |  GROUP BY 1, 2),
       |iscore AS (
       |  SELECT i.query_id, i.neighbor_id,
       |    CASE WHEN nq.n2 = 0 OR nc.n2 = 0 THEN -2.0
       |         ELSE CAST(i.idot AS DOUBLE) / sqrt(CAST(nq.n2 * nc.n2 AS DOUBLE))
       |    END AS score
       |  FROM idots i
       |  JOIN norms nq ON nq.vec_id = i.query_id
       |  JOIN norms nc ON nc.vec_id = i.neighbor_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS r
       |  FROM iscore) WHERE r <= $candidates),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |  ${cos("eq.embedding", "en.embedding")} AS cos
       |  FROM cand c
       |  JOIN embeddings eq ON eq.vec_id = c.query_id
       |  JOIN embeddings en ON en.vec_id = c.neighbor_id)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin

  /** Oracle for `Similarity.kmeansSq8(emb, k, iters)` — the integer
    * Lloyd rounds UNROLLED as chained MATERIALIZED CTEs (the kcore
    * lesson: stages referenced more than once explode without AS
    * MATERIALIZED). Quantization reuses the sq8 rng/codes shape;
    * assignment ties replay the engine's keep-lowest-centroid rule via
    * row_number (d2 ASC, c ASC); centroid update = floor(sum/n) — the
    * same one IEEE division + floor; empty clusters COALESCE back to
    * the previous round's centroid. */
  def kmeansSql(k: Int = 8, iters: Int = 3, dim: Int = 64): String =
    s"""WITH ${kmeansStages(k, iters, dim)}
       |sink AS (SELECT 1)
       |SELECT vec_id, c AS cluster, d2 AS dist2 FROM b$iters WHERE rn = 1""".stripMargin

  /** WITH-body stages for the integer Lloyd unroll, ending at
    * `b$iters` (per-vec distances + rn=1 assignment) with a TRAILING
    * COMMA — the caller appends its own final stage. Shared by
    * [[kmeansSql]] and [[semanticSql]]. */
  private def kmeansStages(k: Int, iters: Int, dim: Int): String = {
    val rounds = new StringBuilder
    var prev = "cent0"
    for (i <- 1 to iters) {
      rounds.append(
        s"""a$i AS MATERIALIZED (
           |  SELECT co.vec_id, ce.c, CAST(sum((co.q - ce.q) * (co.q - ce.q)) AS BIGINT) AS d2
           |  FROM codes co JOIN $prev ce ON co.d = ce.d GROUP BY 1, 2),
           |b$i AS MATERIALIZED (
           |  SELECT vec_id, c, d2,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
           |  FROM a$i),
           |""".stripMargin)
      if (i < iters) {
        rounds.append(
          s"""u$i AS (
             |  SELECT w.c, co.d,
             |    CAST(floor(CAST(sum(co.q) AS DOUBLE) / count(*)) AS BIGINT) AS q
             |  FROM (SELECT vec_id, c FROM b$i WHERE rn = 1) w
             |  JOIN codes co ON co.vec_id = w.vec_id GROUP BY 1, 2),
             |cent$i AS MATERIALIZED (
             |  SELECT p.c, p.d, COALESCE(u.q, p.q) AS q
             |  FROM $prev p LEFT JOIN u$i u ON u.c = p.c AND u.d = p.d),
             |""".stripMargin)
        prev = s"cent$i"
      }
    }
    s"""rng AS (
       |  SELECT d.g AS d, max(abs(e.embedding[d.g + 1])) AS m
       |  FROM embeddings e, generate_series(0, ${dim - 1}) d(g) GROUP BY d.g),
       |codes AS MATERIALIZED (
       |  SELECT e.vec_id, r.d,
       |    CASE WHEN r.m = 0 THEN 0
       |         ELSE least(127, greatest(-127, CAST(floor(
       |           CAST(e.embedding[r.d + 1] AS DOUBLE) * 127.0 / CAST(r.m AS DOUBLE)) AS BIGINT)))
       |    END AS q
       |  FROM embeddings e, rng r),
       |seeds AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
       |cent0 AS MATERIALIZED (
       |  SELECT s.c, co.d, co.q FROM seeds s JOIN codes co ON co.vec_id = s.vec_id),
       |${rounds.toString}""".stripMargin
  }

  /** Oracle for `Similarity.semanticDedup(emb, k, iters, threshold)`
    * — SemDeDup restated: the Lloyd assignment stages, within-cluster
    * pairs over the exact ordered-fold cosine, recursive reachability
    * closure, min-id representative (the dedup_survivors pattern). */
  def semanticSql(k: Int = 8, iters: Int = 3, dim: Int = 64,
                  threshold: Double = 0.45): String =
    s"""WITH RECURSIVE ${kmeansStages(k, iters, dim)}
       |assign AS MATERIALIZED (SELECT vec_id, c AS cluster FROM b$iters WHERE rn = 1),
       |pairs AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM assign a JOIN assign b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE ${cos("ea.embedding", "eb.embedding")} >= CAST($threshold AS DOUBLE)),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION SELECT b_id, a_id FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
       |SELECT a.vec_id, a.cluster, coalesce(c.rep, a.vec_id) AS rep_id
       |FROM assign a LEFT JOIN comp c ON c.id = a.vec_id""".stripMargin

  /** Oracle for `Similarity.pqTopK(emb, emb.filter(vec_id < 10), ...)`
    * — the kmeans Lloyd unroll generalized to per-subspace codebooks:
    * every stage carries a `sub` key, assignment partitions by
    * (vec_id, sub), and the ADC distance is restated as a direct
    * sum over (sub, sd) of squared differences between the query's
    * codes and the ASSIGNED centroid (the engine's lookup table is
    * just this sum factored per subspace). Re-rank matches sq8Sql. */
  def pqSql(m: Int = 4, kCode: Int = 16, iters: Int = 2, k: Int = 5,
            candidates: Int = 20, dim: Int = 64): String = {
    val subDim = dim / m
    val rounds = new StringBuilder
    var prev = "cent0"
    for (i <- 1 to iters) {
      rounds.append(
        s"""a$i AS MATERIALIZED (
           |  SELECT co.vec_id, co.sub, ce.c,
           |    CAST(sum((co.q - ce.q) * (co.q - ce.q)) AS BIGINT) AS d2
           |  FROM codes co JOIN $prev ce ON ce.sub = co.sub AND ce.sd = co.sd
           |  GROUP BY 1, 2, 3),
           |b$i AS MATERIALIZED (
           |  SELECT vec_id, sub, c,
           |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
           |  FROM a$i),
           |""".stripMargin)
      if (i < iters) {
        rounds.append(
          s"""u$i AS (
             |  SELECT w.sub, w.c, co.sd,
             |    CAST(floor(CAST(sum(co.q) AS DOUBLE) / count(*)) AS BIGINT) AS q
             |  FROM (SELECT vec_id, sub, c FROM b$i WHERE rn = 1) w
             |  JOIN codes co ON co.vec_id = w.vec_id AND co.sub = w.sub
             |  GROUP BY 1, 2, 3),
             |cent$i AS MATERIALIZED (
             |  SELECT p.sub, p.c, p.sd, COALESCE(u.q, p.q) AS q
             |  FROM $prev p LEFT JOIN u$i u
             |    ON u.sub = p.sub AND u.c = p.c AND u.sd = p.sd),
             |""".stripMargin)
        prev = s"cent$i"
      }
    }
    s"""WITH rng AS (
       |  SELECT d.g AS d, max(abs(e.embedding[d.g + 1])) AS m
       |  FROM embeddings e, generate_series(0, ${dim - 1}) d(g) GROUP BY d.g),
       |codes AS MATERIALIZED (
       |  SELECT e.vec_id, r.d, r.d // $subDim AS sub, r.d % $subDim AS sd,
       |    CASE WHEN r.m = 0 THEN 0
       |         ELSE least(127, greatest(-127, CAST(floor(
       |           CAST(e.embedding[r.d + 1] AS DOUBLE) * 127.0 / CAST(r.m AS DOUBLE)) AS BIGINT)))
       |    END AS q
       |  FROM embeddings e, rng r),
       |seeds AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $kCode)),
       |cent0 AS MATERIALIZED (
       |  SELECT co.sub, s.c, co.sd, co.q
       |  FROM seeds s JOIN codes co ON co.vec_id = s.vec_id),
       |${rounds.toString}
       |enc AS MATERIALIZED (SELECT vec_id, sub, c FROM b$iters WHERE rn = 1),
       |adc AS (
       |  SELECT cq.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    CAST(sum((cq.q - ce.q) * (cq.q - ce.q)) AS BIGINT) AS adc
       |  FROM enc e
       |  JOIN $prev ce ON ce.sub = e.sub AND ce.c = e.c
       |  JOIN codes cq ON cq.sub = ce.sub AND cq.sd = ce.sd
       |  WHERE cq.vec_id < 10 AND cq.vec_id <> e.vec_id
       |  GROUP BY 1, 2),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id ASC) AS r
       |  FROM adc) WHERE r <= $candidates),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |  ${cos("eq.embedding", "en.embedding")} AS cos
       |  FROM cand c
       |  JOIN embeddings eq ON eq.vec_id = c.query_id
       |  JOIN embeddings en ON en.vec_id = c.neighbor_id)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin
  }

  /** Oracle for `Similarity.lshTopK(emb, emb.filter(vec_id < 10), k, 64)`. */
  def annSql(k: Int = 5, nBits: Int = 12, nTables: Int = 4, dim: Int = 64): String =
    s"""WITH ${sigStages(nBits, nTables, dim)},
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sigs c JOIN sigs q ON c.t = q.t AND c.sig = q.sig
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |  ${cos("eq.embedding", "en.embedding")} AS cos
       |  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id JOIN embeddings en ON en.vec_id = c.neighbor_id)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin

  /** Oracle for `Similarity.hardNegatives(emb, anchorMax, floor,
    * ceil)` — every band decision and argmax re-derived with the
    * ordered-fold cosine (identical accumulation order to the engine
    * kernel). The native `list_cosine_similarity` appears ONLY as an
    * epsilon-slack prefilter (±1e-9 around the band, vs ulp-level
    * native/fold divergence) that bounds how many pairs pay the
    * interpreted fold — it decides nothing. */
  def hardNegSql(anchorMax: Long = 200L, floor: Double = 0.3,
                 ceil: Double = 0.9): String =
    s"""WITH vn AS (SELECT e.vec_id, ${dot("e.embedding", "e.embedding")} AS n2
       |  FROM embeddings e),
       |pre AS (SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
       |    a.embedding AS av, b.embedding AS bv
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id < $anchorMax AND b.vec_id <> a.vec_id
       |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |      CAST(b.embedding AS DOUBLE[]))
       |    BETWEEN CAST($floor AS DOUBLE) - 1e-9
       |        AND CAST($ceil AS DOUBLE) + 1e-9),
       |sc AS (SELECT p.anchor_id, p.neg_id,
       |    ${dot("p.av", "p.bv")} / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
       |  FROM pre p JOIN vn na ON na.vec_id = p.anchor_id
       |  JOIN vn nb ON nb.vec_id = p.neg_id),
       |band AS (SELECT * FROM sc
       |  WHERE cos >= CAST($floor AS DOUBLE) AND cos < CAST($ceil AS DOUBLE))
       |SELECT anchor_id, neg_id, n_band FROM (
       |  SELECT anchor_id, neg_id,
       |    row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC, neg_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY anchor_id) AS n_band
       |  FROM band) WHERE rn = 1""".stripMargin

  /** Exact brute-force top-k ground truth — the same statement the
    * pinned `ann_bruteforce` driver row uses (native
    * list_cosine_similarity ordering, which that pin already proves
    * agrees with the engine's left-fold kernel on this corpus). */
  def bruteSql(k: Int = 5): String =
    s"""SELECT query_id, neighbor_id, rn AS rank FROM (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  row_number() OVER (PARTITION BY q.vec_id
       |   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |            CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rn
       | FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
       |) WHERE rn <= $k""".stripMargin

  /** Oracle for [[graft.ops.Similarity.annRecall]]: each approximate
    * pipeline's FULL oracle runs as a scoped subquery (their CTE names
    * never clash — parenthesized WITH is its own scope), LEFT-joined
    * against the shared brute-force truth CTE, collapsed to one row
    * per method, with the bf self-join control row. Assembled by plain
    * concatenation — every component is already stripMargin'd (the
    * `||`-eating re-stripMargin trap from ROUND_NOTES). */
  def annRecallSql(k: Int = 5): String = {
    def arm(name: String, sql: String): String =
      s"SELECT '$name' AS method, count(*) AS n_returned, " +
        "coalesce(sum(hit), 0) AS n_hits FROM (" +
        "SELECT CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit " +
        s"FROM ($sql) a LEFT JOIN bf b ON a.query_id = b.query_id " +
        "AND a.neighbor_id = b.neighbor_id)"
    "WITH bf AS (" + bruteSql(k) + "),\nu AS (\n" +
      Seq(
        arm("bf", bruteSql(k)),
        arm("ivf", ivfSql(k)),
        arm("lsh", annSql(k)),
        arm("pq", pqSql(k = k)),
        arm("sq8", sq8Sql(k))).mkString("\nUNION ALL\n") +
      ")\nSELECT method, CAST(n_returned AS BIGINT) AS n_returned, " +
      "CAST(n_hits AS BIGINT) AS n_hits, " +
      "(SELECT CAST(count(*) AS BIGINT) FROM bf) AS n_truth, " +
      "CAST(n_hits * 1000 // (SELECT count(*) FROM bf) AS BIGINT) AS recall_permille " +
      "FROM u"
  }
}
