package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (gear hash) + cross-document chunk dedup
  * census — the STORAGE-level dedup family (Ddelta/FastCDC lineage),
  * complementary to the shingle/minhash detectors: a crawl re-fetches
  * the same page shell snapshot after snapshot, and chunk-level
  * dedup is how a 100 TB warc store becomes 20 TB on disk. Boundaries
  * are content-defined, so an insertion early in a page re-synchronizes
  * within one chunk instead of shifting every fixed-size block.
  *
  * Exact contract (both engines compute it bit-identically):
  *  - gear value of a character = splitmix64-finalizer(code point)
  *    ([[Dedup.mix64]] — the repo's cross-verified mixer);
  *  - rolling hash h_i = (h_{i-1} << 1) + gear(c_i) mod 2^64 — the
  *    shift ages a character out after 64 positions, so h_i is a pure
  *    function of the trailing 64-char window (this windowed-sum form
  *    is what the oracle computes directly, no per-position recursion);
  *  - position i is a cut CANDIDATE iff h_i ≡ 0 (mod 2^maskBits) —
  *    candidates are chunking-independent, which is what makes the
  *    min/max-length pass replayable;
  *  - a chunk starting at s ends at the first candidate ≥ s+minLen−1,
  *    forced at s+maxLen−1, and always at the document end;
  *  - chunk fingerprint = splitmix64(FNV-1a-64(chunk chars)) — the
  *    repo's standard content hash, signed-64 in the output.
  *
  * Scale shape: the chunker is one stateless per-row kernel pass
  * (mapPartitions — per-row imperative logic, the documented case);
  * the census is one partial-aggregated shuffle keyed on fingerprint.
  * Nothing is quadratic and no driver state exists, so the pipeline
  * is snapshot-count-proof: N copies of a page cost N kernel passes
  * and ONE census row. */
object Cdc {

  /** One document's chunks: (doc_id, chunk_idx, start, len, fp).
    * Static method — a closure calling a LOCAL def would drag the
    * enclosing frame into the lambda (the serialization lesson). */
  private[ops] def chunkOne(id: Long, text: String, minLen: Int, maxLen: Int,
                            mask: Long): Iterator[(Long, Long, Long, Long, Long)] = {
    val n = text.length
    if (n == 0) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var h = 0L
    var start = 0
    var idx = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Dedup.mix64(text.charAt(i).toLong)
      val len = i - start + 1
      if (i == n - 1 || (len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        val fp = Dedup.mix64(Dedup.hash64(text, start, i + 1))
        out += ((id, idx, start.toLong, len.toLong, fp))
        idx += 1
        start = i + 1
      }
      i += 1
    }
    out.iterator
  }

  /** Gear-CDC chunk table over `docs(doc_id, text)`. */
  def chunks(docs: DataFrame, minLen: Int = 16, maxLen: Int = 128,
             maskBits: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mask = (1L << maskBits) - 1L
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) => chunkOne(id, t, minLen, maxLen, mask) })
      .toDF("doc_id", "chunk_idx", "start", "chunk_len", "fp")
  }

  /** Cross-document dedup census: every fingerprint stored more than
    * once, with the byte count a chunk store would save. One
    * map-side-combined aggregation on fp. */
  def dedupCensus(docs: DataFrame, minLen: Int = 16, maxLen: Int = 128,
                  maskBits: Int = 5): DataFrame =
    chunks(docs, minLen, maxLen, maskBits)
      .groupBy(col("fp"))
      .agg(min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") > 1)
      .select(col("fp"), col("chunk_len"), col("n_copies"), col("n_docs"),
        ((col("n_copies") - 1) * col("chunk_len")).as("dup_bytes"))

  /** Incremental chunk-store cost of a NEW snapshot against the
    * store built from the previous one — what ingesting crawl N+1
    * actually writes to disk when the store dedups at chunk
    * granularity. Because boundaries are content-defined, a doc that
    * only APPENDED content re-uses every chunk before the last
    * boundary and stores ~one new chunk; fixed-size blocks would
    * re-store nothing less than the whole tail after any shift.
    *
    * Per `source` (host): total chunk references and bytes in the new
    * snapshot; references to fps absent from the store (n_new_refs /
    * new_ref_bytes); and the DISTINCT new fps the store must actually
    * write, attributed to the source owning each fp's canonical first
    * occurrence (min (doc_id, chunk_idx) — the packed-min-witness
    * trick), so stored_chunks/stored_bytes sum globally with no
    * double count.
    *
    * Scale shape: in production the store's fp set is a maintained
    * side table (the incremental-LSH pattern) — per increment: one
    * chunker kernel pass over the NEW snapshot, ONE fp-keyed join
    * against the store, ids-only rollups. Nothing re-chunks the
    * store. */
  def storeDelta(prev: DataFrame, cur: DataFrame,
                 minLen: Int = 16, maxLen: Int = 128,
                 maskBits: Int = 5): DataFrame = {
    val store = chunks(prev, minLen, maxLen, maskBits)
      .select(col("fp")).distinct().withColumn("in_store", lit(1L))
    val src = cur.select(col("doc_id").cast("long").as("doc_id"),
      col("source"))
    val marked = chunks(cur, minLen, maxLen, maskBits)
      .join(store, Seq("fp"), "left")
      .withColumn("is_new", col("in_store").isNull)
    val refs = marked.join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_refs"),
        sum(col("chunk_len")).as("ref_bytes"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new_refs"),
        sum(when(col("is_new"), col("chunk_len")).otherwise(0L))
          .as("new_ref_bytes"))
    val owned = marked.filter(col("is_new"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id") * lit(1048576L) + col("chunk_idx")).as("packed"),
        min(col("chunk_len")).as("chunk_len"))
      .select(expr("packed div 1048576").as("doc_id"), col("chunk_len"))
      .join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("stored_chunks"),
        sum(col("chunk_len")).as("stored_bytes"))
    refs.join(owned, Seq("source"), "left")
      .select(col("source"), col("n_refs"), col("ref_bytes"),
        col("n_new_refs"), col("new_ref_bytes"),
        coalesce(col("stored_chunks"), lit(0L)).as("stored_chunks"),
        coalesce(col("stored_bytes"), lit(0L)).as("stored_bytes"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle (HUGEINT mod-2^64 replay)
  // ------------------------------------------------------------------

  private val M = "18446744073709551616"
  private val FNV_OFF = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
  private val SM1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
  private val SM2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
  private val SM3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)

  /** splitmix64 finalizer of expression `z0` (already the raw input;
    * the +SM1 increment is applied here). */
  private def smix(z0: String): String = {
    val sm = { (z: String, sh: Int, mul: String) =>
      SimhashOracle.mulmod(SimhashOracle.xor64(z, s"($z) // ${1L << sh}"), mul) }
    val z1 = s"((($z0) + $SM1) % $M)"
    val z2 = sm(z1, 30, SM2)
    val z3 = sm(z2, 27, SM3)
    SimhashOracle.xor64(z3, s"($z3) // ${1L << 31}")
  }

  private def fnvList(chars: String): String =
    s"list_reduce(list_prepend(CAST($FNV_OFF AS HUGEINT), " +
      s"list_transform(split($chars, ''), x -> CAST(unicode(x) AS HUGEINT))), " +
      s"(h, c) -> ${SimhashOracle.mulmod(SimhashOracle.xor64("h", "c"), "1099511628211")})"

  /** WITH-body stages ending in `${x}ch(doc_id, chunk_idx, start, len, fp)`
    * (fp still unsigned HUGEINT). The rolling hash is restated as the
    * 64-term windowed sum Σ gear(c_{i−d})·2^d — mathematically equal to
    * the engine's shift-and-add because (h<<1) mod 2^64 drops a
    * character's contribution after 64 shifts. `docSrc` is any
    * (doc_id, text) relation; `x` prefixes every stage name so two
    * snapshot pipelines coexist in one WITH RECURSIVE. */
  private[ops] def chunkStages(minLen: Int, maxLen: Int, maskBits: Int,
                               docSrc: String = "SELECT doc_id, text FROM documents",
                               x: String = ""): String =
    s"""${x}docn AS (SELECT doc_id, len(text) AS n FROM ($docSrc) WHERE len(text) > 0),
       |${x}pos AS MATERIALIZED (
       |  SELECT doc_id, len(text) AS n, text,
       |    unnest(generate_series(1, len(text))) AS i1
       |  FROM ($docSrc) WHERE len(text) > 0),
       |${x}cc AS MATERIALIZED (
       |  SELECT doc_id, n, i1 - 1 AS i,
       |    ${smix("CAST(unicode(text[CAST(i1 AS INT)]) AS HUGEINT)")} AS g
       |  FROM ${x}pos),
       |${x}pow2(d, v) AS (
       |  SELECT 0, CAST(1 AS HUGEINT)
       |  UNION ALL SELECT d + 1, (v * 2) % $M FROM ${x}pow2 WHERE d < 63),
       |${x}hh AS MATERIALIZED (
       |  SELECT a.doc_id, a.n, a.i,
       |    CAST(sum((b.g * p.v) % $M) % $M AS HUGEINT) AS h
       |  FROM ${x}cc a
       |  JOIN ${x}cc b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i - 63 AND a.i
       |  JOIN ${x}pow2 p ON p.d = a.i - b.i
       |  GROUP BY 1, 2, 3),
       |${x}nc AS MATERIALIZED (
       |  SELECT doc_id, n, i,
       |    min(CASE WHEN h % ${1L << maskBits} = 0 THEN i END)
       |      OVER (PARTITION BY doc_id ORDER BY i DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nxt
       |  FROM ${x}hh),
       |${x}rec(doc_id, n, chunk_idx, start) AS (
       |  SELECT doc_id, n, 0, CAST(0 AS BIGINT) FROM ${x}docn
       |  UNION ALL
       |  SELECT doc_id, n, chunk_idx + 1, bend + 1 FROM (
       |    SELECT r.doc_id, r.n, r.chunk_idx,
       |      CASE WHEN r.start + $minLen - 1 > r.n - 1 THEN r.n - 1
       |           WHEN p.nxt IS NOT NULL AND p.nxt <= r.start + $maxLen - 1 THEN p.nxt
       |           ELSE least(r.start + $maxLen - 1, r.n - 1) END AS bend
       |    FROM ${x}rec r LEFT JOIN ${x}nc p
       |      ON p.doc_id = r.doc_id AND p.i = r.start + $minLen - 1)
       |  WHERE bend + 1 < n),
       |${x}bounds AS MATERIALIZED (
       |  SELECT r.doc_id, r.chunk_idx, r.start,
       |    CASE WHEN r.start + $minLen - 1 > r.n - 1 THEN r.n - 1
       |         WHEN p.nxt IS NOT NULL AND p.nxt <= r.start + $maxLen - 1 THEN p.nxt
       |         ELSE least(r.start + $maxLen - 1, r.n - 1) END AS bend
       |  FROM ${x}rec r LEFT JOIN ${x}nc p
       |    ON p.doc_id = r.doc_id AND p.i = r.start + $minLen - 1),
       |${x}ch AS MATERIALIZED (
       |  SELECT b.doc_id, b.chunk_idx, b.start, b.bend - b.start + 1 AS len,
       |    ${smix(fnvList("substr(d.text, CAST(b.start AS INT) + 1, CAST(b.bend - b.start AS INT) + 1)"))} AS fpu
       |  FROM ${x}bounds b JOIN ($docSrc) d ON d.doc_id = b.doc_id)""".stripMargin

  private def signed(x: String): String =
    s"CAST(CASE WHEN ($x) >= ${BigInt(1) << 63} THEN ($x) - $M ELSE ($x) END AS BIGINT)"

  /** Oracle for [[chunks]]. */
  def chunksOracleSql(minLen: Int = 16, maxLen: Int = 128, maskBits: Int = 5): String =
    s"""WITH RECURSIVE ${chunkStages(minLen, maxLen, maskBits)}
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(start AS BIGINT) AS start, CAST(len AS BIGINT) AS chunk_len,
       |  ${signed("fpu")} AS fp
       |FROM ch""".stripMargin

  /** Oracle for [[storeDelta]]: two full prefixed chunk pipelines
    * (prev store + new snapshot), the fp anti-membership mark, and the
    * same packed-min ownership attribution. `prevSql`/`curSql` are
    * (doc_id, source, text) relations. */
  def storeDeltaOracleSql(prevSql: String, curSql: String,
                          minLen: Int = 16, maxLen: Int = 128,
                          maskBits: Int = 5): String =
    s"""WITH RECURSIVE ${chunkStages(minLen, maxLen, maskBits,
      s"SELECT doc_id, text FROM ($prevSql)", "p_")},
       |${chunkStages(minLen, maxLen, maskBits,
      s"SELECT doc_id, text FROM ($curSql)", "c_")},
       |store AS (SELECT DISTINCT fpu FROM p_ch),
       |marked AS (SELECT c.doc_id, c.chunk_idx, c.len, c.fpu,
       |    (s.fpu IS NULL) AS is_new
       |  FROM c_ch c LEFT JOIN store s ON s.fpu = c.fpu),
       |src AS (SELECT doc_id, source FROM ($curSql)),
       |refs AS (SELECT s.source,
       |    CAST(count(*) AS BIGINT) AS n_refs,
       |    CAST(sum(m.len) AS BIGINT) AS ref_bytes,
       |    CAST(sum(CASE WHEN m.is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new_refs,
       |    CAST(sum(CASE WHEN m.is_new THEN m.len ELSE 0 END) AS BIGINT) AS new_ref_bytes
       |  FROM marked m JOIN src s ON s.doc_id = m.doc_id GROUP BY 1),
       |own AS (SELECT fpu, min(doc_id * 1048576 + chunk_idx) AS packed,
       |    min(len) AS len
       |  FROM marked WHERE is_new GROUP BY 1),
       |owned AS (SELECT s.source,
       |    CAST(count(*) AS BIGINT) AS stored_chunks,
       |    CAST(sum(o.len) AS BIGINT) AS stored_bytes
       |  FROM own o JOIN src s ON s.doc_id = o.packed // 1048576 GROUP BY 1)
       |SELECT r.source, r.n_refs, r.ref_bytes, r.n_new_refs, r.new_ref_bytes,
       |  CAST(coalesce(o.stored_chunks, 0) AS BIGINT) AS stored_chunks,
       |  CAST(coalesce(o.stored_bytes, 0) AS BIGINT) AS stored_bytes
       |FROM refs r LEFT JOIN owned o ON o.source = r.source""".stripMargin

  /** Oracle for [[dedupCensus]]. */
  def censusOracleSql(minLen: Int = 16, maxLen: Int = 128, maskBits: Int = 5): String =
    s"""WITH RECURSIVE ${chunkStages(minLen, maxLen, maskBits)}
       |SELECT ${signed("fpu")} AS fp,
       |  CAST(min(len) AS BIGINT) AS chunk_len,
       |  CAST(count(*) AS BIGINT) AS n_copies,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST((count(*) - 1) * min(len) AS BIGINT) AS dup_bytes
       |FROM ch GROUP BY 1 HAVING count(*) > 1""".stripMargin
}
