package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS algorithm): hash every positional k-gram, slide a window of
  * `w` consecutive hashes, and keep each window's RIGHTMOST minimum.
  * Guarantees: any shared run of w + k - 1 tokens between two docs
  * yields at least one shared selected fingerprint (the local-match
  * detector exact dedup misses and minhash only sees globally), and
  * selection density is ~2/(w+1) — a 60% reduction at w=4.
  *
  * This variant winnows TOKEN k-grams (the paper uses chars; the
  * token form is standard in corpus dedup) hashed by the corpus's
  * FNV-1a kernel, truncated to the top 40 unsigned bits so the
  * (hash, position) pair packs into ONE comparable long:
  * key = h40·2^20 + (2^20−1−pos). A single `min` over the forward
  * window then IS rightmost-argmin — smallest h40 wins, and among
  * equal h40 the LARGER position wins (its complement is smaller).
  * No struct-valued window buffer (which would de-optimize the
  * window sort) and bit-identical in DuckDB integer arithmetic.
  * Requires pos < 2^20 (~1M tokens/doc — chunk first beyond that);
  * docs with fewer than k tokens contribute nothing.
  *
  * Scale shape: one fused kernel pass (tokenize + slide + FNV) per
  * doc, ONE doc_id shuffle for the two window passes (forward min +
  * per-doc position count — same partitioning), then distinct. The
  * match stage is a fingerprint equi-join with a document-frequency
  * cap (HAVING df <= cap) — the stop-gram guard that keeps a
  * corpus-wide boilerplate gram from pairing everything with
  * everything (the LSH bucketCap lesson restated). */
object Winnow {

  private val W20 = 1048576L // 2^20 position space per doc

  /** Selected fingerprints: (doc_id, pos, h40), distinct. */
  def fingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 2, "need k >= 1, w >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          if (toks.length < k) Iterator.empty
          else {
            val n = toks.length - k + 1
            val sb = new java.lang.StringBuilder
            (1 to n).iterator.map { p =>
              sb.setLength(0)
              var j = 0
              while (j < k) {
                if (j > 0) sb.append(' ')
                sb.append(toks(p - 1 + j))
                j += 1
              }
              val g = sb.toString
              (id, p.toLong, Dedup.hash64(g, 0, g.length) >>> 24)
            }
          }
        }
      }.toDF("doc_id", "pos", "h40")
    val fwd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val perDoc = Window.partitionBy(col("doc_id"))
    grams
      .withColumn("k", col("h40") * W20 + (lit(W20 - 1) - col("pos")))
      .withColumn("mk", min(col("k")).over(fwd))
      .withColumn("np", max(col("pos")).over(perDoc))
      // one window per start position s = 1 .. max(1, n-w+1); the
      // final (possibly short) tail windows are covered by s = n-w+1
      .filter(col("pos") <= greatest(lit(1L), col("np") - (w - 1)))
      .select(col("doc_id"),
        (lit(W20 - 1) - expr(s"mk % $W20")).as("pos"),
        expr(s"mk div $W20").as("h40"))
      .distinct()
  }

  /** Local-overlap document pairs: docs sharing >= `minShared`
    * selected fingerprints, fingerprints present in more than
    * `docFreqCap` docs excluded first. Output (a_id, b_id, n_shared). */
  def matches(docs: DataFrame, k: Int = 3, w: Int = 4,
              docFreqCap: Long = 20L, minShared: Long = 2L): DataFrame = {
    val sel = fingerprints(docs, k, w)
      .select(col("doc_id"), col("h40")).distinct()
      .localCheckpoint(false) // feeds the df rollup AND both join sides
    val rare = sel.groupBy(col("h40"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= docFreqCap)
      .select(col("h40"))
    val sf = sel.join(rare, Seq("h40"))
    sf.select(col("h40"), col("doc_id").as("a_id"))
      .join(sf.select(col("h40"), col("doc_id").as("b_id")), Seq("h40"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB replica of [[matches]] over `documents` — per-position
    * FNV replay in HUGEINT, the same packed-key window min, the same
    * df cap and pair rollup. */
  def matchesOracleSql(k: Int = 3, w: Int = 4, docFreqCap: Long = 20L,
                       minShared: Long = 2L): String = {
    import SimhashOracle.{mulmod, xor64}
    val off = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
    val fnvStep = mulmod(xor64("h", "c"), "1099511628211")
    s"""WITH toks AS (
       | SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0) AS t
       | FROM documents),
       |n AS (SELECT doc_id, t, len(t) - ${k - 1} AS np FROM toks
       |      WHERE len(t) >= $k),
       |pos AS (SELECT doc_id, np, t, unnest(generate_series(1, np)) AS p FROM n),
       |gh AS (SELECT doc_id, np, p,
       |  list_reduce(list_prepend(CAST('$off' AS HUGEINT),
       |      list_transform(string_split(array_to_string(t[p:p+${k - 1}], ' '), ''),
       |        x -> CAST(unicode(x) AS HUGEINT))),
       |    (h, c) -> $fnvStep) AS h
       | FROM pos),
       |keyed AS (SELECT doc_id, np, p,
       |  CAST(h // 16777216 AS BIGINT) * $W20 + (${W20 - 1} - p) AS k
       | FROM gh),
       |wm AS (SELECT doc_id, np, p,
       |  min(k) OVER (PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mk
       | FROM keyed),
       |sel AS (SELECT DISTINCT doc_id, mk // $W20 AS h40 FROM wm
       |        WHERE p <= greatest(1, np - ${w - 1})),
       |rare AS (SELECT h40 FROM sel GROUP BY h40
       |         HAVING count(*) <= $docFreqCap),
       |sf AS (SELECT sel.doc_id, sel.h40 FROM sel JOIN rare USING (h40))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM sf a JOIN sf b ON a.h40 = b.h40 AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin
  }
}
