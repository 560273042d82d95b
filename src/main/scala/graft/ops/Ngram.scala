package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram statistics for language-model data work: the bigram
  * count-of-counts table (Good–Turing frequency-of-frequencies, the
  * input to GT/Katz smoothing and to Heaps/Zipf corpus diagnostics).
  *
  * Scale shape: token pairing is per-row array arithmetic inside the
  * scan (zip_with over two slices of the SAME tokens array — no
  * self-join, no posexplode+window pass over token rows); then two
  * partial-aggregated shuffles, the first keyed on the gram (map-side
  * combine absorbs the Zipf head — "of the" combines within every
  * partition before the exchange), the second on the tiny count key.
  * Output is O(distinct counts) rows — a corpus of 10^12 documents
  * compresses to a few thousand (r, n_r) rows. Per count bucket we
  * also carry min(gram) as a content witness so the oracle compare is
  * sensitive to WHICH grams land in a bucket, not just how many.
  *
  * Tokenizer is [[TextAnalysis.tokens]] verbatim (lowercase,
  * whitespace split) so the vocabulary agrees with corpus_vocab and
  * the DuckDB side reuses the established `string_split_regex`
  * equivalence.
  */
object Ngram {

  /** Bigram count-of-counts: one row per distinct bigram frequency r
    * with n_r = number of distinct bigrams occurring exactly r times
    * and the lexicographically smallest such bigram as witness. */
  def bigramCountOfCounts(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    docs.select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("r"))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_r"), min(col("gram")).as("sample_gram"))
  }

  /** DuckDB oracle for [[bigramCountOfCounts]] — list-slice pairing
    * over the same tokenizer (`[\s\x0b]+` ≡ Java `\s+`, established by
    * the corpus_vocab oracle). */
  def bigramCountOfCountsOracleSql(table: String = "documents"): String =
    s"""WITH t AS (
       |  SELECT list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |                     x -> len(x) > 0) AS l
       |  FROM $table),
       |b AS (
       |  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM t WHERE len(l) >= 2),
       |g AS (SELECT l[i] || ' ' || l[i + 1] AS gram FROM b),
       |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS r FROM g GROUP BY gram)
       |SELECT r, CAST(count(*) AS BIGINT) AS n_r,
       |  min(gram) AS sample_gram
       |FROM c GROUP BY r""".stripMargin
}
