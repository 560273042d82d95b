package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** On-cluster BPE tokenizer training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * learn the first `n` merge rules from corpus word frequencies —
  * the step that turns a filtered corpus into a tokenizer.
  *
  * Algorithm (the classic): collapse the corpus to (word, count);
  * represent each word as a symbol sequence (chars + a final `</w>`
  * end-of-word marker); repeat n times: count ADJACENT symbol pairs
  * weighted by word count, pick the most frequent pair (ties:
  * freq desc, left asc, right asc — a total order), fuse that pair
  * into one symbol everywhere.
  *
  * Symbol-sequence encoding — the part that makes "fuse everywhere"
  * a single codegen'd `replace`: each symbol is wrapped in a
  * sentinel, `~sym~`, and the sequence is the concatenation
  * (`~h~~e~~</w>~`). Fusing (a,b) is then the LITERAL string
  * replace of `~a~~b~` with `~ab~`:
  *  - the sentinel can never start a match mid-symbol (every `~` is
  *    a symbol boundary; a match needs `a` right after an OPENING
  *    `~`, and whole-symbol equality is forced by the closing `~~`);
  *  - left-to-right non-overlapping replace = textbook greedy merge
  *    order, including runs: `~a~~a~~a~~a~~a~` -> `~aa~~aa~~a~`;
  *  - Spark's StringReplace and DuckDB's replace() share exactly
  *    these semantics, so the oracle restates the round verbatim.
  * The sentinel `~` is guaranteed absent from symbols: tokens are
  * lowercased and whitespace-split, and `~` never survives into a
  * merged symbol that didn't contain it. (For corpora that may
  * contain `~`, swap in any reserved codepoint; the testdata
  * alphabet is [a-z ].)
  *
  * Scale shape: ONE corpus-sized shuffle total (the word-frequency
  * collapse — map-side combined). Every round after that runs on the
  * VOCABULARY table (|unique words|, ~30 here, ~10^7 at web scale —
  * thousandsfold smaller than the corpus): a pair explode + hash agg,
  * a 1-ROW TakeOrdered argmax read by the driver (the merge rule IS
  * driver state — n rules total, that's the algorithm's output), and
  * a projection applying the replace. localCheckpoint per round
  * truncates the growing plan (the label-propagation lesson).
  *
  * Output: one row per learned rule — (step, lhs, rhs, freq). */
object Bpe {

  def merges(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("cnt"))
      // ~h~~e~~</w>~ : chars wrapped in the sentinel + end-of-word.
      // Spark's split(limit = -1) KEEPS the trailing empty string the
      // zero-width (?!^) match produces at end-of-input — filter it,
      // or every word grows a phantom '' symbol (DuckDB's
      // string_split(w, '') yields chars only)
      .select(concat(lit("~"),
          array_join(filter(split(col("w"), "(?!^)"),
            c => length(c) > 0), "~~"),
          lit("~~</w>~")).as("sym"),
        col("cnt"))
      .localCheckpoint(true) // vocabulary-sized from here on
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= n && !exhausted) {
      val top = words
        .select(expr("substring(sym, 2, length(sym) - 2)").as("body"),
          col("cnt"))
        .withColumn("arr", split(col("body"), "~~"))
        .withColumn("a", expr("slice(arr, 1, size(arr) - 1)"))
        .withColumn("b", expr("slice(arr, 2, size(arr) - 1)"))
        .select(explode(arrays_zip(col("a"), col("b"))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        rules += ((step, a, b, f))
        // symbols never contain quotes (lowercased [a-z]+ plus </w>),
        // so inlining them into the replace literal is safe
        words = words
          .select(expr(s"replace(sym, '~$a~~$b~', '~$a$b~')").as("sym"),
            col("cnt"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint(true)
        step += 1
      }
    }
    spark.createDataFrame(rules.result())
      .toDF("step", "lhs", "rhs", "freq")
  }

  /** DuckDB replica of [[merges]] — `rounds` UNROLLED as flat chained
    * CTEs (w0 -> p1 -> t1 -> w1 -> p2 -> ...): same pair counting,
    * same (freq desc, lhs, rhs) argmax, same sentinel replace. The
    * oracle assumes `rounds` merges exist (true for any corpus with
    * >= rounds distinct adjacent pairs — trivially true here). */
  def mergesOracleSql(rounds: Int): String = {
    val w0 =
      """w0 AS (
        | SELECT '~' || array_to_string(string_split(w, ''), '~~')
        |          || '~~</w>~' AS sym,
        |        CAST(count(*) AS BIGINT) AS cnt
        | FROM (SELECT unnest(list_filter(
        |         string_split_regex(lower(text), '[\s\x0b]+'),
        |         x -> len(x) > 0)) AS w FROM documents)
        | GROUP BY 1)""".stripMargin
    val perRound = (1 to rounds).map { i =>
      s"""p$i AS (
         | SELECT z[1] AS a, z[2] AS b, CAST(sum(cnt) AS BIGINT) AS freq
         | FROM (SELECT unnest(list_zip(l[1:-2], l[2:-1])) AS z, cnt
         |       FROM (SELECT string_split(sym[2:-2], '~~') AS l, cnt
         |             FROM w${i - 1}) WHERE len(l) >= 2)
         | GROUP BY a, b),
         |t$i AS (SELECT a, b, freq FROM p$i
         |        ORDER BY freq DESC, a, b LIMIT 1),
         |w$i AS (
         | SELECT replace(w${i - 1}.sym, '~' || t$i.a || '~~' || t$i.b || '~',
         |                '~' || t$i.a || t$i.b || '~') AS sym,
         |        CAST(sum(cnt) AS BIGINT) AS cnt
         | FROM w${i - 1} CROSS JOIN t$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds)
      .map(i => s"SELECT $i AS step, a AS lhs, b AS rhs, freq FROM t$i")
      .mkString("\nUNION ALL ")
    s"WITH $w0,\n$perRound\n$out"
  }
}
