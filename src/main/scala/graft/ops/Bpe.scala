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

  /** Run the merge-learning loop; returns the learned rules AND the
    * final (w, sym, cnt) vocabulary table with every rule applied —
    * the encoder's lookup table. (w -> sym is injective throughout:
    * a sym string uniquely encodes its underlying char sequence, so
    * distinct words can never collapse.) */
  private def learn(docs: DataFrame, n: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(n > 0, "need at least one merge")
    var words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("cnt"))
      // ~h~~e~~</w>~ : chars wrapped in the sentinel + end-of-word.
      // Spark's split(limit = -1) KEEPS the trailing empty string the
      // zero-width (?!^) match produces at end-of-input — filter it,
      // or every word grows a phantom '' symbol (DuckDB's
      // string_split(w, '') yields chars only)
      .select(col("w"),
        concat(lit("~"),
          array_join(filter(split(col("w"), "(?!^)"),
            c => length(c) > 0), "~~"),
          lit("~~</w>~")).as("sym"),
        col("cnt"))
      .localCheckpoint(false) // vocabulary-sized from here on
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
          .select(col("w"),
            expr(s"replace(sym, '~$a~~$b~', '~$a$b~')").as("sym"),
            col("cnt"))
          .localCheckpoint(false)
        step += 1
      }
    }
    (rules.result(), words)
  }

  def merges(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spark.createDataFrame(learn(docs, n)._1)
      .toDF("step", "lhs", "rhs", "freq")
  }

  /** ENCODE with the learned merges: per-doc BPE unit counts — the
    * apply side of the tokenizer (train on the corpus, then measure
    * what it buys: n_units/n_tokens is the compression the merge
    * table achieves). Unit count per word = symbols remaining in its
    * fully-merged sym string.
    *
    * Scale shape: the corpus pays one explode + a broadcast hash join
    * against the VOCABULARY-sized (w -> n_units) table + one partial-
    * aggregated groupBy(doc_id) (map-side combine collapses each
    * doc's tokens before the exchange). Training cost is the [[learn]]
    * loop — shared, vocabulary-sized rounds. */
  def encode(docs: DataFrame, n: Int): DataFrame = {
    val units = learn(docs, n)._2
      .select(col("w"),
        size(split(expr("substring(sym, 2, length(sym) - 2)"), "~~"))
          .cast("long").as("n_units"))
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .join(broadcast(units), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_units")).as("n_units"))
  }

  /** Tokenizer fertility census (the number every multilingual-mix
    * paper reports): per language bucket, BPE units per whitespace
    * word ("fertility") and characters per unit (the inverse
    * compression the merge table achieves on that language). A
    * tokenizer trained on a skewed mix over-segments the minority
    * languages — this census is how that's detected before training.
    *
    * Scale shape: identical to [[encode]] — the corpus pays one
    * token explode + a broadcast join against the vocabulary-sized
    * unit table, then ONE partial-aggregated groupBy(lang) (map-side
    * combine collapses each partition to |langs| rows before the
    * exchange). The ratios are each ONE IEEE division of exact longs
    * at the very end, so they hash-match DuckDB bit-for-bit. */
  def fertility(docs: DataFrame, n: Int): DataFrame = {
    val units = learn(docs, n)._2
      .select(col("w"),
        size(split(expr("substring(sym, 2, length(sym) - 2)"), "~~"))
          .cast("long").as("n_units"))
    docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .join(broadcast(units), Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_units")).as("n_units"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_units"), col("n_chars"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_units").cast("double"))
          .as("chars_per_unit"))
  }

  /** The `rounds`-deep learning chain, UNROLLED as flat chained CTEs
    * (w0 -> p1 -> t1 -> w1 -> p2 -> ...): same pair counting, same
    * (freq desc, lhs, rhs) argmax, same sentinel replace as [[learn]].
    * The word string `w` rides along so the final w{rounds} doubles as
    * the encoder table. */
  private def chainSql(rounds: Int): String = {
    val w0 =
      """w0 AS (
        | SELECT w, '~' || array_to_string(string_split(w, ''), '~~')
        |          || '~~</w>~' AS sym,
        |        CAST(count(*) AS BIGINT) AS cnt
        | FROM (SELECT unnest(list_filter(
        |         string_split_regex(lower(text), '[\s\x0b]+'),
        |         x -> len(x) > 0)) AS w FROM documents)
        | GROUP BY w)""".stripMargin
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
         | SELECT w, replace(w${i - 1}.sym, '~' || t$i.a || '~~' || t$i.b || '~',
         |                '~' || t$i.a || t$i.b || '~') AS sym, cnt
         | FROM w${i - 1} CROSS JOIN t$i)""".stripMargin
    }.mkString(",\n")
    s"$w0,\n$perRound"
  }

  /** DuckDB replica of [[merges]]. Assumes `rounds` merges exist
    * (true for any corpus with >= rounds distinct adjacent pairs —
    * trivially true here). */
  def mergesOracleSql(rounds: Int): String = {
    val out = (1 to rounds)
      .map(i => s"SELECT $i AS step, a AS lhs, b AS rhs, freq FROM t$i")
      .mkString("\nUNION ALL ")
    s"WITH ${chainSql(rounds)}\n$out"
  }

  /** DuckDB replica of [[encode]] — the same chain, then unit counts
    * from the final vocabulary joined back onto every token.
    * NB: the tail is stripped BEFORE interpolation — an outer
    * stripMargin would eat the first `|` of `||` continuation lines
    * inside the already-stripped chain. */
  def encodeOracleSql(rounds: Int): String = {
    val tail =
      s"""units AS (SELECT w,
         |  CAST(len(string_split(sym[2:-2], '~~')) AS BIGINT) AS u
         | FROM w$rounds),
         |tok AS (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '[\\s\\x0b]+'),
         |    x -> len(x) > 0)) AS w FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(u) AS BIGINT) AS n_units
         |FROM tok JOIN units USING (w) GROUP BY doc_id""".stripMargin
    s"WITH ${chainSql(rounds)},\n$tail"
  }

  /** DuckDB replica of [[fertility]] — the same unrolled chain, unit
    * counts from the final vocabulary, tokens carrying their doc's
    * lang, and the two ratios as single DOUBLE divisions (DECIMAL
    * literals/arithmetic would diverge — CAST to DOUBLE first). */
  def fertilityOracleSql(rounds: Int): String = {
    val tail =
      s"""units AS (SELECT w,
         |  CAST(len(string_split(sym[2:-2], '~~')) AS BIGINT) AS u
         | FROM w$rounds),
         |tok AS (SELECT lang, unnest(list_filter(
         |    string_split_regex(lower(text), '[\\s\\x0b]+'),
         |    x -> len(x) > 0)) AS w FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(u) AS BIGINT) AS n_units,
         |  CAST(sum(len(w)) AS BIGINT) AS n_chars,
         |  CAST(sum(u) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fertility,
         |  CAST(sum(len(w)) AS DOUBLE) / CAST(sum(u) AS DOUBLE)
         |    AS chars_per_unit
         |FROM tok JOIN units USING (w) GROUP BY lang""".stripMargin
    s"WITH ${chainSql(rounds)},\n$tail"
  }
}
