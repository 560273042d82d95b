package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-level deduplication operators for training-data pipelines.
  * All shapes are shuffle-minimal and skew-aware: candidate generation
  * is always hash-bucketed (LSH band join / exact-hash groupBy) so the
  * pairwise work is bounded per bucket — never an O(n²) cross join at
  * corpus scale.
  */
object Dedup {

  /** Exact dedup: one survivor (min doc_id) per identical text.
    * Map-side partial aggregation handles the shuffle; at 100 TB swap
    * `text` for `xxhash64(text)` + a length tiebreak to cut shuffle
    * bytes (collision-checked on the survivor pass). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  /** Window-style dedup: per-group survivor via row_number — the shape
    * used for per-host / per-snapshot keep-latest policies. */
  def windowSurvivors(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lang"), col("doc_id"), col("n_chars"))
  }

  /** Word tokens (lowercased, whitespace split). */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** w-shingles as strings (codegen-friendly: transform over sequence). */
  def shingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= w,
      array_distinct(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: k independent permutations emulated by seeded
    * xxhash64 (built-in, codegen'd — no UDF in the hot path). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(j))))
    }: _*)

  /** MinHash + LSH banding: signatures → (band, bandHash) buckets →
    * self-join within buckets only → estimated-Jaccard filter.
    * bands×rowsPerBand = k; P(candidate) ≈ 1-(1-j^r)^b.
    * The band-bucket groupBy is the only shuffle; no cross join. */
  def minhashLsh(docs: DataFrame, k: Int = 64, bands: Int = 16,
                 threshold: Double = 0.5, shingleWidth: Int = 3): DataFrame = {
    val r = k / bands
    val sig = docs
      .select(col("doc_id"), minhashSignature(shingles(col("text"), shingleWidth), k).as("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, lit(r))), b).as("bh")))).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
    // bucket join: pairs only within identical (band, bandHash)
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), b => b))
          .cast("double") / k).as("est_jaccard"))
      .groupBy(col("a_id"), col("b_id")).agg(max(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact word-set Jaccard via inverted-index join (token → doc
    * posting list): intersection counts from a token equi-join, union
    * by inclusion-exclusion. Shuffles on token — hot tokens are the
    * skew risk; cap posting lists upstream (stopword drop) at scale. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = toks.as("x").join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes).as("sa"), col("a_id") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from seeded token hashes: each token votes ±1 per
    * bit, sign of the tally is the bit. Pure column expressions. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // per-bit vote: sum over tokens of (bit ? +1 : -1)
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$b")
    }
    val voted = toks.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    voted.select(col("doc_id"), sim.as("simhash"))
  }

  /** Near-dup candidates by SimHash hamming distance ≤ maxDist, banded
    * into 4×16-bit chunks (pigeonhole: ≤3 differing bits ⇒ at least one
    * identical chunk) — again a bucket join, no cross join. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val chunks = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xffffL)).as("ch"))
    }
    val chunked = sh.select(col("doc_id"), col("simhash"),
      explode(array(chunks: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.ch"))
    val a = chunked.select(col("chunk"), col("ch"), col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val b = chunked.select(col("chunk"), col("ch"), col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    a.join(b, Seq("chunk", "ch")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .groupBy(col("a_id"), col("b_id")).agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
