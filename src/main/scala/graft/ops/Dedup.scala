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

  /** splitmix64 finalizer — the per-permutation mixer for minhash. */
  @inline private[ops] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a string (deterministic, allocation-free). */
  @inline private[ops] def hash64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    h
  }

  /** MinHash signatures, one pass per document: base-hash each shingle
    * once, derive the k permutations by splitmix64 remixing. Typed
    * mapPartitions on purpose — the expression-tree formulation
    * (k × array_min(transform(xxhash64(shingle)))) re-hashed every
    * shingle string k times and benched 500+ s at sf0.1; this is
    * per-row imperative logic, the documented mapPartitions case. */
  def minhashSignatures(docs: DataFrame, k: Int, shingleWidth: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          val sig = Array.fill(k)(Long.MaxValue)
          val n = math.max(1, toks.length - shingleWidth + 1)
          var i = 0
          while (i < n) {
            // base hash of the w-gram (chained FNV over tokens)
            var h = 0xcbf29ce484222325L
            var w = 0
            while (w < shingleWidth && i + w < toks.length) {
              h = (h ^ hash64(toks(i + w), 0, toks(i + w).length)) * 1099511628211L
              w += 1
            }
            var j = 0
            while (j < k) {
              val hj = mix64(h + j * 0xc2b2ae3d27d4eb4fL)
              if (hj < sig(j)) sig(j) = hj
              j += 1
            }
            i += 1
          }
          (id, sig)
        }
      }.toDF("doc_id", "sig")
  }

  /** MinHash + LSH banding: signatures → (band, bandHash) buckets →
    * distinct candidate pairs from a bucket self-join → broadcast the
    * (small) signature table back in for the estimated-Jaccard filter.
    * bands×rowsPerBand = k; P(candidate) ≈ 1-(1-j^r)^b. Buckets larger
    * than `bucketCap` are dropped (standard LSH safety valve — a
    * degenerate mega-bucket pairs everything with everything). */
  def minhashLsh(docs: DataFrame, k: Int = 64, bands: Int = 16,
                 threshold: Double = 0.5, shingleWidth: Int = 3,
                 bucketCap: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    // sig is small per-doc state (k longs); recomputing it on each use
    // is cheaper than pinning a cache for the three consumers below
    val sig = minhashSignatures(docs, k, shingleWidth)
    locally {
      val banded = sig.as[(Long, Array[Long])].flatMap { case (id, s) =>
        (0 until bands).map { b =>
          var h = 0xcbf29ce484222325L ^ b
          var i = b * r
          while (i < (b + 1) * r) { h = (h ^ s(i)) * 1099511628211L; i += 1 }
          (id, b, h)
        }
      }.toDF("doc_id", "band", "bh")
      val capped = banded
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))))
        .filter(col("bsz") <= bucketCap)
      val a = capped.select(col("band"), col("bh"), col("doc_id").as("a_id"))
      val b = capped.select(col("band"), col("bh"), col("doc_id").as("b_id"))
      val pairs = a.join(b, Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
      pairs
        .join(broadcast(sig.toDF("a_id", "a_sig")), "a_id")
        .join(broadcast(sig.toDF("b_id", "b_sig")), "b_id")
        .select(col("a_id"), col("b_id"),
          (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), v => v))
            .cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }
  }

  /** Candidate-generate-then-verify pipeline: MinHash/LSH candidates
    * (sub-quadratic) re-checked with EXACT token-set Jaccard — the
    * production near-dup shape at corpus scale. The doc-side token
    * arrays join back by id (hash join on the small candidate set). */
  def minhashVerified(docs: DataFrame, estThreshold: Double = 0.35,
                      exactThreshold: Double = 0.7): DataFrame = {
    val candidates = minhashLsh(docs, threshold = estThreshold)
      .select(col("a_id"), col("b_id"))
    val tokArrays = docs.select(col("doc_id"),
      array_distinct(tokens(col("text"))).as("toks"))
    candidates
      .join(tokArrays.select(col("doc_id").as("a_id"), col("toks").as("a_toks")), "a_id")
      .join(tokArrays.select(col("doc_id").as("b_id"), col("toks").as("b_toks")), "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
          size(array_union(col("a_toks"), col("b_toks"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= exactThreshold)
  }

  /** Exact word-set Jaccard via inverted-index join (token → doc
    * posting list) WITH BLOCKING: pairs are generated only inside
    * (lang, source) blocks — the classic entity-resolution guard
    * against hot tokens. An unblocked token join is quadratic in the
    * posting-list length (a ubiquitous token pairs every doc with
    * every doc: measured 350M intermediate rows on 5k docs with a
    * narrow vocabulary). Intersections come from the blocked token
    * equi-join; union by inclusion-exclusion. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"), col("source"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = toks.as("x").join(toks.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
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
