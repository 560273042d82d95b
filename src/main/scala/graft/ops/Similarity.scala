package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  * Brute-force cosine is the exactness baseline (broadcast the query
  * side — the corpus side never shuffles); random-hyperplane LSH is the
  * scale path (bucket join, probes only its own bucket).
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in
    * double via built-in higher-order functions (codegen'd, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Primitive-loop cosine-threshold test, arithmetic-identical to
    * [[cosine]] `>= threshold`: the same left fold (0.0 seed, one
    * double product per element, dot and both norms accumulated in
    * element order), one sqrt each, one division. Mismatched lengths
    * reject the pair — exactly zip_with's null-extension poisoning.
    * Zero vectors give 0/0 = NaN, and NaN >= t is false either way.
    * The HOF form dispatches a boxed lambda per element (~µs/pair at
    * dim 64), which dominates any O(n²/k) within-cluster pair pass;
    * this kernel is the bruteForceTopK discipline applied to it. */
  private[ops] def cosineAtLeast(a: Array[Float], b: Array[Float],
                                 threshold: Double): Boolean = {
    if (a == null || b == null || a.length != b.length) return false
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb)) >= threshold
  }

  /** Exact top-k neighbors for each query vector (brute force).
    * The small query side is broadcast as plain arrays; the corpus
    * scans ONCE with a primitive-loop kernel emitting per-partition
    * top-k candidates per query (a superset of the global top-k), and
    * only that tiny candidate set shuffles into the final window rank.
    * (A crossJoin + higher-order-function cosine evaluates boxed
    * lambdas per element — benched 10x slower.) */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float], Double)] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v, norm(v)) }
    val qB = spark.sparkContext.broadcast(qArr)
    val candidates = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val qs = qB.value
        // per-query bounded candidate lists for this partition
        // min-heap under (score ASC, id DESC) — the sq8TopK ordering:
        // evicting the head drops the globally-worst candidate, and
        // equal scores keep the SMALLER id, matching the oracle's
        // (cos DESC, id ASC) cut so ties at the k boundary cannot
        // make recall rows partitioning-dependent
        val best = Array.fill(qs.length)(
          new java.util.PriorityQueue[(Double, Long)](k + 1,
            (a: (Double, Long), b: (Double, Long)) => {
              val c = java.lang.Double.compare(a._1, b._1)
              if (c != 0) c else java.lang.Long.compare(b._2, a._2)
            }))
        rows.foreach { case (id, v) =>
          val nv = norm(v)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn) = qs(qi)
            if (qid != id) {
              var dot = 0.0
              var d = 0
              while (d < v.length) { dot += qv(d).toDouble * v(d).toDouble; d += 1 }
              val cos = dot / (qn * nv)
              val pq = best(qi)
              pq.add((cos, id))
              if (pq.size() > k) pq.poll()
            }
            qi += 1
          }
        }
        best.iterator.zipWithIndex.flatMap { case (pq, qi) =>
          val qid = qs(qi)._1
          Iterator.continually(pq.poll()).takeWhile(_ != null)
            .map { case (cos, id) => (qid, id, cos) }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  @inline private def norm(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  @inline private def hyperplane(seed: Long, bit: Int, d: Int): Double = {
    var z = seed + bit.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Random-hyperplane signatures per table, one typed pass: bit i =
    * sign(v · r_i). (The column-expression formulation expanded to a
    * nBits×dim×nTables element_at tree — thousands of nodes per row —
    * and benched 90+ s on 2k vectors; per-row numeric loops are the
    * documented mapPartitions case.) */
  def lshSignatures(df: DataFrame, idCol: String, nBits: Int,
                    nTables: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        // Hyperplane matrix materialized ONCE per partition (flat,
        // [t][bit][d] row-major): the mix is ~6 int ops per component
        // vs 2 flops for the mult-add it feeds, so recomputing it per
        // vector row made the hash 3/4 of the kernel. Same components
        // and the same left-to-right double accumulation → signatures
        // are bit-identical to the per-row formulation (and to the
        // DuckDB oracle). Sized lazily off the first row's dim.
        var hp: Array[Double] = null
        var dim = -1
        rows.flatMap { case (id, v) =>
          if (v.length != dim) {
            dim = v.length
            hp = new Array[Double](nTables * nBits * dim)
            var i = 0
            var t = 0
            while (t < nTables) {
              val seed = 42L + t * 1000003L
              var bit = 0
              while (bit < nBits) {
                var d = 0
                while (d < dim) { hp(i) = hyperplane(seed, bit, d); d += 1; i += 1 }
                bit += 1
              }
              t += 1
            }
          }
          val m = hp
          (0 until nTables).map { t =>
            var sig = 0
            var bit = 0
            var base = t * nBits * dim
            while (bit < nBits) {
              var dot = 0.0
              var d = 0
              while (d < dim) { dot += v(d) * m(base + d); d += 1 }
              if (dot >= 0) sig |= (1 << bit)
              bit += 1
              base += dim
            }
            (id, t, sig, v)
          }
        }
      }.toDF(idCol, "table", "sig", "embedding")
  }

  /** LSH-bucketed ANN: both sides signed with the same hyperplanes;
    * candidates share a bucket (multi-probe via nTables different
    * seeds); exact cosine re-rank inside the candidate set only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 12, nTables: Int = 4): DataFrame = {
    def signed(df: DataFrame, idCol: String): DataFrame =
      lshSignatures(df, idCol, nBits, nTables)
    val c = signed(corpus, "vec_id")
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumnRenamed("embedding", "c_emb")
    val q = signed(queries, "vec_id")
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
    val cand = c.join(broadcast(q), Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** IVF-style coarse quantization: score every vector against `nCells`
    * deterministic centroid directions (drawn from the same splitmix64
    * component stream as the LSH hyperplanes, disjoint seed base) and
    * keep the `take` best cells per vector ordered by (cosine desc,
    * cell asc). `take = 1` is the corpus-side inverted-list assignment;
    * `take = nProbe` is the query-side probe list. A trained k-means
    * codebook would adapt to the data, but training is a separate
    * (non-deterministic) job; fixed random directions keep the whole
    * pipeline reproducible and oracle-checkable while preserving the
    * IVF *shape* — each corpus vector lands in exactly one list, and a
    * query touches only nProbe/nCells of the corpus.
    *
    * Same bit-exactness discipline as [[lshSignatures]]: the centroid
    * matrix is materialized once per partition, all dot/norm
    * accumulations are left-to-right doubles, and ties in the cell
    * ranking break to the lower cell index — so the DuckDB oracle
    * ([[EmbeddingOracle.ivfSql]]) reproduces every assignment. */
  def ivfCells(df: DataFrame, idCol: String, nCells: Int, take: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        var cm: Array[Double] = null   // flat [cell][d] centroid components
        var cn: Array[Double] = null   // per-cell sqrt(sum h^2), fold order d
        var dim = -1
        rows.flatMap { case (id, v) =>
          if (v.length != dim) {
            dim = v.length
            cm = new Array[Double](nCells * dim)
            cn = new Array[Double](nCells)
            var c = 0
            while (c < nCells) {
              val base = c * dim
              var n2 = 0.0
              var d = 0
              while (d < dim) {
                val h = hyperplane(1299709L + c * 7919L, 0, d)
                cm(base + d) = h
                n2 += h * h
                d += 1
              }
              cn(c) = math.sqrt(n2)
              c += 1
            }
          }
          var vn2 = 0.0
          var d = 0
          while (d < v.length) { vn2 += v(d).toDouble * v(d).toDouble; d += 1 }
          val vn = math.sqrt(vn2)
          val cos = new Array[Double](nCells)
          var c = 0
          while (c < nCells) {
            var dot = 0.0
            val base = c * dim
            var i = 0
            while (i < v.length) { dot += v(i).toDouble * cm(base + i); i += 1 }
            cos(c) = dot / (vn * cn(c))
            c += 1
          }
          // top-`take` cells by (cos desc, cell asc): strictly-greater
          // argmax keeps the lowest cell on ties — matches the oracle's
          // row_number() ORDER BY cos DESC, cell ASC
          val used = new Array[Boolean](nCells)
          (0 until math.min(take, nCells)).map { _ =>
            var best = -1
            var bestCos = Double.NegativeInfinity
            var i = 0
            while (i < nCells) {
              if (!used(i) && cos(i) > bestCos) { best = i; bestCos = cos(i) }
              i += 1
            }
            used(best) = true
            (id, best, v)
          }
        }
      }.toDF(idCol, "cell", "embedding")
  }

  /** IVF-bucketed ANN: corpus vectors live in exactly one inverted
    * list ([[ivfCells]] take=1 — never shuffled, never broadcast);
    * each query probes its `nProbe` nearest cells; exact cosine
    * re-ranks inside the probed lists only. Complements [[lshTopK]]
    * (multi-table hash buckets) with the other classic ANN scale
    * shape: candidate volume is a tunable nProbe/nCells fraction of
    * the corpus per query instead of a hash-collision census, so
    * recall degrades gracefully (nProbe = nCells ≡ brute force). Only
    * the (query_id, neighbor_id, cos) candidate triples — 24 bytes
    * each — reach the final rank shuffle. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = ivfCells(corpus, "vec_id", nCells, take = 1)
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumnRenamed("embedding", "c_emb")
    val q = ivfCells(queries, "vec_id", nCells, take = nProbe)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
    // corpus cells are disjoint and probe cells distinct per query, so
    // each (query, neighbor) pair arises at most once — no dedup needed
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding near-duplicate pairs at scale: random-hyperplane LSH
    * buckets generate candidates (sub-quadratic, bucket equi-join —
    * nothing is collected or broadcast whole), then EXACT cosine
    * re-checks each candidate, so precision is 1.0. Recall per true
    * pair at cosine c is 1-(1-(1-θ/π)^nBits)^nTables with θ=acos(c):
    * ≈1.0 for real near-dups (c ≥ 0.9) at the defaults; tune
    * nBits↓/nTables↑ for looser thresholds. The brute-force
    * `nearDupPairs` below stays as the small-scale exactness oracle. */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double,
                      nBits: Int = 6, nTables: Int = 24,
                      bucketCap: Int = 2000): DataFrame = {
    val sigs = lshSignatures(corpus, "vec_id", nBits, nTables)
      .select(col("vec_id"), col("table"), col("sig")) // drop vectors: shuffle ids only
    val capped = sigs
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("table"), col("sig"))))
      .filter(col("bsz") <= bucketCap)
      .drop("bsz")
    val a = capped.select(col("table"), col("sig"), col("vec_id").as("a_id"))
    val b = capped.select(col("table"), col("sig"), col("vec_id").as("b_id"))
    val cand = a.join(b, Seq("table", "sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val emb = corpus.select(col("vec_id").cast("long"), col("embedding"))
    val joined = cand
      .join(emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb")), "a_id")
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")), "b_id")
      .select(col("a_id"), col("b_id"), col("a_emb"), col("b_emb"))
    cosineThresholdPairs(joined, threshold)
  }

  /** Exact-cosine filter over (a_id, b_id, a_emb, b_emb) rows with a
    * primitive-loop kernel: the HOF-expression `cosine` evaluates boxed
    * lambdas per element, which benched ~25x slower on millions of
    * candidate pairs. Left-to-right double accumulation — same order as
    * the HOF fold, so threshold decisions are bit-identical. */
  private def cosineThresholdPairs(joined: DataFrame, threshold: Double): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    joined.as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (aId, bId, av, bv) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < av.length) {
            val x = av(i).toDouble; val y = bv(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          if (dot / (math.sqrt(na) * math.sqrt(nb)) >= threshold) Some((aId, bId)) else None
        }
      }.toDF("a_id", "b_id")
  }

  /** Distributed EXACT near-dup pairs with a lossless metric-space
    * prune — the scale shape for the exactness row (round 2 used a
    * full-corpus broadcast-nested-loop join, which OOMs executors once
    * the table outgrows them).
    *
    * Math: cosine is scale-invariant, so bucketing by vector norm
    * prunes nothing. Instead map each vector to the unit sphere, where
    * cos(a,b) ≥ t ⟺ the Euclidean distance of the NORMALIZED vectors
    * ‖â−b̂‖ ≤ D = √(2−2t). For any pivot p (a fixed unit vector), the
    * triangle inequality gives |d(â,p) − d(b̂,p)| ≤ d(â,b̂) ≤ D, so
    * bucketing by ⌊d(·,p)/D⌋ means a qualifying pair differs by AT MOST
    * 1 in every pivot's bucket index — candidate generation is
    * LOSSLESS. Pivot 0 drives the shuffle equi-join (probe side
    * explodes to {b−1,b,b+1}: 3 copies of 8-byte keys, not 3 copies of
    * the data — ids+buckets only); the remaining pivots prune as cheap
    * post-join predicates; exact cosine (identical kernel and
    * accumulation order as before, on the RAW vectors) decides each
    * surviving candidate, so output is bit-identical to the brute
    * force. Pruning power grows with the threshold (D=0.45 at t=0.9 vs
    * D=1.05 at the loose oracle t=0.45); at any threshold the plan is a
    * shuffle hash/sort-merge join — no broadcast of the corpus. */
  def nearDupPairsExact(corpus: DataFrame, threshold: Double,
                        nPivots: Int = 4): DataFrame = {
    val bigD = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12))
    val withBk = pivotBucketed(corpus, bigD, nPivots)
    val a = withBk.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("bk").as("a_bk"))
    val probe = explode(array(
      element_at(col("bk"), 1) - 1,
      element_at(col("bk"), 1),
      element_at(col("bk"), 1) + 1)).as("probe")
    val b = withBk.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("bk").as("b_bk"), probe)
    val adjacent = (2 to nPivots).map { p =>
      abs(element_at(col("a_bk"), p) - element_at(col("b_bk"), p)) <= 1
    }.reduceOption(_ && _).getOrElse(lit(true))
    val joined = a.join(b,
        element_at(col("a_bk"), 1) === col("probe") &&
          col("a_id") < col("b_id") && adjacent)
      .select(col("a_id"), col("b_id"), col("a_emb"), col("b_emb"))
    cosineThresholdPairs(joined, threshold)
  }

  /** (vec_id, embedding, bk) with bk(p) = ⌊d(v̂, pivot_p)/bigD⌋ — the
    * lossless metric-prune bucket stage shared by [[nearDupPairsExact]]
    * and [[hardNegatives]]. */
  private[ops] def pivotBucketed(corpus: DataFrame, bigD: Double,
                                 nPivots: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        // Pivot components materialized ONCE per partition (flat
        // [p][d] row-major, plus each pivot's norm) — the same hoist
        // lshSignatures uses: the splitmix-style mix is ~6 int ops per
        // component vs 2 flops for the mult-add it feeds, so
        // recomputing it per row made the hash the bulk of the kernel.
        // Identical component values and the same left-to-right double
        // accumulation → bucket indices are bit-identical to the
        // per-row formulation (oracle unchanged). Sized lazily off the
        // first row's dim; pivots from the deterministic hyperplane
        // stream (seed disjoint from the LSH tables').
        var piv: Array[Double] = null
        var pivNorm: Array[Double] = null
        var dim = -1
        it.map { case (id, v) =>
          if (v.length != dim) {
            dim = v.length
            piv = new Array[Double](nPivots * dim)
            pivNorm = new Array[Double](nPivots)
            var p = 0
            while (p < nPivots) {
              var pn = 0.0
              var d = 0
              val base = p * dim
              while (d < dim) {
                val r = hyperplane(7776001L + p * 104729L, 0, d)
                piv(base + d) = r
                pn += r * r
                d += 1
              }
              pivNorm(p) = pn
              p += 1
            }
          }
          val nv = norm(v)
          val buckets = new Array[Int](nPivots)
          var p = 0
          while (p < nPivots) {
            var dot = 0.0
            val base = p * dim
            var d = 0
            while (d < v.length) {
              dot += v(d).toDouble * piv(base + d)
              d += 1
            }
            val c = math.max(-1.0, math.min(1.0, dot / (nv * math.sqrt(pivNorm(p)))))
            val dist = math.sqrt(math.max(0.0, 2.0 - 2.0 * c))
            buckets(p) = (dist / bigD).toInt
            p += 1
          }
          (id, v, buckets)
        }
      }.toDF("vec_id", "embedding", "bk")
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * (vec_id < `anchorMax`) the single best corpus neighbor whose
    * EXACT cosine lies in the hard band [floor, ceil) — similar
    * enough to be informative, below the near-dup ceiling (a near-dup
    * "negative" would be a false negative and poisons the loss).
    * Winner = max cosine, ties to the smaller neg_id; n_band counts
    * the anchor's full in-band candidate set. Output is integer-only
    * (anchor_id, neg_id, n_band) — no float column reaches the
    * driver hash.
    *
    * Exactness: candidates come from the [[pivotBucketed]] metric
    * prune at the BAND FLOOR (cos ≥ floor ⟺ unit-sphere distance ≤
    * D(floor); the triangle bound makes bucket adjacency lossless for
    * everything the band can contain — the ceiling needs no prune,
    * it only removes pairs), decided by the same interleaved
    * left-to-right cosine kernel as [[cosineThresholdPairs]], so the
    * DuckDB oracle's ordered folds reproduce every band decision and
    * every argmax bit-for-bit. Pruning power shrinks as the floor
    * drops (same trade documented on [[nearDupPairsExact]]).
    *
    * Scale shape: the anchor side is small by contract (mining runs
    * per query batch); the corpus side explodes only its probe KEYS.
    * With both sides large the same plan is a shuffle equi-join on
    * pivot buckets — never a corpus broadcast. The band census + argmax
    * is one partial-aggregated shuffle over anchor ids. */
  def hardNegatives(corpus: DataFrame, anchorMax: Long = 200L,
                    floor: Double = 0.3, ceil: Double = 0.9,
                    nPivots: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bigD = math.sqrt(math.max(2.0 - 2.0 * floor, 1e-12))
    val withBk = pivotBucketed(corpus, bigD, nPivots)
    val a = withBk.filter(col("vec_id") < anchorMax)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb"),
        col("bk").as("a_bk"))
    val probe = explode(array(
      element_at(col("bk"), 1) - 1,
      element_at(col("bk"), 1),
      element_at(col("bk"), 1) + 1)).as("probe")
    val b = withBk.select(col("vec_id").as("neg_id"), col("embedding").as("b_emb"),
      col("bk").as("b_bk"), probe)
    val adjacent = (2 to nPivots).map { p =>
      abs(element_at(col("a_bk"), p) - element_at(col("b_bk"), p)) <= 1
    }.reduceOption(_ && _).getOrElse(lit(true))
    val joined = a.join(b,
        element_at(col("a_bk"), 1) === col("probe") &&
          col("anchor_id") =!= col("neg_id") && adjacent)
      .select(col("anchor_id"), col("neg_id"), col("a_emb"), col("b_emb"))
    val banded = joined.as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (aId, nId, av, bv) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < av.length) {
            val x = av(i).toDouble; val y = bv(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          val c = dot / (math.sqrt(na) * math.sqrt(nb))
          if (c >= floor && c < ceil) Some((aId, nId, c)) else None
        }
      }.toDF("anchor_id", "neg_id", "cos")
    banded.groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_band"),
        max(struct(col("cos").as("c"), (-col("neg_id")).as("ni"),
          col("neg_id").as("neg"))).as("pick"))
      .select(col("anchor_id"), col("pick").getField("neg").as("neg_id"),
        col("n_band"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Exact variant
    * for verification (O(n²) — at scale use `nearDupPairsLsh`). Norms
    * are precomputed per side so the per-pair work is one dot product.
    * Output is id pairs only (no float column) to keep results
    * hash-stable. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // verification-baseline shape: one side broadcast as primitive
    // arrays (requires it to fit on executors — fine for the exactness
    // baseline; the scale path is LSH buckets), corpus side streams
    // once, pairs computed with tight float loops
    val allArr: Array[(Long, Array[Float], Double)] = corpus
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v, norm(v)) }
      .sortBy(_._1)
    val allB = spark.sparkContext.broadcast(allArr)
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val all = allB.value
        rows.flatMap { case (aId, aV) =>
          val aN = norm(aV)
          val out = Vector.newBuilder[(Long, Long)]
          var i = 0
          while (i < all.length) {
            val (bId, bV, bN) = all(i)
            if (bId > aId) {
              var dot = 0.0
              var d = 0
              while (d < aV.length) { dot += aV(d).toDouble * bV(d).toDouble; d += 1 }
              if (dot / (aN * bN) >= threshold) out += ((aId, bId))
            }
            i += 1
          }
          out.result()
        }
      }.toDF("a_id", "b_id")
  }

  // ------------------------------------------------------------------
  // SQ8: scalar-quantized ANN (int8 codes + exact re-rank)
  // ------------------------------------------------------------------

  /** Quantize one vector against per-dimension corpus max-abs scales:
    * code = floor(x * 127 / m_d) clamped to [-127, 127]. SYMMETRIC
    * quantization, not affine — an affine [0,255] code erases the sign
    * structure (dot products of shifted codes are not monotone in the
    * float dot; measured recall 0.43 vs 0.9+ here), while a per-dim
    * positive rescale preserves signs and approximates the dot up to
    * per-dim weights. floor, not round — round-half ties resolve
    * differently across engines, floor is unambiguous. Static method,
    * not a local def: a closure calling a LOCAL def drags the
    * enclosing frame into the lambda (the corpus_bloom_decontaminate
    * serialization lesson). */
  private def sq8Quantize(v: Array[Float], maxAbs: Array[Float]): Array[Int] = {
    val q = new Array[Int](v.length)
    var d = 0
    while (d < v.length) {
      val m = maxAbs(d).toDouble
      q(d) =
        if (m == 0.0) 0
        else {
          val c = math.floor(v(d).toDouble * 127.0 / m)
          if (c < -127.0) -127 else if (c > 127.0) 127 else c.toInt
        }
      d += 1
    }
    q
  }

  /** Exact squared L2 norm of a code vector (≤ dim·127² — far inside
    * exact-double range even multiplied pairwise). */
  private def sqNorm2(q: Array[Int]): Long = {
    var s = 0L
    var d = 0
    while (d < q.length) { s += q(d).toLong * q(d).toLong; d += 1 }
    s
  }

  /** ANN via 8-bit scalar quantization with exact re-rank — the
    * memory-scale path for similarity search: codes are 4x smaller
    * than float32, so a 10^10-vector index that would need 2.5 TB of
    * float RAM fits in 640 GB of executor memory, and the integer dot
    * product vectorizes (in real deployments, to VNNI/DP4A). Stages:
    *
    *  1. per-dimension corpus max-abs (FLOAT max of abs — exact and
    *     order-independent, unlike means, which is why SQ needs no
    *     IEEE-fold discipline where PQ's k-means centroids would);
    *  2. quantize corpus + queries to symmetric [-127,127] codes;
    *  3. quantized-cosine top-`candidates` cut per query: the dot and
    *     both norms are EXACT integer sums (order-independent — no
    *     fold discipline), combined by one sqrt + one division of
    *     exactly-representable doubles, so the score is a
    *     deterministic function of the data; equal scores (common —
    *     duplicate vectors quantize identically) break by id
    *     (keep-smaller) in the per-partition heap, so the cut never
    *     flaps under AQE/partitioning;
    *  4. exact float cosine re-rank of the candidates to top-k
    *     (ordered element fold — bit-identical to the oracle replay).
    *
    * Scale shape: the range pass is one dim-sized aggregate; the scan
    * emits only per-partition candidate heaps (queries broadcast);
    * the re-rank joins a candidate set of |queries|·C rows back to the
    * corpus — broadcast-sized by construction. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              candidates: Int = 20): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rng = corpus
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(max(abs(col("x"))).as("m"))
      .collect().map(r => (r.getInt(0), r.getFloat(1)))
      .sortBy(_._1)
    val maxAbs = rng.map(_._2)
    val qCodes: Array[(Long, Array[Int], Long)] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, v) =>
        val q = sq8Quantize(v, maxAbs)
        (id, q, sqNorm2(q))
      }
    val mB = spark.sparkContext.broadcast(maxAbs)
    val qB = spark.sparkContext.broadcast(qCodes)
    val cand = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val qs = qB.value
        val m = mB.value
        // min-heap under (score ASC, id DESC): evicting its head drops
        // the globally-worst candidate, so equal scores keep the
        // smaller id — the global total order's preference
        val ord = new java.util.Comparator[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(a._1, b._1)
            if (c != 0) c else java.lang.Long.compare(b._2, a._2)
          }
        }
        val best = Array.fill(qs.length)(
          new java.util.PriorityQueue[(Double, Long)](candidates + 1, ord))
        rows.foreach { case (id, v) =>
          val cv = sq8Quantize(v, m)
          val cn = sqNorm2(cv)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn) = qs(qi)
            if (qid != id) {
              var s = 0L
              var d = 0
              while (d < cv.length) { s += qv(d).toLong * cv(d).toLong; d += 1 }
              // quantized cosine: exact longs in, ONE sqrt + ONE
              // division — deterministic and oracle-replicable
              val score =
                if (qn == 0L || cn == 0L) -2.0
                else s.toDouble / math.sqrt((qn * cn).toDouble)
              val pq = best(qi)
              pq.add((score, id))
              if (pq.size() > candidates) pq.poll()
            }
            qi += 1
          }
        }
        best.iterator.zipWithIndex.flatMap { case (pq, qi) =>
          val qid = qs(qi)._1
          Iterator.continually(pq.poll()).takeWhile(_ != null)
            .map { case (s, id) => (qid, id, s) }
        }
      }.toDF("query_id", "neighbor_id", "score")
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val cut = cand.withColumn("r", row_number().over(wC))
      .filter(col("r") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    val rerank = cut
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rerank.withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Integer Lloyd k-means over SQ8 codes — embedding-space clustering
    * for diversity-aware sampling and SemDeDup-style semantic dedup
    * buckets. Every arithmetic step is exact or IEEE-fixed, so cluster
    * assignments are bit-identical at any parallelism AND replayable
    * in SQL:
    *
    *  1. vectors quantize to the same symmetric [-127,127] codes as
    *     [[sq8TopK]] (global per-dim max-abs — order-independent);
    *  2. init: centroids = the codes of the `k` smallest vec_ids
    *     (deterministic, no sampling);
    *  3. assignment: exact integer squared-L2 argmin, ties keep the
    *     lowest centroid index;
    *  4. update: per-(cluster, dim) EXACT integer sums (the partial
    *     agg absorbs the corpus map-side), centroid = floor(sum/n) —
    *     one IEEE division + floor, re-quantizing the centroid to
    *     integers so the next round stays exact; empty clusters keep
    *     their previous centroid.
    *
    * Scale shape: the code table shuffles never — each round is one
    * broadcast of k·dim ints out, one k·dim-row aggregate back (the
    * classic Spark k-means contract: model state is driver-sized by
    * construction, data never leaves its partitions). `iters` rounds
    * means exactly `iters` scans + `iters−1` tiny aggregates. */
  def kmeansSq8(corpus: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val maxAbs = corpus
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(max(abs(col("x"))).as("m"))
      .collect().map(r => (r.getInt(0), r.getFloat(1)))
      .sortBy(_._1).map(_._2)
    val mB = spark.sparkContext.broadcast(maxAbs)
    val codes = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val m = mB.value
        rows.map { case (id, v) => (id, sq8Quantize(v, m)) }
      }.toDF("vec_id", "code").localCheckpoint(false)
    var centroids: Array[Array[Int]] = codes
      .orderBy(col("vec_id")).limit(k)
      .as[(Long, Array[Int])].collect().map(_._2)
    require(centroids.length == k, s"corpus smaller than k=$k")
    var assign: DataFrame = null
    var round = 0
    while (round < iters) {
      val cB = spark.sparkContext.broadcast(centroids)
      assign = codes.as[(Long, Array[Int])].mapPartitions { rows =>
        val cs = cB.value
        rows.map { case (id, q) =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < cs.length) {
            val cc = cs(c)
            var d2 = 0L
            var d = 0
            while (d < q.length) { val x = (q(d) - cc(d)).toLong; d2 += x * x; d += 1 }
            if (d2 < bestD) { bestD = d2; best = c } // strict < : ties keep lowest c
            c += 1
          }
          (id, best.toLong, bestD, q)
        }
      }.toDF("vec_id", "cluster", "dist2", "code")
      round += 1
      if (round < iters) {
        val sums = assign
          .select(col("cluster"), posexplode(col("code")).as(Seq("d", "q")))
          .groupBy(col("cluster"), col("d"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
          .collect() // k·dim rows — driver-sized by construction
        val next = centroids.map(_.clone()) // empty-cluster guard
        sums.foreach { r =>
          val c = r.getLong(0).toInt
          val d = r.getInt(1)
          next(c)(d) = math.floor(r.getLong(2).toDouble / r.getLong(3).toDouble).toInt
        }
        centroids = next
      }
    }
    assign.select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** SemDeDup (Abbas et al. 2023) end-to-end: semantic deduplication
    * by k-means bucketing + within-cluster cosine merge. Composes
    * [[kmeansSq8]] (deterministic integer clusters) with the
    * within-cluster exact-cosine pair join and the min-id
    * connected-component survivor rule ([[Dedup.survivors]]).
    *
    * Scale shape — the whole reason SemDeDup exists: pairwise cosine
    * over 10^9 docs is 10^18 comparisons, but restricted to k-means
    * clusters it is Σ|cluster|² ≈ n²/k, and k GROWS with the corpus
    * (the paper uses k≈10^5 for 10^9 docs), so per-cluster work stays
    * bounded. Here: one equi-join shuffle on cluster id, pair cosines
    * inside each cluster partition, then the star-contraction /
    * size-gated component solve on the (tiny) duplicate-pair set.
    *
    * Output: (vec_id, cluster, rep_id) — rep_id == vec_id ⟺ survivor. */
  def semanticDedup(corpus: DataFrame, k: Int = 8, iters: Int = 3,
                    threshold: Double = 0.45): DataFrame = {
    val assign = kmeansSq8(corpus, k, iters)
      .select(col("vec_id"), col("cluster")).localCheckpoint(false)
    val withVec = assign
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val lhs = withVec.select(col("vec_id").as("a_id"), col("cluster"),
      col("embedding").as("av"))
    val rhs = withVec.select(col("vec_id").as("b_id"), col("cluster"),
      col("embedding").as("bv"))
    // the pair pass evaluates Σ|cluster|² cosines — run it through the
    // primitive kernel (bit-identical, see cosineAtLeast) instead of
    // per-element HOF lambdas
    val spark2 = corpus.sparkSession
    import spark2.implicits._
    val pairs = lhs.join(rhs, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("av"), col("bv"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.collect {
        case (a, b, av, bv) if cosineAtLeast(av, bv, threshold) => (a, b)
      })
      .toDF("a_id", "b_id")
    val surv = Dedup.survivors(
      corpus.select(col("vec_id").as("doc_id")), pairs)
    assign
      .join(surv.select(col("doc_id").as("vec_id"), col("rep_id")), Seq("vec_id"))
      .select(col("vec_id"), col("cluster"), col("rep_id"))
  }

  /** Product-quantization ANN with exact re-rank — the canonical
    * billion-vector index compression (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): at m=4
    * sub-codebooks of 16 centroids, every corpus vector is 4 half-byte
    * codes ≈ 2 bytes + id — a 10^11-vector index fits where even SQ8
    * could not. All arithmetic is exact integers, so assignments,
    * ADC distances, and the candidate cut are bit-identical at any
    * parallelism and replayable in SQL:
    *
    *  1. vectors quantize to [[sq8TopK]]'s SQ8 codes (global per-dim
    *     max-abs), and each code splits into m contiguous subvectors;
    *  2. per-subspace codebooks train jointly — ONE integer Lloyd loop
    *     keyed by (sub, centroid) with [[kmeansSq8]]'s exact contract
    *     (k-lowest-id init, integer L2 argmin with lowest-c ties,
    *     floor(sum/n) update, empty-cluster guard); per round the model
    *     ships as one m·k·subDim-int broadcast out and one
    *     m·k·subDim-row aggregate back;
    *  3. the last assignment IS the encoding: (vec_id, m nibble codes);
    *  4. query scan uses the defining PQ trick — an ADC lookup table
    *     per query (dist[sub][c] = exact L2 of the query subvector to
    *     centroid, m·k longs built ONCE per partition), so scoring a
    *     corpus vector is m table loads + adds, never touching floats;
    *  5. per-partition tie-consistent top-`candidates` heaps under the
    *     global (adc ASC, id ASC) order (the [[sq8TopK]] argument:
    *     each partition's survivors are the partition restriction of
    *     the global order, so the union covers the global cut), then
    *     exact float cosine re-ranks the survivors only.
    *
    * With `candidates` ≥ corpus size the cut is a no-op and the result
    * equals brute force exactly (pinned by spec). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, m: Int = 4,
             kCode: Int = 16, iters: Int = 2, k: Int = 5,
             candidates: Int = 20): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val maxAbs = corpus
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(max(abs(col("x"))).as("mx"))
      .collect().map(r => (r.getInt(0), r.getFloat(1)))
      .sortBy(_._1).map(_._2)
    val dim = maxAbs.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val mB = spark.sparkContext.broadcast(maxAbs)
    val codes = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val ma = mB.value
        rows.map { case (id, v) => (id, sq8Quantize(v, ma)) }
      }.toDF("vec_id", "code").localCheckpoint(false)
    // ---- 2. joint per-subspace Lloyd: centroids(sub)(c)(sd)
    var cents: Array[Array[Array[Int]]] = {
      val seeds = codes.orderBy(col("vec_id")).limit(kCode)
        .as[(Long, Array[Int])].collect().map(_._2)
      require(seeds.length == kCode, s"corpus smaller than kCode=$kCode")
      Array.tabulate(m, kCode, subDim)((s, c, sd) => seeds(c)(s * subDim + sd))
    }
    var enc: DataFrame = null
    var round = 0
    while (round < iters) {
      val cB = spark.sparkContext.broadcast(cents)
      enc = codes.as[(Long, Array[Int])].mapPartitions { rows =>
        val cs = cB.value
        val mm = cs.length
        val kk = cs(0).length
        val sdim = cs(0)(0).length
        rows.map { case (id, q) =>
          val pq = new Array[Int](mm)
          var s = 0
          while (s < mm) {
            var best = 0
            var bestD = Long.MaxValue
            var c = 0
            while (c < kk) {
              val cc = cs(s)(c)
              var d2 = 0L
              var sd = 0
              while (sd < sdim) {
                val x = (q(s * sdim + sd) - cc(sd)).toLong; d2 += x * x; sd += 1
              }
              if (d2 < bestD) { bestD = d2; best = c } // ties keep lowest c
              c += 1
            }
            pq(s) = best
            s += 1
          }
          (id, pq)
        }
      }.toDF("vec_id", "pq")
      round += 1
      if (round < iters) {
        val sums = enc.join(codes, Seq("vec_id"))
          .select(posexplode(col("code")).as(Seq("d", "q")), col("pq"))
          .select((col("d") / subDim).cast("int").as("sub"),
            (col("d") % subDim).as("sd"), col("q"),
            element_at(col("pq"), (col("d") / subDim).cast("int") + 1).as("c"))
          .groupBy(col("sub"), col("c"), col("sd"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
          .collect() // m*kCode*subDim rows — model-sized by construction
        val next = cents.map(_.map(_.clone())) // empty-cluster guard
        sums.foreach { r =>
          val sub = r.getInt(0); val c = r.getInt(1); val sd = r.getInt(2)
          next(sub)(c)(sd) =
            math.floor(r.getLong(3).toDouble / r.getLong(4).toDouble).toInt
        }
        cents = next
      }
    }
    // ---- 4/5. ADC scan with per-query lookup tables
    val encoded = enc.localCheckpoint(false)
    val qCodes: Array[(Long, Array[Int])] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, v) => (id, sq8Quantize(v, maxAbs)) }
    val qB = spark.sparkContext.broadcast(qCodes)
    val cFinalB = spark.sparkContext.broadcast(cents)
    val cand = encoded.as[(Long, Array[Int])].mapPartitions { rows =>
      val qs = qB.value
      val cs = cFinalB.value
      val mm = cs.length
      val kk = cs(0).length
      val sdim = cs(0)(0).length
      // ADC tables: lut(qi)(sub*kk + c) = exact L2(query subvec, centroid)
      val lut = Array.tabulate(qs.length, mm * kk) { (qi, i) =>
        val sub = i / kk; val c = i % kk
        val qv = qs(qi)._2
        val cc = cs(sub)(c)
        var d2 = 0L
        var sd = 0
        while (sd < sdim) {
          val x = (qv(sub * sdim + sd) - cc(sd)).toLong; d2 += x * x; sd += 1
        }
        d2
      }
      // max-heap under (adc DESC, id DESC): evicting the head drops the
      // globally-worst candidate under the (adc ASC, id ASC) preference
      val ord = new java.util.Comparator[(Long, Long)] {
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(b._2, a._2)
        }
      }
      val best = Array.fill(qs.length)(
        new java.util.PriorityQueue[(Long, Long)](candidates + 1, ord))
      rows.foreach { case (id, pq) =>
        var qi = 0
        while (qi < qs.length) {
          if (qs(qi)._1 != id) {
            val t = lut(qi)
            var adc = 0L
            var s = 0
            while (s < mm) { adc += t(s * kk + pq(s)); s += 1 }
            val h = best(qi)
            h.add((adc, id))
            if (h.size() > candidates) h.poll()
          }
          qi += 1
        }
      }
      best.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        Iterator.continually(h.poll()).takeWhile(_ != null)
          .map { case (adc, id) => (qid, id, adc) }
      }
    }.toDF("query_id", "neighbor_id", "adc")
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val cut = cand.withColumn("r", row_number().over(wC))
      .filter(col("r") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    val rerank = cut
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), Seq("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rerank.withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** ANN quality-evaluation harness: recall@k of every approximate
    * pipeline in the family ([[ivfTopK]], [[lshTopK]], [[pqTopK]],
    * [[sq8TopK]]) against the exact [[bruteForceTopK]] ground truth on
    * the same query set, plus the brute-force arm itself as the
    * recall=1000 control. "Measure, don't guess" for the index layer:
    * before an IVF/PQ config ships against 10^11 vectors, this census
    * says what the candidate cut actually costs in neighbors lost.
    *
    * Scale shape: the truth table is computed ONCE and
    * localCheckpoint'd (nQ·k rows — tiny), so the multi-consumer
    * re-computation trap doesn't bite; each approximate pipeline is
    * scanned exactly once, LEFT-joined against the checkpointed truth
    * (broadcast-sized), and collapsed to a 1-row aggregate before the
    * 5-row union. n_truth is a 1-row driver scalar. All outputs are
    * exact longs — recall_permille = hits*1000 div truth (integer
    * division, no IEEE anywhere). */
  def annRecall(corpus: DataFrame, k: Int = 5): DataFrame = {
    val queries = corpus.filter(col("vec_id") < 10)
    val truth = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false)
    val nTruth: Long = truth.count()
    val arms: Seq[(String, DataFrame)] = Seq(
      "bf"  -> truth,
      "ivf" -> ivfTopK(corpus, queries, k),
      "lsh" -> lshTopK(corpus, queries, k),
      "pq"  -> pqTopK(corpus, queries, k = k),
      "sq8" -> sq8TopK(corpus, queries, k))
    arms.map { case (name, approx) =>
      approx.select(col("query_id"), col("neighbor_id"))
        .join(truth.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_returned"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
        .select(lit(name).as("method"), col("n_returned"), col("n_hits"),
          lit(nTruth).as("n_truth"),
          expr(s"n_hits * 1000 div ${nTruth}L").as("recall_permille"))
    }.reduce(_.unionByName(_))
  }
}
