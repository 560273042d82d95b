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

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries` is SMALL (broadcast); corpus scans once, no shuffle
    * until the final per-query top-k (tiny). Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").crossJoin(broadcast(queries).as("q"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Random-hyperplane signature: bit i = sign(v · r_i), hyperplanes
    * drawn from a seeded splitmix-style integer stream (deterministic,
    * no RNG object). nBits ≤ 32. */
  def lshSignature(v: Column, dim: Int, nBits: Int, seed: Long): Column = {
    def comp(bit: Int, d: Int): Double = {
      // deterministic pseudo-gaussian-ish component in [-1, 1)
      var z = seed + bit.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    val bits = (0 until nBits).map { bit =>
      val dot = (0 until dim).map { d =>
        element_at(v, d + 1).cast("double") * lit(comp(bit, d))
      }.reduce(_ + _)
      when(dot >= 0, lit(1 << bit)).otherwise(lit(0))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: both sides signed with the same hyperplanes;
    * candidates share a bucket (multi-probe via nTables different
    * seeds); exact cosine re-rank inside the candidate set only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 12, nTables: Int = 4): DataFrame = {
    def signed(df: DataFrame, idCol: String): DataFrame = {
      val tables = (0 until nTables).map { t =>
        struct(lit(t).as("table"),
          lshSignature(col("embedding"), dim, nBits, seed = 42L + t * 1000003L).as("sig"))
      }
      df.select(col(idCol), col("embedding"),
        explode(array(tables: _*)).as("ts"))
        .select(col(idCol), col("embedding"), col("ts.table"), col("ts.sig"))
    }
    val c = signed(corpus, "vec_id")
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumnRenamed("embedding", "c_emb")
    val q = signed(broadcast(queries), "vec_id")
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
    val cand = c.join(q, Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Exact variant
    * for verification (O(n²) — at scale use lsh buckets first). Output
    * is id pairs only (no float column) to keep results hash-stable. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(cosine(col("a_emb"), col("b_emb")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }
}
