package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (random-hyperplane) variant as the 100 TB scale path.
  *
  * Dot products are `aggregate`/`zip_with` expression trees (codegen'd,
  * no UDF). Hyperplanes are derived from `xxhash64(plane, dim)` so the
  * whole pipeline is deterministic with zero driver-side randomness.
  */
object Similarity {

  /** Sequential double-precision dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * greatest(norm(b), lit(1e-12)))

  /** Exact top-k by cosine similarity to a constant query vector.
    * One narrow scan + a k-row total ordering (TakeOrderedAndProject —
    * no full sort at scale).
    */
  def bruteForceTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** splitmix64 finalizer — the deterministic seed for hyperplane
    * components (identical on driver and executors, no Spark evaluation
    * needed to reproduce it).
    */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic hyperplane component for (plane, dim) in [-0.5, 0.5).
    * A plan-time CONSTANT: the hot path multiplies stored floats by
    * literals instead of evaluating hash expressions per element.
    */
  def planeComponent(plane: Int, dim: Int): Double =
    (java.lang.Math.floorMod(
      splitmix64(plane.toLong * 1000003L + dim), 1000L).toDouble / 1000.0) - 0.5

  /** LSH bucket id of a `dim`-element vector column: sign bits of
    * `numPlanes` hyperplane projections packed into a long, as a fully
    * UNROLLED expression tree (planes x dim constant multiply-adds).
    * Spark does not codegen higher-order array functions, so the previous
    * aggregate∘zip_with formulation ran interpreted per row — the
    * unrolled tree stays inside whole-stage codegen and needs no
    * per-element hash evaluation. Left-assoc addition matches
    * [[queryBucket]]'s driver-side fold bit-for-bit.
    */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { p =>
      val proj = (0 until dim)
        .map(d => element_at(vec, d + 1).cast("double") * lit(planeComponent(p, d)))
        .reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket of a constant query vector — pure driver arithmetic, same
    * fold order as [[lshBucket]].
    */
  def queryBucket(query: Seq[Double], numPlanes: Int): Long =
    (0 until numPlanes).map { p =>
      val proj = query.zipWithIndex
        .map { case (x, d) => x * planeComponent(p, d) }
        .foldLeft(0.0)(_ + _)
      if (proj > 0) 1L << p else 0L
    }.sum

  /** Materialize the LSH bucket as a real column — THE 100 TB path: at
    * ingest time the corpus is written with its bucket (ideally
    * bucketed/partitioned by it on storage), and queries prune on the
    * stored value instead of recomputing projections per query
    * (see [[annTopKPrebucketed]]).
    */
  def withLshBucket(
      df: DataFrame, vecCol: String, numPlanes: Int,
      bucketCol: String = "lsh_bucket"): DataFrame = {
    val dim = vectorDim(df, vecCol)
    df.withColumn(bucketCol, lshBucket(col(vecCol), numPlanes, dim))
  }

  private def vectorDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head.getInt(0)

  /** Approximate nearest neighbors: restrict the cosine scan to the
    * query's hyperplane bucket (plus probes differing in one bit —
    * multi-probe LSH), then exact-rank within candidates. Buckets are
    * computed inline here; at scale, store them once with
    * [[withLshBucket]] and query through [[annTopKPrebucketed]].
    */
  def annTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = withLshBucket(df, vecCol, numPlanes, "_bucket")
    annTopKPrebucketed(bucketed, vecCol, idCol, "_bucket", query, k, numPlanes)
  }

  /** ANN over a corpus whose bucket column is already stored: the scan
    * filters on the bucket value (pushed to parquet / pruned on storage
    * layout), computes exact cosine only within the probed buckets, and
    * exact-ranks the survivors.
    */
  def annTopKPrebucketed(
      df: DataFrame, vecCol: String, idCol: String, bucketCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val q = typedLit(query)
    val qBucket = queryBucket(query, numPlanes)
    // multi-probe: exact bucket + all 1-bit flips
    val probes = qBucket +: (0 until numPlanes).map(b => qBucket ^ (1L << b))
    df.filter(col(bucketCol).isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via bucket join with
    * MULTI-PROBE: side A is exploded into its own bucket plus every
    * 1-bit-flip probe, so a pair is a candidate if its buckets differ in
    * at most one plane (recall for a pair at angle θ rises from p^n to
    * p^n + n·p^(n-1)(1-p), p = 1-θ/π). Exact cosine then filters to
    * >= threshold — precision is always exact, bucketing affects recall
    * only. The join stays an equi-join (never all-pairs): candidate
    * volume is (numPlanes+1)·Σ bucket_size², bounded at scale by the
    * bucket granularity, not the corpus size.
    */
  def cosineNearDups(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, numPlanes: Int = 12): DataFrame = {
    val dim = vectorDim(df, vecCol)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), numPlanes, dim))
    val probes = sigs.withColumn("bucket",
      explode(array(col("bucket") +:
        (0 until numPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)))
    val a = probes.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sigs.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
