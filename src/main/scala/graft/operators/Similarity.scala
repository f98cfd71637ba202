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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-0.5, 0.5).
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(1000L)).cast("double") / 1000.0) - 0.5

  /** LSH bucket id: sign bits of `numPlanes` random-hyperplane dot
    * products packed into a long.
    */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(numPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") * planeComponent(p, d)),
          lit(0.0), (a, v) => a + v)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      })

  /** Approximate nearest neighbors: restrict the cosine scan to the
    * query's hyperplane bucket (plus probes differing in one bit —
    * multi-probe LSH), then exact-rank within candidates. At scale this
    * turns a full-corpus scan into a bucket-pruned one; the bucket column
    * can be precomputed and partition-pruned on storage.
    */
  def annTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val q = typedLit(query)
    val bucketed = df.withColumn("_bucket", lshBucket(col(vecCol), numPlanes))
    val qBucket = bucketed.sparkSession.range(1)
      .select(lshBucket(q, numPlanes).as("b")).head.getLong(0)
    // multi-probe: exact bucket + all 1-bit flips
    val probes = qBucket +: (0 until numPlanes).map(b => qBucket ^ (1L << b))
    bucketed
      .filter(col("_bucket").isin(probes: _*))
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
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), numPlanes))
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
