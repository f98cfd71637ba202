package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Sampling at 100 TB must be reproducible across reruns and engines —
  * `rand()`-based sampling changes membership per execution and per task
  * retry, which silently breaks dataset versioning. Here membership is a
  * pure function of the row's key: a row is kept iff
  * `bucket(key) < fraction * Buckets`, with the bucket derived from md5
  * (identical in every engine, unlike xxhash64) — so a sample is stable
  * under retries, repartitioning, incremental re-runs, and independent
  * recomputation by other systems. Pure codegen'd Column expressions: the
  * sample is a FILTER, pushed down like any predicate, no shuffle.
  */
object Sampling {

  /** Bucket granularity: fractions resolve to 1/10000 precision. */
  val Buckets = 10000

  /** Uniform bucket in [0, Buckets) from the key's md5 (first 15 hex
    * chars = 60 bits, far above the bucket modulus, so bias is
    * negligible).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % Buckets

  /** Deterministic Bernoulli sample: keep ~`fraction` of rows, selected
    * by key hash.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit((fraction * Buckets).toLong))

  /** Deterministic stratified sample: per-stratum keep fractions (e.g.
    * downsample dominant languages, keep all of rare ones), unlisted
    * strata fall back to `defaultFraction`. The quota expression is a
    * literal CASE chain — constant-folded, codegen'd, pushdown-friendly.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val quota = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < quota)
  }
}
