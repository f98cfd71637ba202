package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims

import graft.functions.{CosineColsExpr, CosineConstExpr, IvfCellExpr, LshBucketExpr, VectorExpressions}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (random-hyperplane) variant as the 100 TB scale path.
  *
  * Hot-path arithmetic runs through the native Catalyst expressions in
  * [[graft.functions.VectorExpressions]] — tight generated loops that
  * stay inside whole-stage codegen (the `aggregate`/`zip_with` and
  * unrolled-tree formulations both fall back to interpreted evaluation;
  * the unrolled 512-term LSH tree was a measured 21× regression).
  * Hyperplanes are derived from a splitmix64 of (plane, dim) so the
  * whole pipeline is deterministic with zero driver-side randomness.
  */
object Similarity {

  /** Sequential double-precision dot product of two array columns —
    * the `functions._` formulation, kept for composability in plans
    * that need the raw dot product (not on the hot paths).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two vector columns: one generated pass over
    * both arrays (dot, |a|², |b|² accumulated together). NULL if the
    * lengths differ or an element is NULL, like the zip_with version.
    */
  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineColsExpr(Shims.expression(a), Shims.expression(b)))

  /** Cosine similarity against a CONSTANT query vector — |q| is folded
    * in on the driver, the scan does one multiply-add loop per row.
    */
  def cosineToQuery(a: Column, query: Seq[Double]): Column =
    Shims.column(CosineConstExpr(Shims.expression(a), query))

  /** Exact top-k by cosine similarity to a constant query vector.
    * One narrow scan + a k-row total ordering (TakeOrderedAndProject —
    * no full sort at scale).
    */
  def bruteForceTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineToQuery(col(vecCol), query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic hyperplane component for (plane, dim) in [-0.5, 0.5).
    * Delegates to [[VectorExpressions.planeComponent]] — the single
    * source of truth shared with [[LshBucketExpr]], so buckets stored at
    * ingest and buckets computed at query time can never diverge.
    */
  def planeComponent(plane: Int, dim: Int): Double =
    VectorExpressions.planeComponent(plane, dim)

  /** LSH bucket id of a `dim`-element vector column: sign bits of
    * `numPlanes` hyperplane projections packed into a long, computed by
    * [[LshBucketExpr]] — a tight generated planes×dims loop over a
    * referenced constant matrix, fully inside whole-stage codegen.
    * Sequential accumulation matches [[queryBucket]]'s driver-side fold
    * bit-for-bit.
    */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int): Column =
    Shims.column(LshBucketExpr(Shims.expression(vec), numPlanes, dim))

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
    * (see [[annTopKPrebucketed]]). Pass `dim` when the caller knows it;
    * the default probes the first row (one tiny Spark job).
    */
  def withLshBucket(
      df: DataFrame, vecCol: String, numPlanes: Int,
      bucketCol: String = "lsh_bucket", dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(df, vecCol)
    df.withColumn(bucketCol, lshBucket(col(vecCol), numPlanes, d))
  }

  private def vectorDim(df: DataFrame, vecCol: String): Int = {
    // probe past null/empty vectors (a bare head() would NPE on a null
    // first row and NoSuchElement on an empty frame)
    val rows = df.select(size(col(vecCol)).as("_d"))
      .filter(col("_d").isNotNull && col("_d") > 0).limit(1).collect()
    require(rows.nonEmpty,
      s"cannot infer the vector dimension of '$vecCol': no non-null " +
        "vectors in the frame — pass dim explicitly")
    rows.head.getInt(0)
  }

  /** Approximate nearest neighbors: restrict the cosine scan to the
    * query's hyperplane bucket (plus probes differing in one bit —
    * multi-probe LSH), then exact-rank within candidates. Buckets are
    * computed inline here (dim comes from the query vector — no probe
    * job); at scale, store them once with [[withLshBucket]] and query
    * through [[annTopKPrebucketed]].
    */
  def annTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = withLshBucket(df, vecCol, numPlanes, "_bucket", dim = query.size)
    annTopKPrebucketed(bucketed, vecCol, idCol, "_bucket", query, k, numPlanes)
  }

  /** The multi-probe set for a query: its exact bucket plus every 1-bit
    * flip. Exposed so callers can prune storage (partition dirs, file
    * manifests) on these values before the scan even starts.
    */
  def probeBuckets(query: Seq[Double], numPlanes: Int): Seq[Long] = {
    val qBucket = queryBucket(query, numPlanes)
    qBucket +: (0 until numPlanes).map(b => qBucket ^ (1L << b))
  }

  /** ANN over a corpus whose bucket column is already stored: the scan
    * filters on the bucket value (pushed to parquet / pruned on storage
    * layout), computes exact cosine only within the probed buckets, and
    * exact-ranks the survivors.
    */
  def annTopKPrebucketed(
      df: DataFrame, vecCol: String, idCol: String, bucketCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val probes = probeBuckets(query, numPlanes)
    df.filter(col(bucketCol).isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ---------------- IVF (coarse-quantizer) ANN ----------------
  // The second scale path next to hyperplane LSH: partition the corpus
  // into K cells around centroid vectors, probe only the nProbe cells
  // nearest the query, exact-rank within them. Per-query cost is
  // O(probed cells), and like the LSH bucket the cell id can be
  // materialized as a storage partition column so pruning happens at the
  // file-manifest level. Centroid seeding is DETERMINISTIC (a fixed set
  // of corpus vectors) so the same pipeline is reproducible across
  // engines and retries; [[lloydRefine]] is the standard k-means
  // refinement for production recall (ref pattern: the reference's
  // bloom-index range pruning — prune candidates on stored coarse
  // structure, verify exactly; SparkHoodieBloomIndex.java:110-140).

  /** Deterministic centroid seeds: the embeddings of the `k` smallest
    * `idCol` values. At 100 TB this is a k-row TakeOrdered, not a scan
    * collect; production quality comes from [[lloydRefine]] afterwards.
    */
  def seedCentroids(
      df: DataFrame, vecCol: String, idCol: String, k: Int): Seq[Seq[Double]] =
    df.select(col(idCol), col(vecCol))
      // null vectors / null elements among the k smallest ids would NPE
      // the collect — the downstream expressions tolerate them, seeding
      // must too
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .orderBy(col(idCol)).limit(k)
      .collect().toSeq
      .map(_.getSeq[Any](1).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toSeq)

  /** Standard Lloyd iterations over the corpus: assign every vector to
    * its cell, recompute each cell's mean per dimension — as ONE regular
    * `groupBy(cell)` over a fixed-width set of per-dimension sums. The
    * map side pre-aggregates K×(dim+1) partial values per partition, so
    * the shuffle per iteration carries O(partitions × K × dim) doubles —
    * independent of the corpus size (the earlier posexplode formulation
    * shuffled dim× the corpus row count per iteration). The K×dim result
    * collected to the driver is planning metadata, not data; a cell that
    * loses all members keeps its previous centroid.
    */
  def lloydRefine(
      df: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]], iters: Int = 2): Seq[Seq[Double]] = {
    var cs = centroids
    val dim = cs.head.size
    for (_ <- 0 until iters) {
      val means = refineMeans(df, vecCol, cs)
        .collect()
        .flatMap { r => // belt: a null cell group must never NPE the refine
          if (r.isNullAt(0)) None
          else {
            val n = r.getLong(1).toDouble
            Some(r.getInt(0) -> (0 until dim).map(i => r.getDouble(2 + i) / n))
          }
        }.toMap
      cs = cs.indices.map(k => means.getOrElse(k, cs(k)))
    }
    cs
  }

  /** One refine iteration's aggregation: `(cell, count, sum per dim)` —
    * exposed for plan inspection in tests (must stay a plain hash
    * aggregate with NO row-exploding Generate below it).
    */
  private[graft] def refineMeans(
      df: DataFrame, vecCol: String, cs: Seq[Seq[Double]]): DataFrame = {
    val dim = cs.head.size
    val sums = (0 until dim).map(i =>
      sum(element_at(col(vecCol), i + 1).cast("double")).as(s"_s$i"))
    // null or wrong-dim vectors are excluded up front: dividing a
    // null-skipping sum by count(*) would skew the cell mean toward 0 for
    // every dimension such a row is missing (the posexplode formulation
    // excluded missing elements per dimension; whole-row exclusion is the
    // sound fixed-width equivalent)
    // null ELEMENTS are excluded too: they make IvfCellExpr return a
    // null cell, whose null-keyed group would NPE the driver collect
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
        !exists(col(vecCol), _.isNull))
      .select(ivfCell(col(vecCol), cs).as("cell"), col(vecCol))
      .groupBy("cell")
      .agg(count(lit(1)).as("_n"), sums: _*)
  }

  /** IVF cell of a vector column: argmax-cosine centroid index, computed
    * by [[IvfCellExpr]] — one generated K×dim loop, ties to the lowest
    * index, bit-for-bit identical to [[ivfCellOf]].
    */
  def ivfCell(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Shims.column(IvfCellExpr(Shims.expression(vec), centroids))

  /** Driver-side twin of [[ivfCell]] for constant vectors. */
  def ivfCellOf(v: Seq[Double], centroids: Seq[Seq[Double]]): Int = {
    val mat = VectorExpressions.scaledCentroids(centroids)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var k = 0
    while (k < mat.length) {
      val row = mat(k)
      var dot = 0.0
      var d = 0
      while (d < row.length) { dot += v(d) * row(d); d += 1 }
      if (dot > bestScore) { bestScore = dot; best = k }
      k += 1
    }
    best
  }

  /** The `nProbe` cells nearest the query, best first (ties to the
    * lowest index) — pure driver arithmetic, same scoring as the stored
    * cells. Exposed so callers can prune storage on the values.
    */
  def ivfProbeCells(
      query: Seq[Double], centroids: Seq[Seq[Double]], nProbe: Int): Seq[Int] = {
    val mat = VectorExpressions.scaledCentroids(centroids)
    mat.indices
      .map { k =>
        val row = mat(k)
        var dot = 0.0
        var d = 0
        while (d < row.length) { dot += query(d) * row(d); d += 1 }
        (k, dot)
      }
      .sortBy { case (k, s) => (-s, k) }
      .take(nProbe).map(_._1)
  }

  /** Materialize the IVF cell as a real column — written as a partition
    * or cluster column at ingest, it prunes queries on storage layout
    * exactly like [[withLshBucket]].
    */
  def withIvfCell(
      df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]],
      cellCol: String = "ivf_cell"): DataFrame =
    df.withColumn(cellCol, ivfCell(col(vecCol), centroids))

  /** IVF ANN top-k: restrict the exact cosine scan to the `nProbe`
    * nearest cells, computed inline. At scale, store the cell with
    * [[withIvfCell]] and query through [[ivfTopKPrestored]].
    */
  def ivfTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int,
      centroids: Seq[Seq[Double]], nProbe: Int = 2): DataFrame = {
    val probes = ivfProbeCells(query, centroids, nProbe)
    df.filter(ivfCell(col(vecCol), centroids).isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF ANN over a corpus whose cell column is already stored: the scan
    * filters on the stored value (pushed down / pruned on layout) and
    * never recomputes assignments at query time.
    */
  def ivfTopKPrestored(
      df: DataFrame, vecCol: String, idCol: String, cellCol: String,
      query: Seq[Double], k: Int,
      centroids: Seq[Seq[Double]], nProbe: Int = 2): DataFrame = {
    val probes = ivfProbeCells(query, centroids, nProbe)
    df.filter(col(cellCol).isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("sim"))
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
    * bucket granularity, not the corpus size. Pass `dim` when known to
    * skip the one-row probe job.
    */
  def cosineNearDups(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, numPlanes: Int = 12, dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(df, vecCol)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), numPlanes, d))
    val probes = sigs.withColumn("bucket",
      explode(array(col("bucket") +:
        (0 until numPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)))
    val a = probes.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sigs.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      // dedup multi-probe hits on the ID PAIR alone: a distinct() over
      // the vectors too would shuffle and compare 2×dim doubles per
      // candidate for no semantic gain (each id maps to one vector)
      .select("id_a", "id_b", "v_a", "v_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
