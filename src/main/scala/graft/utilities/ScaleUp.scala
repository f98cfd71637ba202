package graft.utilities

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a test-data directory: replicates every
  * table with key-space shifts that PRESERVE referential integrity
  * (replica i's orders point at replica i's customers, etc.), so the
  * same bench queries run unmodified at 10×/100× the rows. Dimension
  * tables (region, nation) are copied once — like TPC-H, they do not
  * grow with scale factor. Text and embeddings are perturbed per
  * replica (a replica-tag token / deterministic per-dimension noise) so
  * dedup and similarity operators see near-duplicates across replicas
  * instead of degenerate exact clones.
  *
  * Usage: runMain graft.utilities.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  private def shift(df: DataFrame, keyCols: Map[String, Long], i: Int): DataFrame =
    keyCols.foldLeft(df) { case (d, (c, space)) =>
      d.withColumn(c, col(c) + lit(i * space))
    }

  private def keySpace(df: DataFrame, c: String): Long =
    df.agg(max(col(c).cast("long"))).head.getLong(0) + 1L

  /** Deterministic Fisher–Yates permutation of a–z keyed by the replica
    * index (splitmix64 stream). Never the identity in practice (odds
    * ~1/26!); `scale` asserts pairwise distinctness across replicas.
    */
  private def replicaPerm(i: Int): String = {
    val arr = ('a' to 'z').toArray
    var s = i.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    for (k <- arr.length - 1 to 1 by -1) {
      val j = math.floorMod(next(), k + 1).toInt
      val t = arr(k); arr(k) = arr(j); arr(j) = t
    }
    new String(arr)
  }

  def scale(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    def T(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimension tables: fixed size at any scale factor
    write("region", T("region"))
    write("nation", T("nation"))

    val cust = T("customer"); val C = keySpace(cust, "c_custkey")
    val supp = T("supplier"); val S = keySpace(supp, "s_suppkey")
    val part = T("part"); val P = keySpace(part, "p_partkey")
    val ord = T("orders"); val O = keySpace(ord, "o_orderkey")
    val li = T("lineitem")
    val ev = T("events")
    val E = keySpace(ev, "event_id"); val U = keySpace(ev, "user_id")
    val doc = T("documents"); val D = keySpace(doc, "doc_id")
    val emb = T("embeddings"); val V = keySpace(emb, "vec_id")

    def reps(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => f(df, i)).reduce(_ unionByName _)

    write("customer", reps(cust, (d, i) => shift(d, Map("c_custkey" -> C), i)))
    write("supplier", reps(supp, (d, i) => shift(d, Map("s_suppkey" -> S), i)))
    write("part", reps(part, (d, i) => shift(d, Map("p_partkey" -> P), i)))
    write("orders", reps(ord, (d, i) =>
      shift(d, Map("o_orderkey" -> O, "o_custkey" -> C), i)))
    write("lineitem", reps(li, (d, i) =>
      shift(d, Map("l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S), i)))
    write("events", reps(ev, (d, i) =>
      shift(d, Map("event_id" -> E, "user_id" -> U), i)))
    // substitute the alphabet per replica so cross-replica copies are
    // textually UNRELATED (shingle overlap ~0): each replica keeps the
    // base corpus's internal duplicate structure, so dedup and near-dup
    // workloads scale ~linearly with rows, the way a real N× corpus
    // does. (A first cut appended a replica tag instead — that made
    // every doc 9 near-duplicates and inflated the minhash verify join
    // quadratically, a property of the synthetic data, not of N× real
    // data. A second cut rotated a 10-letter alphabet by i%10 — the
    // identity rotation at i=10,20,… reintroduced exact cross-replica
    // clones above factor 10.) A full-alphabet permutation keyed by the
    // replica index is injective for ANY factor (enforced below), and
    // two distinct random permutations agree on a letter with
    // probability ~1/26, so a 5-char shingle survives both with
    // probability ~26⁻⁵ — cross-replica Jaccard stays ~0.
    val alpha = ('a' to 'z').mkString
    val perms = (0 until n).map(i => if (i == 0) alpha else replicaPerm(i))
    require(perms.distinct.size == n,
      s"replica alphabet permutations must be pairwise distinct (n=$n)")
    write("documents", reps(doc, (d, i) =>
      shift(d, Map("doc_id" -> D), i)
        .withColumn("text",
          if (i == 0) col("text") else translate(col("text"), alpha, perms(i)))))
    // deterministic per-(vector, dimension, replica) noise keeps replica
    // vectors close-but-not-parallel (a pure scalar multiple would leave
    // cosine distances exactly degenerate)
    write("embeddings", reps(emb, (d, i) =>
      shift(d, Map("vec_id" -> V), i)
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> " +
            s"cast(x + pmod(hash(vec_id, j, $i), 1000) / 50000.0 as float))"))))
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factor) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, factor.toInt)
    spark.stop()
  }
}
