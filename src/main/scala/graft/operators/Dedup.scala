package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.
  *
  * Design for 100 TB: every variant is shuffle-bounded by banding/
  * bucketing — candidate generation is an equi-join on (band, signature)
  * buckets, never an all-pairs comparison; exact-verification joins touch
  * candidate pairs only. No UDFs: MinHash signatures are built from
  * `xxhash64` + higher-order array functions, fully codegen'd.
  */
object Dedup {

  /** Exact dedup on normalized text: keep the lowest-id row per distinct
    * content. One hash-shuffle (the groupBy/window key is the normalized
    * text itself, so skew == true duplicate mass).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(normText(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the document's shingle set. Pure expression:
    * shingles -> transform(seed-range, s -> min over hashes).
    */
  private def minhashSig(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(shingles, s => xxhash64(s, seed))))

  /** MinHash + LSH near-duplicate pairs.
    * Pipeline (the standard shingle->minhash->band->bucket-join shape):
    *  1. per doc: shingle set, `numHashes` minhashes, `bands` band keys
    *  2. explode band keys; equi-join docs sharing a (band, key) bucket
    *  3. estimate Jaccard as matching-minhash fraction; keep >= threshold
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = df
      .select(col(idCol).as("id"), charShingles(col(textCol), shingleLen).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), numHashes))
      .withColumn("bands", transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b)))
      .select(col("id"), col("sig"), posexplode(col("bands")).as(Seq("band", "bkey")))

    val a = sigs.select(col("band"), col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("band"), col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash of the token set: bit i is the sign of the sum of
    * (+1/-1) votes from each token's hash bit i.
    */
  def simhash(c: Column): Column = {
    val toks = split(normText(c), " ")
    val hashes = transform(toks, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val vote = aggregate(hashes, lit(0L), (a, h) =>
          a + when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))
      })
  }

  /** SimHash near-dups: docs whose signatures agree on >= 64 - maxBits
    * bits. Candidate buckets = 4 x 16-bit chunks (any pair within
    * hamming distance <= 3 shares at least one chunk).
    */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String, maxBits: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .withColumn("chunk", explode(sequence(lit(0), lit(3))))
      .withColumn("ckey",
        call_function("shiftright", col("sig"), col("chunk") * 16).bitwiseAND(0xFFFFL))
    val a = sigs.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxBits)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs found via a
    * shared-shingle bucket join (inverted-index style): explode shingles,
    * equi-join on the shingle, count shared, |A∪B| = |A|+|B|-shared.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleLen: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      charShingles(col(textCol), shingleLen).as("sh"))
      .withColumn("n", size(col("sh")))
    val exploded = sh.select(col("id"), col("n"), explode(col("sh")).as("s"))
    val a = exploded.select(col("s"), col("id").as("id_a"), col("n").as("n_a"))
    val b = exploded.select(col("s"), col("id").as("id_b"), col("n").as("n_b"))
    a.join(b, "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
