package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Both exact-verify plans of the near-dup operators must produce
  * IDENTICAL pairs: the ARRAY path (per-pair hash arrays +
  * array_intersect — what small/medium volumes select) and the EXPLODED
  * path (scalar (pair, hash) equi-join + count — what cluster-quadratic
  * volumes select; the only plan that survives the sf3 bench at stock
  * heap). The selector is volume-based, so ordinary tests and oracle
  * runs only ever exercise the array path — this spec forces the
  * exploded plan on the same corpus and pins plan-equivalence, the
  * correctness gate for the path that actually runs at 100 TB.
  */
class DedupVerifyPathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-dedup-path-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val PathProp = "graft.dedup.array.verify.max.elements"
  private val ChunkProp = "graft.dedup.exploded.verify.chunk.elements"

  private def withExplodedPath[T](f: => T): T = {
    System.setProperty(PathProp, "0")
    try f finally System.clearProperty(PathProp)
  }

  /** Force the exploded path AND a tiny chunk bound, so the fixture
    * corpus runs the disk-bounded multi-chunk plan (what sf10-class
    * volumes select).
    */
  private def withChunkedPath[T](f: => T): T = {
    System.setProperty(PathProp, "0")
    System.setProperty(ChunkProp, "1000")
    try f finally {
      System.clearProperty(PathProp)
      System.clearProperty(ChunkProp)
    }
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      // bit-exact doubles: both paths compute the same integer ratio
      r.getDouble(2))).toSet

  test("minhash near-dups: exploded verify ≡ array verify, bit-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaArray = pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id"))
    val viaExploded = withExplodedPath(
      pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id")))
    assert(viaArray.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(viaExploded === viaArray)
  }

  test("CHUNKED exploded verify ≡ array verify, bit-exact (disk-bounded plan)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaArray = pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id"))
    val viaChunked = withChunkedPath(
      pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id")))
    assert(viaArray.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(viaChunked === viaArray)
  }

  test("CHUNKED exploded verify under a RELIABLE checkpoint dir ≡ array verify") {
    // with sc.setCheckpointDir set (the cluster deployment shape), chunk
    // lineage cuts go through reliable checkpoint — survives executor
    // loss — instead of localCheckpoint; results must stay bit-exact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaArray = pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id"))
    // the shared session keeps the dir for the rest of the JVM (no unset
    // API) — harmless: later chunked runs just checkpoint reliably too
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val viaReliable = withChunkedPath(
      pairsOf(Dedup.minhashNearDups(docs, "text", "doc_id")))
    assert(viaArray.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(viaReliable === viaArray)
  }

  test("ngram jaccard pairs: exploded verify ≡ array verify, bit-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaArray = pairsOf(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.8))
    val viaExploded = withExplodedPath(pairsOf(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.8)))
    assert(viaArray.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(viaExploded === viaArray)
  }

  test("exploded path drops zero-intersection candidates exactly like the array path") {
    import spark.implicits._
    // two docs sharing NOTHING but forced into one candidate bucket via
    // identical lengths would only differ if the inner-join dropped the
    // pair vs the array path computing jaccard=0 — both must exclude it
    val docs = Seq(
      (1L, "aaaaaaaaaabbbbbbbbbb"),
      (2L, "ccccccccccdddddddddd"),
      (3L, "aaaaaaaaaabbbbbbbbbb"))
      .toDF("doc_id", "text")
    val viaArray = pairsOf(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.1,
        maxShingleDf = 100))
    val viaExploded = withExplodedPath(pairsOf(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.1,
        maxShingleDf = 100)))
    assert(viaArray === Set((1L, 3L, 1.0)))
    assert(viaExploded === viaArray)
  }

  test("verify entry points reject a non-positive jaccard threshold") {
    import spark.implicits._
    // the two verify plans diverge at threshold <= 0 (the exploded inner
    // join never materializes zero-intersection pairs) — the engine must
    // refuse the parameter instead of silently picking a side
    val docs = Seq((1L, "aaaaaaaaaabbbbbbbbbb"), (2L, "aaaaaaaaaabbbbbbbbbb"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.0,
        maxShingleDf = 100).collect())
    assert(e.getMessage.contains("threshold"))
  }
}
