package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions
import graft.operators.Similarity

/** Parity + null-semantics checks for the native vector expressions
  * against the reference `functions._` formulations they replaced
  * (aggregate∘zip_with cosine, unrolled multiply-add LSH tree), on both
  * the codegen and interpreted evaluation paths.
  */
class VectorExpressionsSpec extends AnyFunSuite {

  // Must mirror TableFormatSpec's session config exactly: suites share one
  // JVM-wide default session via getOrCreate, and whichever suite runs
  // first fixes the extension list for both.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-vec-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dim = 16
  private val numPlanes = 6

  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(d =>
      (java.lang.Math.floorMod(
        VectorExpressions.splitmix64(seed * 7919L + d), 2001L) - 1000).toFloat / 1000f)

  private def corpus: DataFrame =
    (0 until 50).map(i => (i.toLong, vec(i))).toDF("id", "v")

  /** The pre-round-8 Column formulations, kept here as the parity oracle. */
  private def cosineColumns = {
    import org.apache.spark.sql.Column
    (a: Column, b: Column) => {
      val dot = aggregate(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      def nrm(c: Column) = sqrt(aggregate(
        zip_with(c, c, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      dot / (greatest(nrm(a), lit(1e-12)) * greatest(nrm(b), lit(1e-12)))
    }
  }

  private def lshBucketUnrolled(vecCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until numPlanes).map { p =>
      val proj = (0 until dim)
        .map(d => element_at(vecCol, d + 1).cast("double") *
          lit(VectorExpressions.planeComponent(p, d)))
        .reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def withCodegen[A](on: Boolean)(f: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    // CODEGEN_ONLY vs NO_CODEGEN forces the expression's doGenCode/eval paths
    val factoryKey = "spark.sql.codegen.factoryMode"
    val prevFactory = spark.conf.get(factoryKey, "FALLBACK")
    spark.conf.set(factoryKey, if (on) "CODEGEN_ONLY" else "NO_CODEGEN")
    try f finally {
      spark.conf.set(key, prev)
      spark.conf.set(factoryKey, prevFactory)
    }
  }

  for (codegen <- Seq(true, false)) {
    val mode = if (codegen) "codegen" else "interpreted"

    test(s"cosine_cols matches the zip_with formulation bit-for-bit [$mode]") {
      withCodegen(codegen) {
        val paired = corpus.as("a").crossJoin(corpus.limit(5).as("b"))
          .select($"a.id".as("ia"), $"b.id".as("ib"), $"a.v".as("va"), $"b.v".as("vb"))
        val got = paired
          .select($"ia", $"ib", Similarity.cosine($"va", $"vb").as("c"))
          .orderBy("ia", "ib").collect().map(_.getDouble(2))
        val want = paired
          .select($"ia", $"ib", cosineColumns($"va", $"vb").as("c"))
          .orderBy("ia", "ib").collect().map(_.getDouble(2))
        assert(got.length === want.length)
        got.zip(want).foreach { case (g, w) =>
          assert(java.lang.Double.doubleToLongBits(g) ===
            java.lang.Double.doubleToLongBits(w))
        }
      }
    }

    test(s"cosine_const matches cosine_cols against a literal query [$mode]") {
      withCodegen(codegen) {
        val q = vec(3).map(_.toDouble)
        val got = corpus
          .select($"id", Similarity.cosineToQuery($"v", q).as("c"))
          .orderBy("id").collect().map(_.getDouble(1))
        val want = corpus
          .select($"id", Similarity.cosine($"v", typedLit(q.map(_.toFloat))).as("c"))
          .orderBy("id").collect().map(_.getDouble(1))
        got.zip(want).foreach { case (g, w) =>
          assert(java.lang.Double.doubleToLongBits(g) ===
            java.lang.Double.doubleToLongBits(w))
        }
      }
    }

    test(s"lsh_bucket matches the unrolled expression tree and queryBucket [$mode]") {
      withCodegen(codegen) {
        val got = corpus
          .select($"id", Similarity.lshBucket($"v", numPlanes, dim).as("b"))
          .orderBy("id").collect().map(_.getLong(1))
        val want = corpus
          .select($"id", lshBucketUnrolled($"v").as("b"))
          .orderBy("id").collect().map(_.getLong(1))
        assert(got.toSeq === want.toSeq)
        // driver-side queryBucket agrees with the executor-side expression
        val driver = (0 until 50).map(i =>
          Similarity.queryBucket(vec(i).map(_.toDouble), numPlanes))
        assert(got.toSeq === driver)
      }
    }

    test(s"ivf_cell matches the driver-side twin; null gates hold [$mode]") {
      withCodegen(codegen) {
        val centroids = Seq(101, 102, 103, 104).map(s => vec(s).map(_.toDouble))
        val got = corpus
          .select($"id", Similarity.ivfCell($"v", centroids).as("c"))
          .orderBy("id").collect().map(_.getInt(1))
        val want = (0 until 50).map(i =>
          Similarity.ivfCellOf(vec(i).map(_.toDouble), centroids))
        assert(got.toSeq === want)
        val rows = Seq(
          (1L, Some(vec(1).map(Option(_)))),
          (2L, Some(vec(2).take(dim - 1).map(Option(_)))),
          (3L, None)).toDF("id", "v")
        val nn = rows
          .select($"id", Similarity.ivfCell($"v", centroids).as("c"))
          .orderBy("id").collect()
        assert(!nn(0).isNullAt(1) && nn(1).isNullAt(1) && nn(2).isNullAt(1))
      }
    }

    test(s"null semantics: short / null-element / null vectors yield NULL [$mode]") {
      withCodegen(codegen) {
        val rows = Seq(
          (1L, Some(vec(1).map(Option(_)))),                       // clean
          (2L, Some(vec(2).take(dim - 1).map(Option(_)))),         // short
          (3L, Some(vec(3).map(Option(_)).updated(4, None))),      // null element
          (4L, None)                                               // null array
        ).toDF("id", "v")
        val q = vec(0).map(_.toDouble)
        val got = rows.select($"id",
            Similarity.lshBucket($"v", numPlanes, dim).as("b"),
            Similarity.cosineToQuery($"v", q).as("cq"),
            Similarity.cosine($"v", typedLit(vec(0))).as("cc"))
          .orderBy("id").collect()
        def nulls(r: Row) = (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))
        assert(nulls(got(0)) === ((false, false, false)))
        assert(nulls(got(1)) === ((true, true, true)))
        assert(nulls(got(2)) === ((true, true, true)))
        assert(nulls(got(3)) === ((true, true, true)))
      }
    }
  }

  test("non-array input fails at analysis time, not execution time") {
    val df = Seq((1L, "oops")).toDF("id", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Similarity.lshBucket($"v", numPlanes, dim)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("ivf topk: planted copies are exact top-k under seeded and refined centroids") {
    val qv = vec(7)
    val copies = (0 until 8).map(i => (1000L + i, qv)).toDF("id", "v")
    val aug = corpus.union(copies)
    val q = qv.map(_.toDouble)
    val seeds = Similarity.seedCentroids(corpus, "v", "id", 5)
    val refined = Similarity.lloydRefine(corpus, "v", seeds, iters = 2)
    assert(refined.size === seeds.size && refined.head.size === dim)
    // 9 rows carry cosine exactly 1.0 (id 7 + the 8 copies), and exact
    // copies share the query's cell under ANY centroid set, so both the
    // inline and the prestored IVF paths must equal the exact ranking
    val want = Similarity.bruteForceTopK(aug, "v", "id", q, 9)
      .select("id").collect().map(_.getLong(0)).toSeq
    for (cs <- Seq(seeds, refined)) {
      val got = Similarity.ivfTopK(aug, "v", "id", q, 9, cs, nProbe = 2)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got === want)
      val stored = Similarity.withIvfCell(aug, "v", cs)
      val got2 = Similarity
        .ivfTopKPrestored(stored, "v", "id", "ivf_cell", q, 9, cs, nProbe = 2)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got2 === want)
    }
  }

  test("lloydRefine: exact cell means, deterministic, no row-exploding Generate") {
    val seeds = Similarity.seedCentroids(corpus, "v", "id", 5)
    val r1 = Similarity.lloydRefine(corpus, "v", seeds, iters = 1)
    assert(r1 === Similarity.lloydRefine(corpus, "v", seeds, iters = 1))

    // the refined centroids are the exact per-cell means (driver oracle)
    val rows = corpus.collect().map(r =>
      Similarity.ivfCellOf(r.getSeq[Float](1).map(_.toDouble), seeds) ->
        r.getSeq[Float](1).map(_.toDouble))
    val want = seeds.indices.map { k =>
      val members = rows.filter(_._1 == k).map(_._2)
      if (members.isEmpty) seeds(k)
      else (0 until dim).map(d => members.map(_(d)).sum / members.size)
    }
    r1.zip(want).foreach { case (got, w) =>
      got.zip(w).foreach { case (g, x) => assert(math.abs(g - x) < 1e-9) }
    }

    // one fixed-width aggregate: the iteration plan must NOT multiply the
    // corpus row count by dim (the old posexplode shape did)
    val plan = Similarity.refineMeans(corpus, "v", seeds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("lloydRefine: null and wrong-dim vectors are excluded from cell means") {
    val seeds = Similarity.seedCentroids(corpus, "v", "id", 5)
    val clean = Similarity.lloydRefine(corpus, "v", seeds, iters = 1)
    // a null vector and a truncated one would each skew some cell's mean
    // toward 0 if counted in the denominator without contributing sums
    val dirty = corpus.union(Seq(
      (9001L, null.asInstanceOf[Array[Float]]),
      (9002L, Array(1.0f, 2.0f))).toDF("id", "v"))
    val got = Similarity.lloydRefine(dirty, "v", seeds, iters = 1)
    clean.zip(got).foreach { case (c, g) =>
      c.zip(g).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("wordNgrams: normalization, short texts, and whitespace collapse") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "The quick  brown\tfox"), // mixed whitespace collapses
      (2L, "solo"),                  // < n tokens -> empty
      (3L, ""),                      // empty -> empty
      (4L, "  A  a B  ")             // trim + lowercase
    ).toDF("id", "text")
    val got = rows
      .select($"id", TextFunctions.wordNgrams($"text", 2).as("g"))
      .orderBy("id").collect()
      .map(r => r.getSeq[String](1).toList)
    assert(got(0) === List("the quick", "quick brown", "brown fox"))
    assert(got(1) === Nil)
    assert(got(2) === Nil)
    assert(got(3) === List("a a", "a b"))
  }

  test("ann plan: bucket filter + cosine stay inside WholeStageCodegen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_").toString
    corpus.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val q = vec(0).map(_.toDouble)
    val df = Similarity.annTopK(onDisk, "v", "id", q, 10, numPlanes)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker: the Filter holding the
    // lsh_bucket predicate and the cosine projection must both carry it
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Filter")),
      s"bucket filter not codegen'd:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"cosine projection not codegen'd:\n$plan")
    // nothing interpreted should be pushed into the parquet reader itself
    assert(plan.contains("PushedFilters: []"), s"unexpected pushdown:\n$plan")
  }
}
