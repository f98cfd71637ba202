package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}.
  * The headline set spans all three families: Catalyst analytics,
  * table-format write+merge flows, and the training-data operators.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q10_returned_customers", "q_orders_priority_agg",
    "q_events_daily", "q_events_latest", "q_events_sessions",
    "tf_upsert", "tf_delete", "tf_mor_snapshot", "tf_mor_compact",
    "doc_text_stats", "doc_dedup_exact", "doc_minhash_pairs",
    "emb_topk_cosine", "emb_ann_topk", "emb_ann_prebucketed", "emb_ivf_topk")

  /** One untimed pass over the engine's hot classes — parquet reader,
    * whole-stage codegen compiler, shuffle machinery, and the graft
    * write/read/commit path — so the first timed query measures the
    * query, not JVM class loading and first-use JIT.
    */
  private def warmup(spark: SparkSession, sfDir: String): Unit =
    try {
      import org.apache.spark.sql.functions._
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      nation.groupBy("n_regionkey").count().count()
      val dir = java.nio.file.Files.createTempDirectory("graft_warmup_").toString
      val t = GraftTable.create(spark, dir + "/t", graft.core.GraftTableConfig(
        tableName = "warmup", tableType = graft.core.GraftTableType.Cow,
        recordKeyFields = Seq("n_nationkey"),
        partitionFields = Seq("n_regionkey"),
        precombineField = None))
      val w = new graft.write.GraftWriteClient(t)
      w.bulkInsert(nation)
      w.upsert(nation.limit(5).withColumn("n_name", lit("W")))
      new graft.read.GraftReadClient(t).snapshotData().count()
      t.storage.delete(t.storage.basePath, recursive = true)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev loop: bench a subset, e.g. SPARK_GRAFT_BENCH_QUERIES=doc_minhash_pairs
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // manifest reads hand Spark explicit FILE paths; driver-side status
      // of a few hundred is cheaper than a distributed listing job
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    // Median-of-N: single-shot timings on a shared host swing 3-4x run to
    // run (GC, page cache, JIT recompilation); each query runs `reps`
    // times and we report the median (headline) and min (floor). Table-
    // format queries rebuild their table every rep — the write path IS
    // what they measure — so reps are independent and equally weighted.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3).max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Reps run ROUND-ROBIN across queries (rep 1 of every query, then
    // rep 2, ...) so a host load spike spanning a few minutes contaminates
    // at most one rep of each query — the median survives — instead of
    // every rep of whichever query it happened to land on.
    // Failures are reported, never silently folded into the timing.
    val names = headline.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))
    val timings = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> Vector.empty[Double]): _*)
    // Host-calibration channel: a fixed raw-Spark query with ZERO graft
    // code (full lineitem scan + partial aggregate — sustained IO + codegen
    // CPU, no shuffle), timed round-robin with the real reps. Its median
    // moves with the HOST's sustained-IO health, not with this repo's
    // code, so a drift episode is adjudicated from the JSON alone:
    // total/calibration stable across rounds = environmental drift;
    // total up with calibration flat = a real regression.
    var calib = Vector.empty[Double]
    def calibrate(): Unit = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      try {
        // collect(), NOT count(): counting an aggregate lets Catalyst
        // prune the sums and the scan reads only footer row counts —
        // a metadata-only no-op that would never track IO health
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .agg(sum("l_extendedprice"), sum("l_quantity"),
            sum("l_discount"), count(lit(1))).collect()
        calib :+= (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] calibration FAILED: ${e.getMessage}")
      }
    }
    // WRITE calibration channel: the read channel is blind to write-IO
    // slumps (r17: write-heavy tf_ floors ran 1.3-1.7x hot while the
    // read calibration sat at its healthy floor — adjudicating that
    // drift took three independent runs). A fixed raw-Spark parquet
    // write of lineitem — repartitioned + maxRecordsPerFile-pinned so
    // the many-small-files + rename churn shape the tf_ queries are made
    // of stays constant — tracks sustained write IO with ZERO graft
    // code. Emitted as calibration_write/_min alongside the read channel.
    var calibW = Vector.empty[Double]
    def calibrateWrite(): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_benchw_").toString
      val t0 = System.nanoTime()
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .repartition(8)
          .write.option("maxRecordsPerFile", 25000)
          .mode("overwrite").parquet(s"$dir/w")
        calibW :+= (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] write calibration FAILED: ${e.getMessage}")
      } finally {
        try {
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        } catch { case _: Throwable => () }
      }
    }
    // calibration runs only on full-set runs: a --only micro-benchmark
    // must not pay a full lineitem scan + write per rep, and its JSON is
    // a dev-loop artifact nobody adjudicates drift from
    val calibrations = if (only.isDefined) Seq.empty
      else Seq("calibration", "calibration_write")
    for (_ <- 1 to reps; name <- calibrations ++ names) {
      if (name == "calibration") { calibrate() }
      else if (name == "calibration_write") { calibrateWrite() }
      else {
      val t0 = System.nanoTime()
      try {
        // label every job of this query (write-client phases layer their
        // own label on top and restore this one) — UI/event-log
        // attribution only, zero effect on the timing methodology
        spark.sparkContext.setJobDescription(s"bench: $name")
        SparkEntry.queries(name)(spark, sfDir).count()
        timings(name) :+= (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      } finally {
        spark.sparkContext.setJobDescription(null)
        // rep isolation: operators persist intermediates (shingle
        // corpora, candidate lists, bloom frames) and leave reclamation
        // to the ContextCleaner, which only fires on a GC of the plan —
        // across 19 queries x reps those blocks stack up and the heap
        // headroom of the LAST queries silently depends on when GC ran.
        // Dropping the cache between reps makes every timing
        // self-contained (the persist+consume cost is part of the
        // query; holding blocks across queries is not).
        spark.catalog.clearCache()
      }
      }
    }
    val results = names.map(n => (n, timings(n): Seq[Double]))
    def obj(f: Seq[Double] => Double): String = results.map { case (k, ts) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) f(ts) else -1.0)
    }.mkString("{", ",", "}")
    // calibration failures are surfaced in `failed` (when they were
    // supposed to run at all) — a silent stderr-only failure would leave
    // the drift adjudication channel missing with no trace in the JSON
    val failedNames = results.filter(_._2.isEmpty).map(_._1) ++
      calibrations.filter {
        case "calibration"       => calib.isEmpty
        case "calibration_write" => calibW.isEmpty
        case _                   => false
      }
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val ok = results.filter(_._2.nonEmpty)
    val totalMedian = ok.map(r => median(r._2)).sum
    val totalMin = ok.map(_._2.min).sum
    val calMed = if (calib.nonEmpty) median(calib) else -1.0
    val calMin = if (calib.nonEmpty) calib.min else -1.0
    val calWMed = if (calibW.nonEmpty) median(calibW) else -1.0
    val calWMin = if (calibW.nonEmpty) calibW.min else -1.0
    val json = s"""{"metric":"total_median","value":$totalMedian,"unit":"sec","reps":$reps,"total_min":$totalMin,"calibration":$calMed,"calibration_min":$calMin,"calibration_write":$calWMed,"calibration_write_min":$calWMin,"queries":${obj(median)},"queries_min":${obj(_.min)},"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // The same line, machine-readable: stdout passes through sbt's logger,
    // which prefixes "[info] " and has broken downstream JSON parsing two
    // rounds running. A plain file next to the run is prefix-proof.
    // SPARK_GRAFT_BENCH_OUT overrides the path; never fatal.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
