package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.services.AsyncTableServices
import graft.spark.GraftOptions
import graft.utilities.{IngestConfig, IngestRunner}

/** Async table services racing a live continuous-ingest loop — the
  * DeltaStreamer `--continuous` shape (ref: HoodieDeltaStreamer.java
  * async compaction + AsyncCompactService.java): the writer never
  * compacts inline; a background thread owns compaction (and cleaning)
  * and runs WHILE sync rounds keep committing, coordinated only through
  * the `jvm` lock provider + plan claims + service OCC. The walk drops
  * fresh source batches, syncs them through IngestRunner.runContinuous,
  * and replays a driver-side model of the expected latest row per key;
  * at the end the table snapshot must match the model exactly and the
  * services must have actually run (at least one compact commit) with
  * zero non-benign failures.
  */
class AsyncServicesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-async-services-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft_async_").toString

  private def seeds(pinned: Long): Seq[Long] =
    pinned +: sys.env.get("GRAFT_MODEL_EXTRA_SEEDS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).map(_.toLong)

  private def toDf(rows: Seq[(Long, String, Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "p", "v", "ord")
  }

  private def runWalk(seed: Long, cluster: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val src = tmp() + "/src"
    val tgt = tmp() + "/tgt"
    val opts = Map(
      "recordkey.field" -> "k",
      "partitionpath.field" -> "p",
      "precombine.field" -> "ord",
      GraftOptions.TableType -> "mor",
      GraftOptions.LockProviderKey -> "jvm",
      // the writer does NO inline maintenance — the async thread owns it
      GraftOptions.InlineCompactDeltaCommits -> "0") ++
      // the clustered walk needs MULTIPLE small delta-free groups per
      // partition or scheduleClustering never finds a consolidation
      // worth planning: a tiny target fans the bin-pack out into many
      // one-or-two-record groups for the service to merge back
      (if (cluster) Map(
        GraftOptions.TargetFileSize -> "1024",
        GraftOptions.SmallFileLimit -> "524288")
      else Map.empty)
    val cfg = IngestConfig(sourcePath = src, targetPath = tgt, tableOptions = opts)
    val parts = Seq("a", "b", "c")
    val ordGen = new java.util.concurrent.atomic.AtomicLong(0L)
    // model: latest (v, ord) per (partition, key) — non-global index, so
    // the same k in two partitions is two records
    val model = mutable.Map.empty[(String, Long), (Double, Long)]

    def drop(id: Int): Unit = {
      val rows = (0 until 3 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(25).toLong, parts(rnd.nextInt(parts.size)),
          rnd.nextInt(10000) / 10.0, ordGen.incrementAndGet())
      }
      // within one batch the ingest preCombines on ord, keeping the max
      rows.groupBy(r => (r._2, r._1)).foreach { case (pk, grp) =>
        val winner = grp.maxBy(_._4)
        model(pk) = (winner._3, winner._4)
      }
      toDf(rows).coalesce(1).write.parquet(s"$src/b$id")
    }

    // A sync round that began before a racing compaction was scheduled
    // and published after it completed conflicts legitimately (its delta
    // ts would sit below the new base and be dropped from every slice) —
    // the ingest loop's contract, like the reference DeltaStreamer's, is
    // to retry the round: the checkpoint never advanced, so the retry
    // re-reads the same source batch.
    // The clustered walk needs a bigger budget: clustering replace-commits
    // conflict with EVERY racing writer on a chosen group, and this walk
    // deliberately re-clusters far more often than any production cadence
    // (a per-poll cycle vs minutes/hours), so back-to-back losses happen.
    val retryBudget = if (cluster) 20 else 8
    def syncRound(): Int = {
      var attempts = 0
      var out = -1
      while (out < 0) {
        try out = IngestRunner.runContinuous(spark, cfg, maxRounds = 1)
        catch {
          case e: graft.write.ConcurrentWriteConflictException =>
            attempts += 1
            assert(attempts <= retryBudget,
              s"sync gave up after $retryBudget conflict retries: $e")
        }
      }
      out
    }

    // round 1 creates the table, then the async services start racing
    drop(1)
    assert(syncRound() === 1)
    val table = GraftTable.load(spark, tgt)
    val wc = GraftOptions.writeConfig(opts).copy(cleanRetainCommits = 6)
    val async = new AsyncTableServices(
      table, wc, compact = true, cluster = cluster, clean = true,
      // clustering must cycle SLOWER than a sync round or the writer
      // starves outright — every cycle re-clusters the tiny groups and
      // each replace invalidates the racing round. 1.5s vs ~1s syncs
      // still interleaves a clustering into roughly every other round
      // (production cadence is minutes/hours vs minute-scale syncs)
      pollMs = if (cluster) 1500L else 5L).start()
    try {
      val rounds = 10
      (2 to rounds + 1).foreach { r =>
        drop(r)
        assert(syncRound() === 1, s"round $r did not sync")
      }
      // let the service lap the final commits at least twice so pending
      // work drains before the verdict
      val lapped = async.cycles + 2
      assert(async.awaitCycles(lapped), "async services stalled")
    } finally async.close()

    assert(async.failures.isEmpty,
      s"non-benign async service failures: ${async.failures.map(_.toString).take(3)}")

    // the race was real: the background thread actually compacted
    val ops = table.timeline.completedData
      .map(i => table.timeline.metadataOf(i).operation)
    assert(ops.contains("compact"),
      s"async thread never compacted (ops=${ops.distinct.mkString(",")})")
    if (cluster) assert(ops.contains("cluster"),
      s"async thread never clustered (ops=${ops.distinct.mkString(",")})")

    // snapshot == model, exactly
    val snap = spark.read.format("graft").load(tgt)
      .select("k", "p", "v", "ord").collect()
      .map(r => ((r.getString(1), r.getLong(0)), (r.getDouble(2), r.getLong(3))))
    assert(snap.length === snap.map(_._1).distinct.length,
      "duplicate (partition, key) in snapshot")
    val got = snap.toMap
    assert(got === model.toMap,
      s"snapshot diverged from model: missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"diff=${model.collect { case (k, v) if got.get(k).exists(_ != v) => k }.take(5)}")

    // checkpoint survived the races: one more continuous call is a no-op
    assert(syncRound() === 0)
  }

  test("async compact+clean race continuous ingest; snapshot stays model-exact") {
    seeds(9001L).foreach(runWalk(_))
  }

  // Clustering is the highest-conflict service: its replace-commits kill
  // whole groups, so EVERY racing writer on a chosen group conflicts
  // (serviceConflict olderOnly=false) and the ingest loop's
  // retry-on-conflict carries the round — the reference's
  // SparkRejectUpdateStrategy shape. The model must stay exact through
  // group ids changing under the writer's index between rounds.
  test("async compact+CLUSTER+clean race continuous ingest; snapshot stays model-exact") {
    seeds(7001L).foreach(runWalk(_, cluster = true))
  }
}
