package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReadClient
import graft.services.TableServices
import graft.write.{GraftWriteClient, WriteConfig}

/** Clean's publish-then-delete protocol at scale: the commit-lock
  * section is METADATA-ONLY (liveness re-check + instant publish), so a
  * large clean's physical delete fan-out — minutes of object-store
  * latency at 100 TB — can neither stall concurrent writers nor outlive
  * the lock TTL and get broken mid-delete. (ref: CleanActionExecutor
  * runs deletes with no table-level lock; the rollback race the old
  * locked-delete design closed is now closed by the published commit
  * itself — its deletedFiles mask the versions from every view before
  * the first physical delete.)
  *
  * Interleaving is deterministic via TableServices.postCleanPublishHook,
  * which fires after the lock is released and before the deletes start.
  */
class CleanConcurrencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-clean-concurrency-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")
  private def tmp(): String = Files.createTempDirectory("graft_cc_").toString

  private def cfg = GraftTableConfig(
    tableName = "t", tableType = GraftTableType.Cow,
    recordKeyFields = Seq("o_orderkey"),
    partitionFields = Seq("o_orderpriority"),
    precombineField = Some("o_totalprice"))

  // a REAL (non-reentrant, cross-process) lock with a short acquire
  // timeout: a writer landing while the lock is held fails loudly
  // instead of queueing past the assertion window
  private val wc = WriteConfig(
    targetFileSizeBytes = 256 * 1024,
    smallFileLimitBytes = 200 * 1024,
    defaultRecordSizeBytes = 64,
    parallelism = 4,
    inlineCompactDeltaCommits = 0,
    bloomExpectedEntries = 2048,
    lockProvider = "file",
    lockTimeoutMs = 2000)

  private def withPostCleanHook[T](hook: () => Unit)(f: => T): T = {
    TableServices.postCleanPublishHook = hook
    try f finally TableServices.postCleanPublishHook = () => ()
  }

  private def contentDiff(got: DataFrame, want: DataFrame): Long = {
    val g = got.select(want.columns.map(col).toSeq: _*)
    g.exceptAll(want).count() + want.exceptAll(g).count()
  }

  /** bulk insert + two full-group rewrites: v1 and v2 become deletable
    * under retainCommits=1. Returns (table, writer, services, planTs,
    * planned file paths).
    */
  private def planLargeClean(path: String) = {
    val t = GraftTable.create(spark, path, cfg)
    val w = new GraftWriteClient(t, wc)
    w.bulkInsert(orders)
    val up = orders.filter(col("o_orderkey") % 2 === 0)
    w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 1.0))
    w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 2.0))
    val svc = new TableServices(t, wc)
    val planTs = svc.scheduleClean(retainCommits = 1).get
    val files = svc.pendingCleanPlans.find(_.instant == planTs).get.files
    assert(files.nonEmpty, "fixture planned no deletions — test is vacuous")
    val paths = files.map { pf =>
      val i = pf.lastIndexOf('/')
      t.storage.dataFilePath(pf.substring(0, math.max(i, 0)), pf.substring(i + 1))
    }
    (t, w, svc, planTs, paths)
  }

  test("a concurrent writer commits while the clean's deletes are still running") {
    val path = tmp()
    val (t, w, svc, planTs, paths) = planLargeClean(path)

    // the hook runs where the physical deletes are about to start: the
    // commit lock MUST already be free, so an inline write (same
    // non-reentrant file lock, 2 s acquire timeout) succeeds — with the
    // old delete-inside-the-lock design this threw LockAcquireException
    // for the whole duration of the delete fan-out
    var hookCommit: Option[String] = None
    val out = withPostCleanHook { () =>
      assert(paths.forall(t.storage.exists),
        "hook must fire BEFORE any physical delete")
      hookCommit = Some(w.upsert(
        orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 9.0)))
    } { svc.executeClean(planTs) }

    assert(out === Some(planTs))
    assert(hookCommit.nonEmpty, "writer must not be blocked by clean's deletes")
    // the deletes did run after the hook returned
    assert(paths.forall(p => !t.storage.exists(p)), "cleaned versions must be gone")
    // and both the clean and the raced write landed consistently
    // the raced upsert REPLACED %7 keys with original+9 (it read the
    // original frame, not the +2 table state); evens not %7 keep their +2
    val expect = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 9.0)
        .when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 2.0)
        .otherwise(col("o_totalprice")))
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), expect) === 0)
  }

  test("crash after publish, before deletes: views stay exact; the next clean sweeps the orphans") {
    val path = tmp()
    val (t, _, svc, planTs, paths) = planLargeClean(path)

    // simulate the process dying in the publish->delete window
    intercept[RuntimeException] {
      withPostCleanHook(() => throw new RuntimeException("simulated crash")) {
        svc.executeClean(planTs)
      }
    }

    // the clean commit IS on the timeline with its deletedFiles recorded…
    val tl = GraftTable.load(spark, path).timeline
    val cleanInstant = tl.completed.filter(_.action == GraftAction.Clean)
      .find(_.ts == planTs)
    assert(cleanInstant.nonEmpty, "clean must have published before the crash window")
    assert(tl.metadataOf(cleanInstant.get).deletedFiles.nonEmpty)
    // …the physical files are orphans still on disk…
    assert(paths.forall(t.storage.exists))
    // …and every view already masks them: the snapshot is exact
    val expect = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 2.0)
        .otherwise(col("o_totalprice")))
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), expect) === 0)

    // routine maintenance on a FRESH services instance (a new process)
    // re-issues the latest clean's deletes and reaps the orphans
    new TableServices(GraftTable.load(spark, path), wc).clean()
    assert(paths.forall(p => !t.storage.exists(p)),
      "crash-window orphans must be swept by the next clean")
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), expect) === 0)
  }

  test("archiving an unreaped clean re-issues its deletes first (no permanent leak)") {
    // the orphan sweep only scans ACTIVE cleans: if a crashed clean is
    // archived before any later clean runs, its planned file versions
    // would otherwise stay on disk forever — invisible to every view,
    // found by no later maintenance
    val path = tmp()
    val (t, w, svc, planTs, paths) = planLargeClean(path)
    intercept[RuntimeException] {
      withPostCleanHook(() => throw new RuntimeException("simulated crash")) {
        svc.executeClean(planTs)
      }
    }
    assert(paths.forall(t.storage.exists), "orphans present before archive")
    // push the clean below the archive boundary with later commits (a
    // same-content upsert keeps the expected snapshot unchanged)
    val touch = orders.filter(col("o_orderkey") % 2 === 1).limit(7)
    w.upsert(touch); w.upsert(touch)
    val archived = new TableServices(GraftTable.load(spark, path), wc)
      .archive(minCommits = 2, maxCommits = 3)
    assert(archived.nonEmpty, "fixture must actually archive")
    val tl2 = GraftTable.load(spark, path).timeline
    assert(!tl2.completed.exists(i =>
      i.action == GraftAction.Clean && i.ts == planTs),
      "the clean must have left the active timeline")
    assert(paths.forall(p => !t.storage.exists(p)),
      "archive must reap the crashed clean's deletes before archiving it")
    val expect = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 2.0)
        .otherwise(col("o_totalprice")))
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), expect) === 0)
  }
}
