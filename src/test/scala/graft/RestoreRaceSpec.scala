package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReadClient
import graft.services.TableServices
import graft.write.{GraftWriteClient, WriteConfig}

/** Restore/rollback racing a LIVE service execution — the one timeline
  * interaction the model walks never covered. Rollback discards pending
  * plans whose inputs it undoes; these tests pin what happens when the
  * discard lands while a service is ALREADY EXECUTING the plan, using
  * the TableServices.prePublishHook seam to interleave deterministically
  * at the exact window (after staging, before the locked publish):
  *
  *  - a compaction whose plan was discarded mid-flight must ABORT its
  *    publish (the folded base would resurrect rolled-back deltas into
  *    a fresh commit) and leave no published files behind;
  *  - a clean whose plan was discarded mid-flight must delete NOTHING —
  *    the undo changed which file versions are latest, and the stale
  *    plan's "superseded" targets are current data again.
  *
  * (ref: the reference instead refuses rollback while services are
  * pending — BaseRollbackActionExecutor's pending-compaction guard; the
  * discard+liveness-recheck pair reaches the same safety with rollback
  * allowed at any time.)
  */
class RestoreRaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-restore-race-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")
  private def tmp(): String = Files.createTempDirectory("graft_rr_").toString

  private def cfg(tt: String) = GraftTableConfig(
    tableName = "t", tableType = tt,
    recordKeyFields = Seq("o_orderkey"),
    partitionFields = Seq("o_orderpriority"),
    precombineField = Some("o_totalprice"))

  private val wc = WriteConfig(
    targetFileSizeBytes = 256 * 1024,
    smallFileLimitBytes = 200 * 1024,
    defaultRecordSizeBytes = 64,
    parallelism = 4,
    inlineCompactDeltaCommits = 0,
    bloomExpectedEntries = 2048)

  private def withHook[T](hook: () => Unit)(f: => T): T = {
    TableServices.prePublishHook = hook
    try f finally TableServices.prePublishHook = () => ()
  }

  private def contentDiff(got: DataFrame, want: DataFrame): Long = {
    val g = got.select(want.columns.map(col).toSeq: _*)
    g.exceptAll(want).count() + want.exceptAll(g).count()
  }

  test("restore mid-compaction: the discarded plan's publish aborts, nothing resurrects") {
    val path = tmp()
    val t = GraftTable.create(spark, path, cfg(GraftTableType.Mor))
    val w = new GraftWriteClient(t, wc)
    val c1 = w.bulkInsert(orders)
    val svc = new TableServices(t, wc)
    svc.savepoint(c1)
    w.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 5.0))
    val planTs = svc.scheduleCompaction().get

    // the restore lands in the window between the compaction's staging
    // and its locked publish — exactly where a concurrent admin restore
    // would race a long-running service in production
    var fired = false
    val e = intercept[graft.write.ConcurrentWriteConflictException] {
      withHook(() => if (!fired) { fired = true; svc.restore(c1) }) {
        svc.executeCompaction(planTs)
      }
    }
    assert(e.getMessage.contains("rollback/restore"))

    // the table IS the savepointed state: no compact commit, no +5 rows
    val tl = GraftTable.load(spark, path).timeline
    assert(!tl.completedData.exists(i => tl.metadataOf(i).operation == "compact"))
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), orders) === 0)
    // and the aborted publish left no unreferenced files behind: every
    // stored data file is referenced by a surviving commit
    val referenced = tl.completedData
      .flatMap(i => tl.metadataOf(i).files.map(f => s"${f.partition}/${f.fileName}"))
      .toSet
    val t2 = GraftTable.load(spark, path)
    val onDisk = t2.view.latestSlices(None)
      .flatMap(s => (s.base.toSeq ++ s.deltas).map(f => s"${s.partition}/${f.fileName}"))
    assert(onDisk.forall(referenced.contains))
  }

  test("rollback mid-clean: the discarded plan deletes nothing that became current again") {
    val path = tmp()
    val t = GraftTable.create(spark, path, cfg(GraftTableType.Cow))
    val w = new GraftWriteClient(t, wc)
    w.bulkInsert(orders)
    // two rewrites of the same groups: v1 -> v2 -> v3
    val up = orders.filter(col("o_orderkey") % 2 === 0)
    val c2 = w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 1.0))
    val c3 = w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 2.0))
    val svc = new TableServices(t, wc)
    // the plan targets v1/v2 — superseded TODAY, current again after the
    // rollbacks below undo v3 and v2
    val planTs = svc.scheduleClean(retainCommits = 1).get
    assert(svc.pendingCleanPlans.nonEmpty)

    var fired = false
    val out = withHook(() => if (!fired) {
      fired = true
      svc.rollback(c3)
      svc.rollback(c2)
    }) { svc.executeClean(planTs) }
    assert(out.isEmpty, "a mid-flight-discarded clean must publish nothing")

    // v1 survived the stale plan: the rolled-back table reads complete
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), orders) === 0)
    // the discard also cleared the pending plan itself
    assert(new TableServices(GraftTable.load(spark, path), wc)
      .pendingCleanPlans.isEmpty)
  }

  test("rollback discards pending clean plans outright (no mid-flight race needed)") {
    val path = tmp()
    val t = GraftTable.create(spark, path, cfg(GraftTableType.Cow))
    val w = new GraftWriteClient(t, wc)
    w.bulkInsert(orders)
    val up = orders.filter(col("o_orderkey") % 2 === 0)
    w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 1.0))
    val c3 = w.upsert(up.withColumn("o_totalprice", col("o_totalprice") + 2.0))
    val svc = new TableServices(t, wc)
    assert(svc.scheduleClean(retainCommits = 1).nonEmpty)
    svc.rollback(c3)
    assert(svc.pendingCleanPlans.isEmpty,
      "pending clean plans must die with a rollback (stale version math)")
    val expect = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
    assert(contentDiff(new GraftReadClient(GraftTable.load(spark, path))
      .snapshotData(), expect) === 0)
  }
}
