package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.metrics.GraftMetrics
import graft.read.GraftReadClient
import graft.services.TableServices
import graft.write.{GraftWriteClient, WriteConfig}

/** The operational metrics surface (ref: HoodieMetrics.java wired at
  * AbstractHoodieWriteClient.java:221-222, 574-651): per-commit gauges
  * from the published metadata, cumulative counters, service metrics
  * (compaction/clean/rollback/restore/archive), compaction-debt gauges,
  * the console/JMX reporters, and the Spark-plugin registry bridge.
  * Table names are unique per test — the registry is process-global by
  * design, so isolation comes from the name prefix.
  */
class MetricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-metrics-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  private def freshName(tag: String) = s"mx_${tag}_${System.nanoTime()}"

  private def cowTable(tn: String): GraftTable =
    GraftTable.create(spark, Files.createTempDirectory("mx_").toString + "/t",
      GraftTableConfig(tableName = tn, tableType = GraftTableType.Cow,
        recordKeyFields = Seq("n_nationkey"), partitionFields = Seq("n_regionkey"),
        precombineField = None))

  private def morTable(tn: String): GraftTable =
    GraftTable.create(spark, Files.createTempDirectory("mx_").toString + "/t",
      GraftTableConfig(tableName = tn, tableType = GraftTableType.Mor,
        recordKeyFields = Seq("n_nationkey"), partitionFields = Seq("n_regionkey"),
        precombineField = None))

  private val wcOn = WriteConfig(metricsOn = true)

  private def v(parts: String*): Long =
    GraftMetrics.value(parts.mkString(".")).getOrElse(
      fail(s"metric ${parts.mkString(".")} not found; have: " +
        GraftMetrics.snapshot(parts.head).keys.toSeq.sorted.mkString(", ")))

  test("commits emit per-operation gauges, counters, and timers") {
    val tn = freshName("cow")
    val t = cowTable(tn)
    val w = new GraftWriteClient(t, wcOn)
    w.bulkInsert(nation)
    assert(v(tn, "bulk_insert", "commits") === 1L)
    assert(v(tn, "bulk_insert", "totalRecordsWritten") === 25L)
    assert(v(tn, "bulk_insert", "totalPartitionsWritten") === 5L)
    assert(v(tn, "bulk_insert", "totalBytesWritten") > 0L)
    assert(v(tn, "bulk_insert", "duration") >= 0L)

    // a COW upsert rewrites whole file groups: records written counts the
    // rewritten file contents (the reference's WriteStat semantics), so
    // updating 5 keys reports >= 5 and the per-table counter accumulates
    w.upsert(nation.limit(5).withColumn("n_name", lit("X")))
    assert(v(tn, "upsert", "commits") === 1L)
    assert(v(tn, "upsert", "totalRecordsWritten") >= 5L)
    assert(v(tn, "totalRecordsWritten") ===
      v(tn, "bulk_insert", "totalRecordsWritten") +
        v(tn, "upsert", "totalRecordsWritten"))
    // the timer aggregates both operations? no — timers are per-operation
    assert(GraftMetrics.registry.timer(s"$tn.upsert.timer").getCount === 1L)

    // gauges hold the MOST RECENT commit's numbers
    w.upsert(nation.limit(2).withColumn("n_name", lit("Y")))
    assert(v(tn, "upsert", "commits") === 2L)
    assert(GraftMetrics.registry.timer(s"$tn.upsert.timer").getCount === 2L)
  }

  test("MOR services emit compaction, clean, rollback metrics and debt gauges") {
    val tn = freshName("mor")
    val t = morTable(tn)
    val w = new GraftWriteClient(t, wcOn)
    val svc = new TableServices(t, wcOn)
    w.bulkInsert(nation)
    w.upsert(nation.limit(10).withColumn("n_name", lit("A")))
    w.upsert(nation.limit(10).withColumn("n_name", lit("B")))
    assert(v(tn, "upsert", "totalDeltaFilesWritten") > 0L)

    // schedule-only updates the debt gauges (pending plan + outstanding deltas)
    val planned = svc.scheduleCompaction()
    assert(planned.nonEmpty)
    assert(v(tn, "compaction", "pendingPlans") === 1L)
    assert(v(tn, "compaction", "deltaFilesOutstanding") > 0L)

    // executing the plan zeroes the debt and emits the compact commit
    assert(svc.executeCompaction(planned.get).nonEmpty)
    assert(v(tn, "compact", "commits") === 1L)
    // compaction rewrites only slices with deltas — the record count is
    // the touched groups' contents, <= the table's 25 rows, and layout-
    // (parallelism-)dependent, so pin the bounds, not the exact value
    assert(v(tn, "compact", "totalRecordsWritten") > 0L)
    assert(v(tn, "compact", "totalRecordsWritten") <= 25L)
    assert(v(tn, "compact", "deltaFilesCompacted") > 0L)
    assert(v(tn, "compaction", "pendingPlans") === 0L)
    assert(v(tn, "compaction", "deltaFilesOutstanding") === 0L)

    // clean reports exactly the files its plan deleted
    val before = new GraftReadClient(t).snapshotData().count()
    assert(svc.cleanVersions(retainVersions = 1).nonEmpty)
    assert(v(tn, "clean", "runs") === 1L)
    assert(v(tn, "clean", "numFilesDeleted") > 0L)
    assert(v(tn, "clean", "totalFilesDeleted") === v(tn, "clean", "numFilesDeleted"))
    assert(new GraftReadClient(t).snapshotData().count() === before)

    // rollback reports the files it physically removed
    val last = w.upsert(nation.limit(3).withColumn("n_name", lit("C")))
    svc.rollback(last)
    assert(v(tn, "rollback", "runs") === 1L)
    assert(v(tn, "rollback", "numFilesDeleted") > 0L)
  }

  test("restore and archive emit summary metrics") {
    val tn = freshName("ra")
    val t = cowTable(tn)
    val w = new GraftWriteClient(t, wcOn)
    val svc = new TableServices(t, wcOn)
    w.bulkInsert(nation)
    val sp = w.upsert(nation.limit(2).withColumn("n_name", lit("S")))
    svc.savepoint(sp)
    w.upsert(nation.limit(2).withColumn("n_name", lit("T")))
    w.upsert(nation.limit(2).withColumn("n_name", lit("U")))
    svc.restore(sp)
    assert(v(tn, "restore", "runs") === 1L)
    assert(v(tn, "restore", "commitsRolledBack") === 2L)
    assert(v(tn, "rollback", "runs") === 2L)

    val tn2 = freshName("arch")
    val t2 = cowTable(tn2)
    val w2 = new GraftWriteClient(t2, wcOn)
    val svc2 = new TableServices(t2, wcOn)
    w2.bulkInsert(nation)
    (1 to 6).foreach(i =>
      w2.upsert(nation.limit(1).withColumn("n_name", lit(s"A$i"))))
    assert(svc2.archive(minCommits = 2, maxCommits = 3).nonEmpty)
    assert(v(tn2, "archive", "runs") === 1L)
    assert(v(tn2, "archive", "instantsArchived") > 0L)
  }

  test("metrics stay off (and cost nothing) by default") {
    val tn = freshName("off")
    val t = cowTable(tn)
    val w = new GraftWriteClient(t) // default WriteConfig: metricsOn = false
    w.bulkInsert(nation)
    new TableServices(t).clean()
    assert(GraftMetrics.snapshot(tn).isEmpty)
  }

  test("console report prints one grep-able line per metric") {
    val tn = freshName("con")
    val t = cowTable(tn)
    // periodSec 0: on-demand reporting only — construction must not start
    // a scheduler
    val w = new GraftWriteClient(t,
      WriteConfig(metricsOn = true, metricsReporter = "console"))
    w.bulkInsert(nation)
    val buf = new ByteArrayOutputStream()
    GraftMetrics.report(new PrintStream(buf, true, "UTF-8"), prefix = tn)
    val out = buf.toString("UTF-8")
    assert(out.contains(s"[graft-metrics] $tn.bulk_insert.totalRecordsWritten value=25"))
    assert(out.contains(s"$tn.bulk_insert.commits count=1"))
    assert(out.contains(s"$tn.bulk_insert.timer count=1"))
  }

  test("jmx reporter exposes live MBeans under the graft domain") {
    val tn = freshName("jmx")
    val t = cowTable(tn)
    val w = new GraftWriteClient(t,
      WriteConfig(metricsOn = true, metricsReporter = "jmx"))
    w.bulkInsert(nation)
    val mbs = java.lang.management.ManagementFactory.getPlatformMBeanServer
    import scala.jdk.CollectionConverters._
    val names = mbs.queryNames(new javax.management.ObjectName("graft:*"), null).asScala
    val gauge = names.find(
      _.getKeyProperty("name") == s"$tn.bulk_insert.totalRecordsWritten")
      .getOrElse(fail(s"no gauge MBean for $tn among ${names.size} graft MBeans"))
    assert(mbs.getAttribute(gauge, "Value") === 25L)
    val counter = names.find(_.getKeyProperty("name") == s"$tn.bulk_insert.commits")
      .getOrElse(fail("no counter MBean"))
    assert(mbs.getAttribute(counter, "Count") === 1L)

    // MBeans are LIVE views of the same metric objects, not snapshots
    w.upsert(nation.limit(1).withColumn("n_name", lit("J")))
    val upd = mbs.queryNames(new javax.management.ObjectName("graft:*"), null)
      .asScala.find(_.getKeyProperty("name") == s"$tn.upsert.commits")
      .getOrElse(fail("no upsert counter MBean"))
    assert(mbs.getAttribute(upd, "Count") === 1L)
  }

  test("metrics flow through DataSource options (the SQL/ingest/streaming surface)") {
    val tn = freshName("ds")
    val dir = Files.createTempDirectory("mx_").toString + "/t"
    nation.write.format("graft")
      .option("table.name", tn)
      .option("recordkey.field", "n_nationkey")
      .option("partitionpath.field", "n_regionkey")
      .option("operation", "bulk_insert")
      .option("metrics.on", "true")
      .mode("overwrite")
      .save(dir)
    assert(v(tn, "bulk_insert", "commits") === 1L)
    assert(v(tn, "bulk_insert", "totalRecordsWritten") === 25L)
  }

  test("continuous ingest emits per-round sync metrics and idle-poll counts") {
    import graft.utilities.{IngestConfig, IngestRunner}
    val tn = freshName("ing")
    val base = Files.createTempDirectory("mx_").toString
    val src = base + "/src"
    nation.limit(10).write.parquet(src)
    val cfg = IngestConfig(
      sourcePath = src, targetPath = base + "/t",
      tableOptions = Map(
        "table.name" -> tn,
        "recordkey.field" -> "n_nationkey",
        "partitionpath.field" -> "n_regionkey",
        "metrics.on" -> "true"))
    // round 1 syncs the batch; round 2 finds nothing and idles out
    assert(IngestRunner.runContinuous(spark, cfg, maxRounds = 5) === 1)
    assert(v(tn, "ingest", "rounds") === 1L)
    assert(v(tn, "ingest", "syncDuration") >= 0L)
    assert(v(tn, "ingest", "idlePolls") === 1L)
    // the sync's commit itself reported through the write client
    val commits = Seq("bulk_insert", "upsert", "insert")
      .flatMap(op => GraftMetrics.value(s"$tn.$op.commits")).sum
    assert(commits >= 1L)
  }

  test("removeTable drops a table's metrics and propagates through bridges") {
    val tn = freshName("rm")
    val keep = freshName("keep")
    GraftMetrics.setGauge(s"$tn.op.g", 1L)
    GraftMetrics.inc(s"$tn.op.c")
    GraftMetrics.setGauge(s"$keep.op.g", 2L)
    val target = new com.codahale.metrics.MetricRegistry
    GraftMetrics.bridgeTo(target)
    assert(target.getGauges.containsKey(s"$tn.op.g"))
    GraftMetrics.removeTable(tn)
    assert(GraftMetrics.snapshot(tn).isEmpty)
    assert(!target.getGauges.containsKey(s"$tn.op.g"))
    assert(!target.getCounters.containsKey(s"$tn.op.c"))
    // unrelated tables survive, and the name can be re-created cleanly
    assert(GraftMetrics.value(s"$keep.op.g") === Some(2L))
    GraftMetrics.setGauge(s"$tn.op.g", 9L)
    assert(GraftMetrics.value(s"$tn.op.g") === Some(9L))
  }

  test("an unknown reporter fails loudly at client construction") {
    val tn = freshName("bogus")
    val t = cowTable(tn)
    val e = intercept[IllegalArgumentException] {
      new GraftWriteClient(t, WriteConfig(metricsOn = true, metricsReporter = "statsd"))
    }
    assert(e.getMessage.contains("statsd"))
  }

  test("the Spark plugin bridge forwards existing and future metrics live") {
    val tn = freshName("plug")
    GraftMetrics.setGauge(s"$tn.pre.existing", 7L)

    val target = new com.codahale.metrics.MetricRegistry
    // the plugin's whole registerMetrics body, driven through a stub
    // PluginContext (a real one needs a SparkContext built with
    // spark.plugins, which would fight the suite-shared session)
    val ctx = new org.apache.spark.api.plugin.PluginContext {
      override def metricRegistry(): com.codahale.metrics.MetricRegistry = target
      override def conf(): org.apache.spark.SparkConf = new org.apache.spark.SparkConf()
      override def executorID(): String = "driver"
      override def hostname(): String = "localhost"
      override def resources()
          : java.util.Map[String, org.apache.spark.resource.ResourceInformation] =
        java.util.Collections.emptyMap()
      override def send(msg: Object): Unit = ()
      override def ask(msg: Object): Object = msg
    }
    new graft.metrics.GraftSparkPlugin().driverPlugin().registerMetrics("app", ctx)

    // replayed: metrics that existed before the bridge attached
    assert(target.getGauges.containsKey(s"$tn.pre.existing"))
    // forwarded: metrics created after
    GraftMetrics.setGauge(s"$tn.post.created", 11L)
    GraftMetrics.inc(s"$tn.post.counter", 3L)
    assert(target.getGauges.get(s"$tn.post.created")
      .getValue.asInstanceOf[Long] === 11L)
    assert(target.getCounters.get(s"$tn.post.counter").getCount === 3L)
    // LIVE: the same metric object, so later updates are visible
    GraftMetrics.setGauge(s"$tn.post.created", 13L)
    assert(target.getGauges.get(s"$tn.post.created")
      .getValue.asInstanceOf[Long] === 13L)
  }
}
