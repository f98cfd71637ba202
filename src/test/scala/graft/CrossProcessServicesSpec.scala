package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftOptions
import graft.utilities.{IngestConfig, IngestRunner}

/** Async table services in a SEPARATE PROCESS racing this JVM's live
  * continuous-ingest loop — the production DeltaStreamer deployment
  * where the compactor runs as its own job. Everything the in-process
  * AsyncServicesSpec walk proves is re-proven here with the coordination
  * primitives that actually cross process boundaries: the `file` lock
  * provider around every publish, plan-claim markers with mtime
  * heartbeats, and OCC conflict checks over the shared timeline
  * directory (ref: the reference's standalone compactor job +
  * TransactionManager.java; our seams: LockProvider.scala,
  * TableServices.claimInflight).
  */
class CrossProcessServicesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-crossproc-services-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def seeds(pinned: Long): Seq[Long] =
    pinned +: sys.env.get("GRAFT_MODEL_EXTRA_SEEDS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).map(_.toLong)

  private def toDf(rows: Seq[(Long, String, Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "p", "v", "ord")
  }

  private def forkRunner(tgt: String, work: String): (Process, java.io.File) = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-cp", cp, "graft.ServiceRunnerChildProcess",
      tgt, s"$work/stop", s"$work/status")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val log = new java.io.File(work, "child.log")
    pb.redirectOutput(log)
    (pb.start(), log)
  }

  private def runWalk(seed: Long): Unit = {
    val rnd = new Random(seed)
    val work = Files.createTempDirectory("graft_xproc_").toString
    val src = s"$work/src"
    val tgt = s"$work/tgt"
    val opts = Map(
      "recordkey.field" -> "k",
      "partitionpath.field" -> "p",
      "precombine.field" -> "ord",
      GraftOptions.TableType -> "mor",
      // the ONLY coordination with the child process: the shared table
      // dir's file lock + claim markers
      GraftOptions.LockProviderKey -> "file",
      GraftOptions.InlineCompactDeltaCommits -> "0")
    val cfg = IngestConfig(sourcePath = src, targetPath = tgt, tableOptions = opts)
    val parts = Seq("a", "b", "c")
    val ordGen = new java.util.concurrent.atomic.AtomicLong(0L)
    val model = mutable.Map.empty[(String, Long), (Double, Long)]

    def drop(id: Int): Unit = {
      val rows = (0 until 3 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(25).toLong, parts(rnd.nextInt(parts.size)),
          rnd.nextInt(10000) / 10.0, ordGen.incrementAndGet())
      }
      rows.groupBy(r => (r._2, r._1)).foreach { case (pk, grp) =>
        val winner = grp.maxBy(_._4)
        model(pk) = (winner._3, winner._4)
      }
      toDf(rows).coalesce(1).write.parquet(s"$src/b$id")
    }

    def syncRound(): Int = {
      var attempts = 0
      var out = -1
      while (out < 0) {
        try out = IngestRunner.runContinuous(spark, cfg, maxRounds = 1)
        catch {
          case e: graft.write.ConcurrentWriteConflictException =>
            attempts += 1
            assert(attempts <= 8, s"sync gave up after 8 conflict retries: $e")
        }
      }
      out
    }

    val (child, log) = forkRunner(tgt, work)
    try {
      (1 to 10).foreach { r =>
        drop(r)
        assert(syncRound() === 1, s"round $r did not sync")
      }
      // wait for the child to lap the final commits — on PROGRESS, not
      // wall clock: a fixed window flakes when suite-wide load starves the
      // child JVM's startup (observed: one cycle total inside 30s). The
      // child publishes its cycle count each loop; once it has run a
      // dozen service cycles against the FINISHED table with the parent
      // idle, a missing compaction is a real bug, not scheduling. The
      // absolute cap only backstops a hung child.
      val progress = java.nio.file.Paths.get(s"$work/status.progress")
      def childCycles(): Int =
        try new String(Files.readAllBytes(progress), "UTF-8")
          .trim.split("\\s+").head.toInt
        catch { case _: Throwable => 0 }
      val cyclesAtIngestEnd = childCycles()
      val deadline = System.currentTimeMillis() + 300000
      def compacted(): Boolean = {
        val t = GraftTable.load(spark, tgt)
        t.timeline.completedData
          .exists(i => t.timeline.metadataOf(i).operation == "compact")
      }
      while (!compacted() && childCycles() - cyclesAtIngestEnd < 12 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    } finally {
      new java.io.File(work, "stop").createNewFile()
      assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        "service-runner child hung")
    }
    val status = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$work/status")), "UTF-8")
    assert(child.exitValue() === 0,
      s"service-runner child had non-benign failures: $status\n" +
        new String(Files.readAllBytes(log.toPath)).takeRight(4000))
    assert(status.contains("errors=0"), status)
    // the race was real: the CHILD actually compacted (its status counts
    // only its own publishes)
    assert("compacts=(\\d+)".r.findFirstMatchIn(status)
      .exists(_.group(1).toInt >= 1),
      s"child never compacted: $status")

    // snapshot == model, exactly
    val snap = spark.read.format("graft").load(tgt)
      .select("k", "p", "v", "ord").collect()
      .map(r => ((r.getString(1), r.getLong(0)), (r.getDouble(2), r.getLong(3))))
    assert(snap.length === snap.map(_._1).distinct.length,
      "duplicate (partition, key) in snapshot")
    assert(snap.toMap === model.toMap, "snapshot diverged from model")

    // checkpoint survived the cross-process races
    assert(syncRound() === 0)
  }

  test("a forked service-runner process races live ingest under the file lock") {
    seeds(11001L).foreach(runWalk)
  }
}
