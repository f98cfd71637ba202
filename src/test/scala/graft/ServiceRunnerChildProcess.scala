package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM table-service runner for the cross-process async test: a
  * genuinely separate process (own SparkSession, own timeline cache, own
  * claim heartbeats) that loops compact+clean cycles against a table a
  * DIFFERENT process is actively ingesting into — the production
  * deployment where the compactor is its own job, not a thread of the
  * ingest driver (ref: the reference's standalone HoodieCompactor job +
  * AsyncCompactService.java; coordination via TransactionManager.java's
  * lock provider, here the `file` lock + claim markers, both of which
  * cross process boundaries by construction).
  *
  * args: tablePath stopFile statusFile
  * exit codes: 0 = clean run (benign race losses excluded), 3 = at least
  * one non-benign service failure (details in statusFile)
  */
object ServiceRunnerChildProcess {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, stopFile, statusFile) = args
    val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .master("local[2]")
      .appName("graft-service-runner-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wc = graft.write.WriteConfig(
      parallelism = 2,
      inlineCompactDeltaCommits = 0,
      lockProvider = "file")
    var cycles = 0
    var compacts = 0
    var cleans = 0
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    def guarded(f: => Option[String]): Int =
      try { if (f.nonEmpty) 1 else 0 } catch {
        case _: graft.write.ConcurrentWriteConflictException => 0
        case _: graft.write.LockAcquireException => 0
        case e: Throwable =>
          errors += e.toString
          0
      }
    // live progress channel for the parent: the status file proper is
    // written once at exit, so without this the parent can only bound the
    // race by WALL CLOCK — which flakes when suite-wide load starves this
    // JVM's startup (observed: one cycle total in a 30s window). One small
    // atomic-ish write per cycle; the parent polls it to wait on PROGRESS.
    val progressPath = java.nio.file.Paths.get(statusFile + ".progress")
    while (!new java.io.File(stopFile).exists()) {
      if (GraftTable.exists(spark, tablePath)) {
        val svc = new graft.services.TableServices(
          GraftTable.load(spark, tablePath), wc)
        compacts += guarded(svc.compact())
        cleans += guarded(svc.clean(6))
        cycles += 1
        try java.nio.file.Files.write(progressPath,
          s"$cycles $compacts\n".getBytes("UTF-8"))
        catch { case _: Throwable => () }
      }
      Thread.sleep(25)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(statusFile),
      (s"cycles=$cycles compacts=$compacts cleans=$cleans errors=${errors.size}\n" +
        errors.take(5).mkString("\n")).getBytes("UTF-8"))
    System.exit(if (errors.isEmpty) 0 else 3)
  }
}
