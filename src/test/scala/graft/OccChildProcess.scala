package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM writer for the cross-process OCC test: a genuinely separate
  * process (own SparkSession, own timeline cache, own everything) whose
  * only contact with the parent is the table directory and a file-based
  * gate — the same isolation two writers on different hosts would have
  * (ref: hudi-client/.../transaction/
  * SimpleConcurrentFileWritesConflictResolutionStrategy.java:44-115).
  *
  * args: tablePath gateDir marker partition
  * exit codes: 0 = committed, 42 = retryable OCC conflict, 1 = other
  */
object OccChildProcess {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, gateDir, marker, partition) = args
    val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .master("local[2]")
      .appName("graft-occ-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val t = GraftTable.load(spark, tablePath)
      // the cross-process race runs THROUGH the lock-provider trait: the
      // [conflict check + publish] section takes the shared file lock,
      // so the protocol is exercised end-to-end from a foreign process
      val w = new graft.write.GraftWriteClient(t, graft.write.WriteConfig(
        targetFileSizeBytes = 256 * 1024, smallFileLimitBytes = 200 * 1024,
        defaultRecordSizeBytes = 64, parallelism = 4,
        inlineCompactDeltaCommits = 0, lockProvider = "file"))
      val rows = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === partition).limit(40)
        .withColumn("o_clerk", lit(marker))
      // The gate UDF runs inside this child's write job: it signals the
      // parent that the write has BEGUN (OCC floor recorded), then blocks
      // until the parent — having committed a conflicting write — opens
      // the gate. File-based because latches can't cross processes.
      val blockKey = rows.agg(min("o_orderkey")).head.getLong(0)
      val gateUdf = udf((k: Long) => OccFileGate.pass(k, gateDir, blockKey))
      w.upsert(rows.withColumn("o_orderkey", gateUdf(col("o_orderkey"))))
      System.exit(0)
    } catch {
      case _: graft.write.ConcurrentWriteConflictException => System.exit(42)
      case e: Throwable => e.printStackTrace(); System.exit(1)
    }
  }
}

/** Executor-visible file gate (local mode: tasks share the child JVM). */
object OccFileGate {
  def pass(k: Long, gateDir: String, blockKey: Long): Long = {
    val started = new java.io.File(gateDir, "started")
    if (!started.exists()) started.createNewFile()
    if (k == blockKey) {
      val go = new java.io.File(gateDir, "go")
      val deadline = System.currentTimeMillis() + 120000
      while (!go.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    }
    k
  }
}
