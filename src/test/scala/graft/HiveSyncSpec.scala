package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Catalog sync against an embedded Hive metastore (ref: hudi-sync/
  * hudi-hive-sync/.../HiveSyncTool.java + HoodieHiveClient.java):
  * the assertions run in a forked JVM whose SparkSession is genuinely
  * `catalogImplementation=hive` over a Derby-backed metastore — the
  * static conf cannot be switched on the suite's shared session. See
  * [[HiveSyncChildProcess]] for what is proven: table + partition
  * registration, incremental partition diff, schema evolution,
  * catalog-name reads with the partition filter pushed into the scan.
  *
  * The sync registers a Spark DATASOURCE table (`USING graft`), which
  * any Spark cluster sharing the metastore resolves and plans from the
  * commit manifest. Non-Spark engines (Presto/Trino/Hive QL) use the
  * EXPORT RECIPE instead (raw-path registration would double-count
  * superseded file versions without a version-filtering input format
  * like the reference's HoodieParquetInputFormat): the child process
  * also drives SnapshotExporter → plain parquet → plain HMS entry and
  * proves the registered export reads back exactly equal to the graft
  * snapshot. See README "Reading from non-Spark engines".
  */
class HiveSyncSpec extends AnyFunSuite {

  test("HMS-backed catalog sync: register, diff partitions, evolve, read by name") {
    val work = Files.createTempDirectory("graft_hive_").toString
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
      s"-Dderby.system.home=$work/derby",
      "-Xmx3g", "-cp", cp, "graft.HiveSyncChildProcess", work)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val log = new java.io.File(work, "child.log")
    pb.redirectOutput(log)
    val child = pb.start()
    assert(child.waitFor(420, java.util.concurrent.TimeUnit.SECONDS),
      "hive sync child hung")
    assert(child.exitValue() === 0, "hive sync child failed:\n" +
      new String(Files.readAllBytes(log.toPath)).takeRight(6000))
  }
}
