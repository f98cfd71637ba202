package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftTableConfig, GraftTableType}
import graft.write.{GraftWriteClient, WriteConfig}

/** Pins the two soundness guards around external paths and bloom loads:
  * decodedFullPath must keep scheme + authority (an adopted file resolves
  * on the SOURCE's filesystem) while still decoding %xx escapes, and the
  * loadBlooms size cap must trip BEFORE any driver-side read, degrading
  * to "no blooms" — which every caller treats as scan-everything.
  */
class PathCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-path-codec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decodedFullPath keeps scheme+authority and decodes escapes") {
    import GraftWriteClient.{decodedFullPath, decodedPath}
    assert(decodedFullPath("s3a://bucket/data/f%20x.parquet") ===
      "s3a://bucket/data/f x.parquet")
    assert(decodedFullPath("hdfs://nn:8020/warehouse/t/f.parquet") ===
      "hdfs://nn:8020/warehouse/t/f.parquet")
    assert(decodedFullPath("file:///tmp/a%3Db/f.parquet") === "file:/tmp/a=b/f.parquet")
    // schemeless input passes through as a plain decoded path
    assert(decodedFullPath("/tmp/x/f.parquet") === "/tmp/x/f.parquet")
    // decodedPath (used for staged-path joins) stays path-only
    assert(decodedPath("file:///tmp/a/f.parquet") === "/tmp/a/f.parquet")
  }

  test("loadBlooms trips its size cap before reading and callers stay sound") {
    val dir = Files.createTempDirectory("graft_cap_").toString
    val t = GraftTable.create(spark, dir + "/t", GraftTableConfig(
      tableName = "cap", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("n_nationkey"), partitionFields = Seq("n_regionkey"),
      precombineField = None))
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    new GraftWriteClient(t, WriteConfig(bloomExpectedEntries = 512)).bulkInsert(nation)
    val names = t.timeline.metadataOf(t.timeline.completedData.head).files.map(_.fileName)
    val loaded = GraftWriteClient.loadBlooms(spark, t.storage, names)
    assert(loaded.keySet === names.toSet) // under the cap: all blooms load
    // over a 1-byte cap: nothing loads, nothing throws
    assert(GraftWriteClient.loadBlooms(spark, t.storage, names, maxBytes = 1L).isEmpty)
    // the read path treats the empty map as scan-everything: point reads
    // remain exact when the cap denies the bloom prune
    val r = new graft.read.GraftReadClient(t)
    assert(r.dataOnly(r.readByKeys(Seq("3"))).count() === 1)
  }
}
