package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.utilities.{AvroDecode, IngestConfig, IngestRunner}

/** The Avro Object Container File source (ref: hudi-utilities/.../sources/
  * AvroDFSSource.java): distributed, SPLITTABLE reads of .avro files on
  * avro-core — no spark-avro module — plus the executor-side OCF writer
  * used to produce fixtures. The split contract (sync-seek + pastSync
  * drain) is what lets one multi-GB container file fan out across
  * executors, so it gets its own boundary test here.
  */
class AvroFilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-avro-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")

  private def tmp(): String = Files.createTempDirectory("graft_avro_").toString

  private val ordersSchema = """{
    "type": "record", "name": "Ord", "fields": [
      {"name": "o_orderkey", "type": "long"},
      {"name": "o_custkey", "type": "long"},
      {"name": "o_orderstatus", "type": "string"},
      {"name": "o_totalprice", "type": "double"},
      {"name": "o_orderpriority", "type": "string"}
    ]}"""

  private def ordersSlim: DataFrame = orders.select(
    col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
    col("o_totalprice"), col("o_orderpriority"))

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("avro OCF round trip, split boundaries exact") {
    val dir = tmp()
    // small sync interval -> many blocks; tiny splits -> many ranges per
    // file. Every row must appear exactly once across all range tasks.
    AvroDecode.writeAvroFiles(ordersSlim.repartition(3), ordersSchema, dir,
      syncBytes = 2048)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
    assert(files.length === 3)
    val back = AvroDecode.readAvroFiles(spark, Seq(dir), splitBytes = 4096)
    assert(back.rdd.getNumPartitions > files.length,
      "tiny splitBytes must produce more ranges than files")
    assertSameRows(back, ordersSlim)
    // and an unsplit read agrees
    assertSameRows(AvroDecode.readAvroFiles(spark, Seq(dir)), ordersSlim)
  }

  test("avro OCF round trip: nested records, logical types, nullable unions") {
    val nestedSchema = """{
      "type": "record", "name": "Trip", "fields": [
        {"name": "id", "type": "long"},
        {"name": "fare", "type": {"type": "record", "name": "Fare", "fields": [
          {"name": "amount", "type": "double"},
          {"name": "currency", "type": ["null", "string"], "default": null}
        ]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "height", "type": {"type": "bytes", "logicalType": "decimal",
          "precision": 10, "scale": 3}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "blob", "type": ["null", "bytes"], "default": null}
      ]}"""
    val rows = (0L until 50L).map { i =>
      Row(i, Row(i * 1.5, if (i % 3 == 0) null else s"c$i"),
        Seq(s"t$i", "x"), Map("a" -> i, "b" -> (i * 2)),
        new java.math.BigDecimal(s"$i.25").setScale(3),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000 + i)),
        java.sql.Timestamp.valueOf(s"2021-01-01 00:00:${i % 60}.123456"),
        if (i % 4 == 0) null else Array.fill(3)(i.toByte))
    }
    val sparkSchema = AvroDecode.sparkType(
      new org.apache.avro.Schema.Parser().parse(nestedSchema))
      .asInstanceOf[StructType]
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), sparkSchema)
    val dir = tmp()
    AvroDecode.writeAvroFiles(df, nestedSchema, dir, syncBytes = 1024)
    val back = AvroDecode.readAvroFiles(spark, Seq(dir), splitBytes = 2048)
    // binary columns defeat exceptAll's value equality on arrays; compare
    // on a stable projection with the blob hex-encoded
    def proj(d: DataFrame) = d.select(col("id"), col("fare.amount"),
      col("fare.currency"), col("tags"), map_entries(col("attrs")).as("ae"),
      col("height"), col("day"), col("at"), hex(col("blob")).as("bh"))
    assertSameRows(proj(back), proj(df))
  }

  test("avro OCF schema evolution: reader schema adds a defaulted field, drops one") {
    val dir = tmp()
    AvroDecode.writeAvroFiles(ordersSlim, ordersSchema, dir)
    val readerSchema = """{
      "type": "record", "name": "Ord", "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_orderstatus", "type": "string"},
        {"name": "o_totalprice", "type": "double"},
        {"name": "o_channel", "type": "string", "default": "store"}
      ]}"""
    val back = AvroDecode.readAvroFiles(spark, Seq(dir), Some(readerSchema))
    assert(back.columns.toSeq ===
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_channel"))
    assertSameRows(back,
      ordersSlim.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("store").as("o_channel")))
  }

  test("avro DFS ingest: checkpointed rounds, second batch wins on precombine") {
    val src = tmp()
    val target = tmp() + "/t"
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def stamp(sub: String, t: Long): Unit =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$src/$sub"))
        .foreach(st => fs.setTimes(st.getPath, t, t))
    val cfg = IngestConfig(
      sourcePath = src, sourceFormat = "avro", targetPath = target,
      tableOptions = Map(
        "recordkey.field" -> "o_orderkey",
        "partitionpath.field" -> "o_orderpriority",
        "precombine.field" -> "o_totalprice"))
    AvroDecode.writeAvroFiles(ordersSlim, ordersSchema, s"$src/b1")
    stamp("b1", 1000000L)
    assert(IngestRunner.runOnce(spark, cfg) === Some("1000000"))
    // nothing new -> no commit
    assert(IngestRunner.runOnce(spark, cfg) === None)
    AvroDecode.writeAvroFiles(
      ordersSlim.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 900.0),
      ordersSchema, s"$src/b2")
    stamp("b2", 2000000L)
    assert(IngestRunner.runOnce(spark, cfg) === Some("2000000"))
    val got = spark.read.format("graft").load(target)
      .select(col("o_orderkey"), col("o_totalprice"))
    val want = ordersSlim.select(col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 900.0)
        .otherwise(col("o_totalprice")).as("o_totalprice"))
    assertSameRows(got, want)
  }
}
