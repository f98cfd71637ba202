package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftTableConfig, GraftTableType, MetaColumns}
import graft.write.{GraftWriteClient, MergeKernel, WriteConfig}

/** Pins the r18 optimization internals:
  *
  *  - the bloom sidecar's two write homes agree: a small commit writes it
  *    driver-side (parquet-hadoop, zero Spark actions) and a commit past
  *    the driver budget writes it distributed — loadBlooms must read both
  *    forms identically, and every bloom must answer for its file's keys;
  *  - collapseVersions' max_by fast path: an all-desc-nulls-last ranking
  *    plans NO Window operator and returns exactly the rows the window
  *    formulation returns (bit-identical latest-wins pick).
  */
class PublishFastPathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-publish-fastpath")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // getOrCreate() shares ONE session across suites in this JVM — the
    // extension must be here or a later suite's SQL DDL tests lose it
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCow(name: String, bloomEntries: Long): GraftTable =
    GraftTable.create(spark,
      Files.createTempDirectory(s"graft_${name}_").toString + "/t",
      GraftTableConfig(tableName = name, tableType = GraftTableType.Cow,
        recordKeyFields = Seq("o_orderkey"),
        partitionFields = Seq("o_orderpriority"),
        precombineField = Some("o_totalprice")))

  private def orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("driver-side sidecar write and load round-trip, blooms answer") {
    val t = freshCow("sc_small", 4096)
    // small commit: files x bloomBytes is far under the driver budget, so
    // the sidecar must come out of the driver-side writer
    new GraftWriteClient(t, WriteConfig(
      targetFileSizeBytes = 4L * 1024 * 1024,
      smallFileLimitBytes = 3L * 1024 * 1024,
      defaultRecordSizeBytes = 64,
      bloomExpectedEntries = 4096)).bulkInsert(orders)
    val meta = t.timeline.metadataOf(t.timeline.completedData.last)
    val names = meta.files.map(_.fileName)
    assert(names.nonEmpty)
    val blooms = GraftWriteClient.loadBlooms(spark, t.storage, names)
    assert(blooms.keySet === names.toSet)
    // every stored key must hit its own file's bloom (no false negatives)
    val byFile = spark.read.parquet(
      meta.files.map(f => t.storage.dataFilePath(f.partition, f.fileName).toString): _*)
      .select(input_file_name().as("f"), col(MetaColumns.RecordKey).as("k"))
      .collect()
      .groupBy(r => GraftWriteClient.decodedPath(r.getString(0))
        .split('/').last)
      .view.mapValues(_.map(_.getString(1))).toMap
    byFile.foreach { case (name, keys) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(blooms(name)))
      keys.foreach(k => assert(bf.mightContainString(k), s"$name missed $k"))
    }
  }

  test("oversized bloom budget falls back to the distributed sidecar write") {
    // bloomExpectedEntries sized so ONE bloom already exceeds the driver
    // budget: 32 MiB / ~9.6 bits-per-entry-at-1% → > ~28M entries
    val entries = 40L * 1000 * 1000
    assert(GraftWriteClient.bloomBytesOf(entries, 0.01) >
      GraftWriteClient.DriverBloomCollectMaxBytes)
    val t = freshCow("sc_big", entries)
    new GraftWriteClient(t, WriteConfig(
      bloomExpectedEntries = entries)).bulkInsert(orders.limit(500))
    val meta = t.timeline.metadataOf(t.timeline.completedData.last)
    val names = meta.files.map(_.fileName)
    // the distributed path wrote a sidecar too, and it loads identically
    // (cap raised: a 40M-entry bloom is ~46 MB on disk by design here)
    val blooms = GraftWriteClient.loadBlooms(spark, t.storage, names,
      maxBytes = 1L << 30)
    assert(blooms.keySet === names.toSet)
    assert(blooms.values.forall(_.length > 1000))
  }

  test("driver staged stats equal a Spark recomputation, per file and type") {
    import org.apache.spark.sql.types._
    // mixed stat types through the REAL write (publishStaged routes small
    // parquet commits through stagedFileStatsDriver), then re-derive every
    // stat from the published files with Spark aggregates and compare
    // VALUE-equal through ColumnStats.compare — the contract the prune
    // actually consumes
    val src = orders.limit(700).select(
      col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
      col("o_custkey"),
      col("o_orderstatus").as("s"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("dec"),
      to_date(col("o_orderdate")).as("dt"),
      col("o_orderdate").cast("timestamp").as("tstamp"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_dstats_").toString + "/t",
      GraftTableConfig(tableName = "dstats", tableType = GraftTableType.Cow,
        recordKeyFields = Seq("o_orderkey"),
        partitionFields = Seq("o_orderpriority"),
        precombineField = Some("o_totalprice")))
    // NO timestamp column here: Spark's default parquet output writes
    // INT96 timestamps, which the driver path refuses by design — with
    // one in the stats set this spec would silently validate the
    // distributed job against itself (the INT96 guard is pinned below)
    val statCols = Seq("o_custkey", "o_totalprice", "s", "dec", "dt")
    new GraftWriteClient(t, WriteConfig(
      targetFileSizeBytes = 64L * 1024,
      defaultRecordSizeBytes = 64,
      bloomExpectedEntries = 4096,
      colStatsColumns = statCols)).bulkInsert(src)
    val meta = t.timeline.metadataOf(t.timeline.completedData.last)
    assert(meta.files.nonEmpty)
    // the driver path must actually ENGAGE for these files/columns …
    val statuses = meta.files.map(f =>
      t.storage.fs.getFileStatus(t.storage.dataFilePath(f.partition, f.fileName)))
    val fileSchema = graft.GraftTable.fileSchemaOf(
      t.storedDataSchema.get)
    assert(GraftWriteClient.stagedFileStatsDriver(
      t.storage, statuses, 4096, 0.01, statCols, fileSchema).isDefined)
    // … and refuse an INT96 timestamp stats column (falls back to the job)
    assert(GraftWriteClient.stagedFileStatsDriver(
      t.storage, statuses, 4096, 0.01, statCols :+ "tstamp", fileSchema).isEmpty)
    meta.files.foreach { f =>
      val df = spark.read.parquet(
        t.storage.dataFilePath(f.partition, f.fileName).toString)
      assert(f.records === df.count(), s"records of ${f.fileName}")
      val keyRow = df.agg(
        min(col(graft.core.MetaColumns.RecordKey)),
        max(col(graft.core.MetaColumns.RecordKey))).head
      assert(f.minKey === keyRow.getString(0), s"minKey of ${f.fileName}")
      assert(f.maxKey === keyRow.getString(1), s"maxKey of ${f.fileName}")
      statCols.foreach { c =>
        val field = df.schema(c)
        val exprs = graft.core.ColumnStats.statExprs(field)
        val row = df.agg(exprs.head, exprs.tail :+ count(col(c)): _*).head
        val (expMn, expMx, nonNull) =
          (row.getString(0), row.getString(1), row.getLong(2))
        val stored = f.colStats(c)
        // value-equality through the prune's own typed comparison: the
        // driver path may render "10.50" where Spark renders "10.5"
        def sameVal(a: String, b: String): Boolean = field.dataType match {
          case StringType => a == b
          case DateType =>
            java.time.LocalDate.parse(a) == java.time.LocalDate.parse(b)
          case _ =>
            new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) == 0
        }
        assert(sameVal(stored.head, expMn), s"$c min: ${stored.head} vs $expMn")
        assert(sameVal(stored(1), expMx), s"$c max: ${stored(1)} vs $expMx")
        assert(f.colNulls(c) === f.records - nonNull, s"$c nulls")
      }
    }
    // and the blooms written through the driver stats path still answer
    val blooms = GraftWriteClient.loadBlooms(
      spark, t.storage, meta.files.map(_.fileName))
    assert(blooms.keySet === meta.files.map(_.fileName).toSet)
  }

  test("MOR read: the delta row gate forces the shuffle merge, identical rows") {
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_rowgate_").toString + "/t",
      GraftTableConfig(tableName = "rowgate", tableType = GraftTableType.Mor,
        recordKeyFields = Seq("o_orderkey"),
        partitionFields = Seq("o_orderpriority"),
        precombineField = Some("o_totalprice")))
    val w = new GraftWriteClient(t, WriteConfig(inlineCompactDeltaCommits = 0))
    val src = orders.limit(800)
    w.bulkInsert(src)
    w.upsert(src.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 5.0))
    val r = new graft.read.GraftReadClient(t)
    // default gate: the broadcast merge plan (delta-latest is a collected
    // LocalRelation; base rows stream through BroadcastHashJoin)
    val fastPlan = r.snapshot().queryExecution.executedPlan.toString
    assert(fastPlan.contains("BroadcastHashJoin"),
      "small delta debt must take the broadcast merge plan")
    val fast = r.snapshotData().orderBy("o_orderkey").collect().map(_.toSeq)
    // row gate tripped: identical rows from the clustered shuffle plan,
    // regardless of how small the delta BYTES look
    spark.conf.set("spark.graft.read.maxBroadcastDeltaRows", "1")
    try {
      val slowPlan = r.snapshot().queryExecution.executedPlan.toString
      assert(!slowPlan.contains("BroadcastHashJoin"),
        "past the row gate nothing may be broadcast")
      val slow = r.snapshotData().orderBy("o_orderkey").collect().map(_.toSeq)
      assert(slow.toSeq === fast.toSeq)
    } finally spark.conf.unset("spark.graft.read.maxBroadcastDeltaRows")
  }

  test("compaction honors the delta row gate; folded table identical") {
    import graft.services.TableServices
    def build(name: String): GraftTable = {
      val t = GraftTable.create(spark,
        Files.createTempDirectory(s"graft_$name").toString + "/t",
        GraftTableConfig(tableName = name, tableType = GraftTableType.Mor,
          recordKeyFields = Seq("o_orderkey"),
          partitionFields = Seq("o_orderpriority"),
          precombineField = Some("o_totalprice")))
      val w = new GraftWriteClient(t, WriteConfig(inlineCompactDeltaCommits = 0))
      val src = orders.limit(800)
      w.bulkInsert(src)
      w.upsert(src.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 9.0))
      w.delete(src.filter(col("o_orderkey") % 5 === 0)
        .select("o_orderkey", "o_orderpriority"))
      t
    }
    val tFast = build("cgate_fast")
    new TableServices(tFast, WriteConfig()).compact()
    val tSlow = build("cgate_slow")
    spark.conf.set("spark.graft.read.maxBroadcastDeltaRows", "1")
    try new TableServices(tSlow, WriteConfig()).compact()
    finally spark.conf.unset("spark.graft.read.maxBroadcastDeltaRows")
    def rows(t: GraftTable) = new graft.read.GraftReadClient(t)
      .snapshotData().orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(rows(tSlow) === rows(tFast))
    // both compactions really folded the deltas away
    Seq(tFast, tSlow).foreach { t =>
      assert(t.view.latestSlices(None).forall(_.deltas.isEmpty))
    }
  }

  test("tag join falls back to the shuffle plan past the broadcast budget") {
    val t = freshCow("taggate", 4096)
    val w = new GraftWriteClient(t, WriteConfig(
      targetFileSizeBytes = 256L * 1024,
      defaultRecordSizeBytes = 64))
    val src = orders.limit(600)
    w.bulkInsert(src)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // 600 keys x TagBroadcastBytesPerKey is ~38 KB — force it past the
    // budget so tagByIndex must take the shuffle-join branch
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
    try w.upsert(src.withColumn("o_totalprice", col("o_totalprice") + 7.0))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val snap = new graft.read.GraftReadClient(t).snapshotData()
    assert(snap.count() === 600)
    val got = snap.agg(sum("o_totalprice")).head.getDouble(0)
    val want = src.agg(sum(col("o_totalprice") + 7.0)).head.getDouble(0)
    assert(math.abs(got - want) < 1e-6,
      "every row must carry the update written through the fallback tag join")
  }

  test("driver fold: argmax-identical to the plan-side collapse and the shuffle merge") {
    // MULTI-VERSION deltas: two upserts touch overlapping keys, then a
    // delete — the driver fold must pick among 2-3 versions per key
    // (newest (commit_time, seqno) wins) exactly as the max_by plan and
    // the clustered window merge do.
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_dfold_").toString + "/t",
      GraftTableConfig(tableName = "dfold", tableType = GraftTableType.Mor,
        recordKeyFields = Seq("o_orderkey"),
        partitionFields = Seq("o_orderpriority"),
        precombineField = Some("o_totalprice")))
    val w = new GraftWriteClient(t, WriteConfig(inlineCompactDeltaCommits = 0))
    val src = orders.limit(800)
    w.bulkInsert(src)
    w.upsert(src.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 5.0))
    w.upsert(src.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 11.0))
    w.delete(src.filter(col("o_orderkey") % 10 === 7)
      .select("o_orderkey", "o_orderpriority"))
    val r = new graft.read.GraftReadClient(t)
    val fast = r.snapshotData().orderBy("o_orderkey").collect().map(_.toSeq)
    // the shuffle merge (row gate tripped) is the reference semantics
    spark.conf.set("spark.graft.read.maxBroadcastDeltaRows", "1")
    try {
      val slow = r.snapshotData().orderBy("o_orderkey").collect().map(_.toSeq)
      assert(fast.toSeq === slow.toSeq)
    } finally spark.conf.unset("spark.graft.read.maxBroadcastDeltaRows")
    // unit equivalence: collapseLatestDriver over a frame with version
    // fan-out equals collapseVersions' plan-side argmax, row for row
    import spark.implicits._
    val df = Seq(
      ("p1", "k1", "001", "0000000000000000001", "a1"),
      ("p1", "k1", "002", "0000000000000000007", "a2"),
      ("p1", "k1", "002", "0000000000000000003", "a2lo"),
      ("p1", "k2", "001", "0000000000000000002", "b1"),
      ("p2", "k1", "003", "0000000000000000004", "c3"),
      ("p2", "k1", "001", "0000000000000000009", "c1"))
      .toDF("part", "key", MetaColumns.CommitTime, MetaColumns.CommitSeqno, "payload")
    val (rows, attrs) = MergeKernel.collapseLatestDriver(
      df, Seq("part", "key"), Seq(MetaColumns.CommitTime, MetaColumns.CommitSeqno))
    val folded = org.apache.spark.sql.graft.Shims.localDf(spark, attrs, rows)
      .orderBy("part", "key").collect().map(_.toSeq)
    val planned = MergeKernel.collapseVersions(
      df, Seq(col("part"), col("key")),
      Seq(col(MetaColumns.CommitTime).desc, col(MetaColumns.CommitSeqno).desc),
      "overwrite_latest", "_g_rank")
      .orderBy("part", "key").collect().map(_.toSeq)
    assert(folded.toSeq === planned.toSeq)
    assert(folded.map(_(4)).toSet === Set("a2", "b1", "c3"))
  }

  test("max_by collapse: no Window operator, window-identical rows") {
    import spark.implicits._
    // versions of 6 keys across 3 "commits", including null keys' absence
    // and multiple versions per key
    val df = Seq(
      ("p1", "k1", "001", "a1"), ("p1", "k1", "002", "a2"), ("p1", "k1", "003", "a3"),
      ("p1", "k2", "001", "b1"), ("p1", "k2", "003", "b3"),
      ("p2", "k1", "002", "c2"),
      ("p2", "k3", "001", "d1"), ("p2", "k3", "002", "d2"))
      .toDF("part", "key", "commit", "payload")
    val parts = Seq(col("part"), col("key"))
    val fastOrder = Seq(col("commit").desc, col("payload").desc)
    val fast = MergeKernel.collapseVersions(
      df, parts, fastOrder, "overwrite_latest", "_g_rank")
    assert(!fast.queryExecution.executedPlan.toString.contains("Window"),
      "all-desc-nulls-last ranking must plan the max_by aggregate")
    assert(fast.columns.toSeq === df.columns.toSeq)
    // a desc_nulls_first ordering must keep the window fallback
    val slow = MergeKernel.collapseVersions(
      df, parts, Seq(col("commit").desc_nulls_first, col("payload").desc),
      "overwrite_latest", "_g_rank")
    assert(slow.queryExecution.executedPlan.toString.contains("Window"))
    // and both pick the same latest-wins rows
    val f = fast.orderBy("part", "key").collect().map(_.toSeq)
    val s = slow.orderBy("part", "key").collect().map(_.toSeq)
    assert(f.toSeq === s.toSeq)
    assert(f.length === 4)
    assert(f.map(_(3)).toSet === Set("a3", "b3", "c2", "d2"))
  }
}
