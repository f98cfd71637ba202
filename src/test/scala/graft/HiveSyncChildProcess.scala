package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.utilities.CatalogSync
import graft.write.{GraftWriteClient, WriteConfig}

/** Forked-JVM Hive-metastore sync proof (ref: hudi-sync/hudi-hive-sync/
  * .../HiveSyncTool.java:144-255 + HoodieHiveClient partition
  * registration): a REAL `spark.sql.catalogImplementation=hive` session
  * backed by an embedded Derby metastore — forked because the catalog
  * implementation is a static conf the shared test session can't switch.
  * Registers a graft table through CatalogSync into the HMS-backed
  * external catalog, evolves its schema, diffs partitions incrementally,
  * and reads back BY CATALOG NAME with the partition filter pushed into
  * the graft relation scan.
  *
  * args: workDir (scratch for warehouse + metastore + table)
  * exit codes: 0 = all assertions held, 1 = failure (stack in log)
  */
object HiveSyncChildProcess {
  def main(args: Array[String]): Unit = {
    val Array(workDir) = args
    val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .master("local[2]")
      .appName("graft-hive-sync-child")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$workDir/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      require(spark.sharedState.externalCatalog.unwrapped.getClass.getName
        .contains("Hive"), "session is not HMS-backed")

      val path = s"$workDir/t_hive"
      val t = GraftTable.create(spark, path, GraftTableConfig(
        tableName = "t_hive", tableType = GraftTableType.Mor,
        recordKeyFields = Seq("o_orderkey"),
        partitionFields = Seq("o_orderpriority"),
        precombineField = Some("o_totalprice")))
      val wc = WriteConfig(inlineCompactDeltaCommits = 0)
      val w = new GraftWriteClient(t, wc)
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderkey") < 400)
      val firstParts = Seq("1-URGENT", "2-HIGH")
      w.bulkInsert(orders.filter(col("o_orderpriority").isInCollection(firstParts)))

      // first sync: creates snapshot + _ro entries in the Hive catalog
      val r1 = CatalogSync.sync(spark, path, "graft_hive_t")
      require(r1.map(_.table).sorted == Seq("graft_hive_t", "graft_hive_t_ro"),
        s"expected rt+ro registration, got ${r1.map(_.table)}")
      require(r1.forall(_.created), "first sync must create both entries")
      require(r1.head.newPartitions.toSet == firstParts.toSet,
        s"first sync partitions: ${r1.head.newPartitions}")
      require(spark.sharedState.externalCatalog
        .tableExists("default", "graft_hive_t"), "table missing from HMS")

      // read back BY CATALOG NAME through the metastore
      val byName = spark.table("graft_hive_t")
      require(byName.count() == orders
        .filter(col("o_orderpriority").isInCollection(firstParts)).count(),
        "catalog-name read row count")

      // partition filter is pushed into the graft relation scan (manifest
      // partition pruning happens behind it — GraftRelation
      // .partitionCandidates); PushedFilters in the scan node proves the
      // filter reached buildScan rather than being applied post-scan only
      val pruned = spark.table("graft_hive_t")
        .filter(col("o_orderpriority") === "1-URGENT")
      val plan = pruned.queryExecution.executedPlan.toString
      require(plan.contains("PushedFilters") && plan.contains("o_orderpriority"),
        s"partition filter not pushed into the catalog-name scan:\n$plan")
      require(pruned.count() ==
        orders.filter(col("o_orderpriority") === "1-URGENT").count())

      // incremental partition diff: a commit into a NEW partition shows
      // up in the next sync, already-known ones do not repeat
      w.upsert(orders.filter(col("o_orderpriority") === "3-MEDIUM"))
      val r2 = CatalogSync.sync(spark, path, "graft_hive_t")
      require(r2.forall(!_.created), "second sync must not recreate")
      require(r2.head.newPartitions == Seq("3-MEDIUM"),
        s"incremental partition diff: ${r2.head.newPartitions}")
      val props = spark.sharedState.externalCatalog
        .getTable("default", "graft_hive_t").properties
      require(props.get(CatalogSync.PartitionsProp)
        .exists(_.split(',').toSet == Set("1-URGENT", "2-HIGH", "3-MEDIUM")),
        s"partition registry property: ${props.get(CatalogSync.PartitionsProp)}")
      require(props.getOrElse(CatalogSync.LastSyncProp, "") ==
        t.timeline.lastCompletedData.map(_.ts).getOrElse(""),
        "last-sync instant property must track the newest commit")

      // schema evolution lands in the HMS entry on the next sync
      val t2 = GraftTable.load(spark, path)
      val w2 = new GraftWriteClient(t2, wc)
      w2.upsert(orders.filter(col("o_orderpriority") === "3-MEDIUM")
        .withColumn("o_extra", lit("x")))
      val r3 = CatalogSync.sync(spark, path, "graft_hive_t")
      require(r3.head.schemaUpdated, "schema evolution not synced")
      require(spark.table("graft_hive_t").columns.contains("o_extra"),
        "evolved column missing from catalog-name read")

      // the MOR read-optimized registration reads (bases only)
      require(spark.table("graft_hive_t_ro").count() > 0, "_ro read")

      // ------------------------------------------------------------------
      // The NON-SPARK ENGINE read recipe (the supported Trino/Presto/Hive
      // path, replacing the reference's HoodieParquetInputFormat):
      // SnapshotExporter → plain partitioned parquet → a PLAIN parquet
      // catalog entry. The export contains exactly one live version per
      // row (no superseded files to double-count), so any engine that
      // reads HMS parquet tables consumes it correctly with no
      // graft-aware input format. See README "Reading from non-Spark
      // engines".
      // ------------------------------------------------------------------
      val exportDir = s"$workDir/t_hive_export"
      graft.utilities.SnapshotExporter.exportColumnar(spark, path, exportDir)
      spark.sql(
        s"""CREATE TABLE graft_hive_t_export
           |USING parquet
           |LOCATION '$exportDir'""".stripMargin)
      spark.sql("MSCK REPAIR TABLE graft_hive_t_export")
      require(spark.sharedState.externalCatalog
        .tableExists("default", "graft_hive_t_export"),
        "export table missing from HMS")
      // catalog-name read of the EXPORT == the graft snapshot, column for
      // column (partition column comes back from the dir layout)
      val snapNow = new graft.read.GraftReadClient(GraftTable.load(spark, path))
        .snapshotData()
      val exp = spark.table("graft_hive_t_export")
        .select(snapNow.columns.map(col).toSeq: _*)
      require(exp.exceptAll(snapNow).count() == 0 &&
        snapNow.exceptAll(exp).count() == 0,
        "exported catalog table must equal the graft snapshot exactly")
      // and the plain entry prunes partitions like any parquet table
      val exPruned = spark.table("graft_hive_t_export")
        .filter(col("o_orderpriority") === "1-URGENT")
      require(exPruned.queryExecution.executedPlan.toString
        .contains("PartitionFilters"), "export table must partition-prune")

      // ------------------------------------------------------------------
      // LIVE read-optimized export for non-Spark engines: a symlink
      // manifest (per-partition text file listing the live BASE file
      // URIs, zero data copied) registered in the HMS through
      // SymlinkTextInputFormat + ParquetHiveSerDe — the exact layout
      // Trino/Presto/Athena consume natively (they special-case the
      // input format for columnar targets; Spark itself reads the graft
      // table directly, so content equivalence is checked by loading the
      // manifest-listed files). Refresh rides the post-compaction hook.
      // ------------------------------------------------------------------
      val manifestDir = s"$workDir/t_hive_ro_manifest"
      val hookWc = wc.copy(commitCallback = Some(
        graft.utilities.SnapshotExporter.roManifestCallback(spark, manifestDir)))
      graft.utilities.SnapshotExporter.exportSymlinkManifest(spark, path, manifestDir)
      val dataSchema = GraftTable.load(spark, path).storedDataSchema.get
      // Hive 2.3's metastore has no timestamp_ntz; parquet stores the
      // same physical INT64 either way, so register as plain timestamp
      def hiveType(dt: org.apache.spark.sql.types.DataType): String = dt match {
        case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
        case other => other.catalogString
      }
      val colsDdl = dataSchema.filterNot(_.name == "o_orderpriority")
        .map(f => s"`${f.name}` ${hiveType(f.dataType)}").mkString(", ")
      spark.sql(
        s"""CREATE TABLE graft_hive_t_ro_live ($colsDdl)
           |PARTITIONED BY (o_orderpriority STRING)
           |ROW FORMAT SERDE 'org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe'
           |STORED AS INPUTFORMAT 'org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat'
           |OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat'
           |LOCATION '$manifestDir'""".stripMargin)
      spark.sql("MSCK REPAIR TABLE graft_hive_t_ro_live")
      require(spark.sharedState.externalCatalog
        .tableExists("default", "graft_hive_t_ro_live"),
        "RO symlink-manifest table missing from HMS")
      require(spark.sharedState.externalCatalog
        .listPartitionNames("default", "graft_hive_t_ro_live").nonEmpty,
        "RO symlink-manifest partitions not discovered")

      def manifestPaths(): Seq[String] = {
        val fsm = new org.apache.hadoop.fs.Path(manifestDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fsm.listFiles(new org.apache.hadoop.fs.Path(manifestDir), true)
        val b = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName == "manifest") {
            val in = fsm.open(st.getPath)
            try b ++= scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().filter(_.nonEmpty)
            finally in.close()
          }
        }
        b.toSeq
      }
      // two compactions, each building fresh delta debt first; after each,
      // the hook-refreshed manifest must serve EXACTLY readOptimized()
      for (round <- 1 to 2) {
        val tR = GraftTable.load(spark, path)
        new GraftWriteClient(tR, hookWc).upsert(
          orders.filter(col("o_orderpriority") === "1-URGENT")
            .withColumn("o_comment", lit(s"ro-round-$round")))
        new graft.services.TableServices(GraftTable.load(spark, path), hookWc)
          .compact().getOrElse(sys.error(s"round $round compaction did not run"))
        val t3 = GraftTable.load(spark, path)
        val ro = new graft.read.GraftReadClient(t3)
        val roDf = ro.dataOnly(ro.readOptimized())
        val listed = manifestPaths()
        require(listed.nonEmpty, "manifest listed no files")
        val fromManifest = spark.read
          .schema(t3.storedFileSchema.get)
          .parquet(listed: _*)
          .select(roDf.columns.map(col).toSeq: _*)
        require(fromManifest.exceptAll(roDf).count() == 0 &&
          roDf.exceptAll(fromManifest).count() == 0,
          s"round $round: manifest-served rows != readOptimized()")
        require(roDf.filter(col("o_comment") === s"ro-round-$round").count() > 0,
          s"round $round: compacted updates missing from the RO view")
      }
      spark.stop()
      System.exit(0)
    } catch {
      case e: Throwable => e.printStackTrace(); System.exit(1)
    }
  }
}
