package graft.utilities

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftTable
import graft.core.GraftAction

/** Timeline / file-view inspection as DataFrames, plus a `main` with
  * subcommands — covers the day-to-day of the reference CLI's 21 command
  * classes (`commits show`, `show fsview all`, `savepoints show`, ...)
  * (ref: hudi-cli/.../commands/CommitsCommand.java,
  * FileSystemViewCommand.java, SavepointsCommand.java).
  */
object GraftCli {

  /** One row per completed instant: action, operation, files/records/bytes. */
  def commits(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.timeline.completed.map { i =>
      val m = table.timeline.metadataOf(i)
      (i.ts, i.action, m.operation, m.files.size.toLong,
        m.totalRecords, m.files.map(_.bytes).sum,
        m.replacedFileIds.values.map(_.size).sum.toLong)
    }.toDF("instant", "action", "operation",
      "n_files", "total_records", "total_bytes", "n_replaced_groups")
  }

  /** One row per live file in the latest view. */
  def files(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.view.latestSlices(None)
      .flatMap(s => (s.base.toSeq ++ s.deltas).map(f =>
        (s.partition, s.fileId, f.fileName, f.records, f.bytes, f.isDelta)))
      .toDF("partition", "file_group", "file_name", "records", "bytes", "is_delta")
  }

  /** One row per live file group: slice shape + delta debt. */
  def fileGroups(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.view.latestSlices(None).map { s =>
      (s.partition, s.fileId,
        s.base.map(_.fileName).getOrElse(""),
        s.base.map(_.bytes).getOrElse(0L),
        s.deltas.size.toLong, s.deltas.map(_.bytes).sum)
    }.toDF("partition", "file_group", "base_file",
      "base_bytes", "n_deltas", "delta_bytes")
  }

  def partitions(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.view.latestSlices(None)
      .groupBy(_.partition).map { case (p, ss) =>
        (p, ss.size.toLong,
          ss.flatMap(s => s.base.toSeq ++ s.deltas).map(_.bytes).sum)
      }.toSeq.toDF("partition", "n_file_groups", "bytes")
  }

  def savepoints(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.timeline.completed
      .filter(_.action == GraftAction.Savepoint)
      .map(i => Tuple1(i.ts)).toDF("instant")
  }

  def pending(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.timeline.pending.map(i => (i.ts, i.action, i.state))
      .toDF("instant", "action", "state")
  }

  /** Archived timeline instants (ref: HoodieArchivedTimeline + the CLI's
    * `commits show archived`).
    */
  def archived(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.timeline.archivedInstants
      .map { i =>
        val m = table.timeline.archivedMetadataOf(i)
        (i.ts, i.action, m.operation, m.files.size.toLong, m.totalRecords)
      }.toDF("instant", "action", "operation", "n_files", "total_records")
  }

  /** Per-commit write amplification: records written / incoming records
    * for keyed writes that record the incoming count (bulk loads write
    * 1:1 and report NaN). (ref: hudi-cli/.../commands/StatsCommand.java
    * writeAmplificationStats)
    */
  def stats(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    table.timeline.completed
      .filter(i => graft.core.GraftAction.DataActions.contains(i.action))
      .map { i =>
        val m = table.timeline.metadataOf(i)
        val incoming = m.extra.get(
          graft.write.GraftWriteClient.IncomingRecordsKey).map(_.toLong)
        val amp = incoming.filter(_ > 0)
          .map(in => m.totalRecords.toDouble / in).getOrElse(Double.NaN)
        (i.ts, m.operation, incoming.getOrElse(-1L), m.totalRecords, amp)
      }.toDF("instant", "operation", "incoming_records",
        "records_written", "write_amplification")
  }

  /** File-size distribution of live files, per partition plus an ALL
    * row. (ref: StatsCommand.fileSizeStats histogram)
    */
  def fileSizes(table: GraftTable): DataFrame = {
    val spark = table.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sizes = table.view.latestSlices(None)
      .flatMap(s => (s.base.toSeq ++ s.deltas).map(f => (s.partition, f.bytes)))
      .toDF("partition", "bytes")
    def agg(df: DataFrame) = df.groupBy("partition").agg(
      count("*").as("n_files"), min("bytes").as("min_bytes"),
      expr("percentile_approx(bytes, 0.5)").as("p50_bytes"),
      avg("bytes").as("avg_bytes"), max("bytes").as("max_bytes"))
    agg(sizes).unionByName(agg(sizes.withColumn("partition", lit("ALL"))))
  }

  private val commands: Map[String, GraftTable => DataFrame] = Map(
    "commits" -> commits, "files" -> files, "filegroups" -> fileGroups,
    "partitions" -> partitions, "savepoints" -> savepoints, "pending" -> pending,
    "archived" -> archived, "stats" -> stats, "filesizes" -> fileSizes)

  /** Standalone service runners — the reference ships these as separate
    * spark jobs (ref: hudi-utilities/.../HoodieCompactor.java,
    * HoodieCleaner.java, HoodieClusteringJob.java); here they are thin
    * subcommands over [[graft.services.TableServices]].
    */
  /** Service runners emit operational metrics and print a compact
    * summary footer (GraftMetrics.report): a one-shot maintenance job's
    * numbers — duration, files compacted/cleaned, debt left behind —
    * are exactly what its operator reads next, and the in-memory
    * reporter makes it free.
    */
  private val cliWc = graft.write.WriteConfig(metricsOn = true)

  private val services: Map[String, GraftTable => Option[String]] = Map(
    "compact" -> (t => new graft.services.TableServices(t, cliWc).compact()),
    // request/execute split: schedule persists a compaction plan instant;
    // execute runs the oldest pending plan (possibly from another process)
    "compact_schedule" -> (t =>
      new graft.services.TableServices(t, cliWc).scheduleCompaction()),
    "compact_execute" -> { t =>
      val svc = new graft.services.TableServices(t, cliWc)
      svc.pendingCompactionPlans.headOption
        .flatMap(p => svc.executeCompaction(p.instant))
    },
    "clean" -> (t => new graft.services.TableServices(t, cliWc).clean()),
    "clean_versions" -> (t =>
      new graft.services.TableServices(t, cliWc).cleanVersions()),
    "clean_schedule" -> (t =>
      new graft.services.TableServices(t, cliWc).scheduleClean()),
    "clean_execute" -> { t =>
      val svc = new graft.services.TableServices(t, cliWc)
      svc.pendingCleanPlans.headOption.flatMap(p => svc.executeClean(p.instant))
    },
    "cluster" -> (t => new graft.services.TableServices(t, cliWc).cluster()),
    "cluster_schedule" -> (t =>
      new graft.services.TableServices(t, cliWc).scheduleClustering()),
    "cluster_execute" -> { t =>
      val svc = new graft.services.TableServices(t, cliWc)
      svc.pendingClusteringPlans.headOption
        .flatMap(p => svc.executeClustering(p.instant))
    },
    "archive" -> (t => new graft.services.TableServices(t, cliWc).archive()),
    "rollback_failed" -> (t => new graft.services.TableServices(t, cliWc)
      .rollbackFailedWrites() match {
        case Seq() => None
        case ts => Some(ts.mkString(","))
      }),
    "catalog_sync" -> { t =>
      val rs = CatalogSync.sync(t.spark, t.basePath, t.config.tableName)
      Some(rs.map(r => s"${r.table}(created=${r.created}," +
        s"schemaUpdated=${r.schemaUpdated},newPartitions=${r.newPartitions.size})")
        .mkString(", "))
    })

  private def usage: String =
    s"usage: GraftCli <${(commands.keys ++ services.keys).toSeq.sorted.mkString("|")}> <tablePath>\n" +
      "       GraftCli export <tablePath> <outDir>\n" +
      "       GraftCli export_incremental <tablePath> <outDir> <sinceInstant>"

  /** `GraftCli <command> <tablePath>` — inspection commands print a
    * DataFrame; service commands run the maintenance action and print the
    * resulting instant. The export subcommands are the non-Spark-engine
    * handoff runners (ref: HoodieSnapshotExporter.java; README "Reading
    * from non-Spark engines"): `export` writes a full plain-parquet
    * snapshot, `export_incremental` refreshes only partitions churned
    * since the printed instant of the previous run.
    */
  def main(args: Array[String]): Unit = {
    val ok = args.headOption match {
      case Some("export")             => args.length == 3
      case Some("export_incremental") => args.length == 4
      case Some(c) =>
        args.length == 2 && (commands.contains(c) || services.contains(c))
      case None => false
    }
    require(ok, usage)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "export" =>
        // resolve the cursor FIRST and pin the export to it — a commit
        // landing mid-export would otherwise be covered by the printed
        // cursor but absent from the data, permanently staling its
        // partitions for every later incremental run
        val cursor = SnapshotExporter.exportCursor(spark, args(1))
        val asOf = GraftTable.load(spark, args(1)).timeline.completedData
          .map(_.ts).filter(ts => cursor.forall(ts <= _)).lastOption
        SnapshotExporter.exportColumnar(spark, args(1), args(2), asOf = asOf)
        println(s"export: wrote snapshot at instant=${cursor.getOrElse("")} " +
          s"to ${args(2)}")
      case "export_incremental" =>
        val (ts, touched) = SnapshotExporter.exportIncrementalColumnar(
          spark, args(1), args(2), args(3))
        println(s"export_incremental: instant=$ts refreshed=${touched.size} " +
          s"partitions=${touched.take(20).mkString(",")}")
      case c =>
        val table = GraftTable.load(spark, args(1))
        commands.get(c) match {
          case Some(cmd) => cmd(table).show(200, truncate = false)
          case None =>
            val r = services(c)(table)
            println(s"$c: ${r.getOrElse("nothing to do")}")
            graft.metrics.GraftMetrics.report(System.out, table.config.tableName)
        }
    }
    spark.stop()
  }
}

/** Catalog sync: push a graft table's state into the Spark session
  * catalog after commits, mirroring the reference HiveSyncTool's loop
  * (ref: hudi-sync/hudi-hive-sync/.../HiveSyncTool.java:144-255):
  * create the table entry if absent (a MOR table registers a
  * snapshot/read-optimized pair, the reference's `_rt`/`_ro` suffix
  * convention), diff + evolve the catalog schema against the latest
  * commit's (logical) schema, then incrementally register partitions
  * written since the last sync — tracked, like the reference, by a
  * `last commit time synced` table property
  * (ref: HoodieHiveClient.getLastCommitTimeSynced /
  * getPartitionsWrittenToSince). Because graft READS resolve files from
  * the commit manifest (never from catalog partitions), the partition
  * registry is catalog metadata for external tools — correctness never
  * depends on it, which is exactly the property that makes the sync
  * safe to run lazily.
  */
object CatalogSync {

  /** Table property: last commit instant pushed to the catalog. */
  val LastSyncProp = "graft.last.sync.instant"
  /** Table property: comma-joined partitions registered so far. */
  val PartitionsProp = "graft.synced.partitions"

  final case class SyncResult(
      table: String,
      created: Boolean,
      schemaUpdated: Boolean,
      newPartitions: Seq[String])

  /** Sync `tablePath` into the session catalog as `tableName` (plus
    * `<tableName>_ro` for MOR). Idempotent; call after each commit or
    * in batches — the instant/partition diff picks up from the last run.
    */
  def sync(spark: SparkSession, tablePath: String, tableName: String): Seq[SyncResult] = {
    val t = GraftTable.load(spark, tablePath)
    val snapshot = syncOne(spark, t, tablePath, tableName, "snapshot")
    if (t.isMor)
      Seq(snapshot, syncOne(spark, t, tablePath, tableName + "_ro", "read_optimized"))
    else Seq(snapshot)
  }

  private def syncOne(
      spark: SparkSession,
      t: GraftTable,
      path: String,
      name: String,
      queryType: String): SyncResult = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val existed = catalog.tableExists(ident)
    if (!existed)
      spark.sql(s"CREATE TABLE $name USING graft " +
        s"OPTIONS (path '$path', `query.type` '$queryType')")

    // schema diff: evolve the catalog entry to the latest commit's
    // logical schema (covers ADD/RENAME/CHANGE column since last sync)
    val wanted = t.storedDataSchema.map(t.logicalizeSchema)
    val schemaUpdated = existed && wanted.exists { s =>
      val current = catalog.getTableMetadata(ident).dataSchema
      val differs =
        current.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq !=
          s.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq
      if (differs) {
        // external catalog directly: a RENAME drops the old name, which
        // SessionCatalog.alterTableDataSchema refuses
        spark.sharedState.externalCatalog.alterTableDataSchema(
          ident.database.getOrElse(catalog.getCurrentDatabase), ident.table, s)
      }
      differs
    }

    // incremental partition sync: partitions touched by commits after
    // the last synced instant (ref: getPartitionsWrittenToSince)
    val meta = catalog.getTableMetadata(ident)
    val lastSynced = meta.properties.getOrElse(LastSyncProp, "")
    val known = meta.properties.get(PartitionsProp)
      .map(_.split(',').filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val touched = t.timeline.completedData.filter(_.ts > lastSynced)
      .flatMap(i => t.timeline.metadataOf(i).files.map(_.partition))
      .distinct.filter(_.nonEmpty)
    val fresh = touched.filterNot(known)
    val latest = t.timeline.lastCompletedData.map(_.ts).getOrElse(lastSynced)
    catalog.alterTable(meta.copy(properties = meta.properties ++ Map(
      LastSyncProp -> latest,
      PartitionsProp -> (known ++ fresh).toSeq.sorted.mkString(","))))
    spark.catalog.refreshTable(name)
    SyncResult(name, created = !existed, schemaUpdated = schemaUpdated,
      newPartitions = fresh)
  }
}
