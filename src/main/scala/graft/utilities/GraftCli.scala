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

  private val commands: Map[String, GraftTable => DataFrame] = Map(
    "commits" -> commits, "files" -> files, "filegroups" -> fileGroups,
    "partitions" -> partitions, "savepoints" -> savepoints, "pending" -> pending)

  /** Standalone service runners — the reference ships these as separate
    * spark jobs (ref: hudi-utilities/.../HoodieCompactor.java,
    * HoodieCleaner.java, HoodieClusteringJob.java); here they are thin
    * subcommands over [[graft.services.TableServices]].
    */
  private val services: Map[String, GraftTable => Option[String]] = Map(
    "compact" -> (t => new graft.services.TableServices(t).compact()),
    // request/execute split: schedule persists a compaction plan instant;
    // execute runs the oldest pending plan (possibly from another process)
    "compact_schedule" -> (t =>
      new graft.services.TableServices(t).scheduleCompaction()),
    "compact_execute" -> { t =>
      val svc = new graft.services.TableServices(t)
      svc.pendingCompactionPlans.headOption
        .flatMap(p => svc.executeCompaction(p.instant))
    },
    "clean" -> (t => new graft.services.TableServices(t).clean()),
    "cluster" -> (t => new graft.services.TableServices(t).cluster()),
    "archive" -> (t => new graft.services.TableServices(t).archive()),
    "rollback_failed" -> (t => new graft.services.TableServices(t)
      .rollbackFailedWrites() match {
        case Seq() => None
        case ts => Some(ts.mkString(","))
      }))

  private def usage: String =
    s"usage: GraftCli <${(commands.keys ++ services.keys).toSeq.sorted.mkString("|")}> <tablePath>"

  /** `GraftCli <command> <tablePath>` — inspection commands print a
    * DataFrame; service commands run the maintenance action and print the
    * resulting instant.
    */
  def main(args: Array[String]): Unit = {
    require(
      args.length == 2 && (commands.contains(args(0)) || services.contains(args(0))),
      usage)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = GraftTable.load(spark, args(1))
    commands.get(args(0)) match {
      case Some(cmd) => cmd(table).show(200, truncate = false)
      case None =>
        val r = services(args(0))(table)
        println(s"${args(0)}: ${r.getOrElse("nothing to do")}")
    }
    spark.stop()
  }
}

/** Register a graft table in the session catalog so plain SQL reaches it
  * — the metastore-sync equivalent for Spark's own catalog
  * (ref: hudi-sync/.../HiveSyncTool.java; partition registration is
  * unnecessary here because graft reads resolve files from the commit
  * manifest, not from catalog partitions).
  */
object CatalogSync {
  def sync(spark: SparkSession, tablePath: String, tableName: String): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS $tableName USING graft " +
      s"OPTIONS (path '$tablePath')")
    spark.catalog.refreshTable(tableName)
  }
}
