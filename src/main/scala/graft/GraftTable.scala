package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core._

/** Handle to a Graft table: storage + config + timeline + file-system view.
  *
  * A Graft table is a directory of parquet files plus a `.graft/` commit
  * log; semantically equivalent to the reference's table layout
  * (ref: hudi-common/.../HoodieTableMetaClient.java) with the difference
  * that the commit metadata carries a full file manifest, so views are
  * derived without any storage listing (see [[graft.core.FileSystemView]]).
  */
final class GraftTable(val spark: SparkSession, val basePath: String) {
  val storage = new GraftStorage(new Path(basePath), spark.sessionState.newHadoopConf())
  val timeline = new GraftTimeline(storage)

  lazy val config: GraftTableConfig =
    Json.readTableConfig(
      storage.readString(new Path(storage.metaDir, GraftTable.ConfigFile)))

  def isMor: Boolean = config.tableType == GraftTableType.Mor

  /** Build the current file-system view: latest archived manifest (if any)
    * + active completed data instants after it. The manifest is a
    * Delta-style checkpoint written at archive time so that view
    * construction stays O(active timeline), not O(table history).
    */
  def view: FileSystemView = {
    val manifests = storage
      .listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted
    val base: Seq[(GraftInstant, GraftCommitMetadata)] = manifests.lastOption match {
      case Some(name) =>
        val ts = name.stripSuffix(".manifest")
        val meta = Json.readCommitMetadata(
          storage.readString(new Path(storage.archiveDir, name)))
        Seq((GraftInstant(ts, GraftAction.Commit, GraftState.Completed), meta))
      case None => Seq.empty
    }
    val afterTs = base.headOption.map(_._1.ts).getOrElse("")
    val active = timeline.completedData
      .filter(_.ts > afterTs)
      .map(i => (i, timeline.metadataOf(i)))
    new FileSystemView(base ++ active)
  }

  def dataFilePaths(files: Seq[WriteFileInfo]): Seq[String] =
    files.map(f => storage.dataFilePath(f.partition, f.fileName).toString)
}

object GraftTable {
  val ConfigFile = "table_config.json"

  def exists(spark: SparkSession, basePath: String): Boolean = {
    val s = new GraftStorage(new Path(basePath), spark.sessionState.newHadoopConf())
    s.exists(new Path(s.metaDir, ConfigFile))
  }

  /** Initialize a fresh table (fails if one already exists). */
  def create(spark: SparkSession, basePath: String, config: GraftTableConfig): GraftTable = {
    val t = new GraftTable(spark, basePath)
    require(!t.storage.exists(new Path(t.storage.metaDir, ConfigFile)),
      s"Graft table already exists at $basePath")
    t.storage.fs.mkdirs(t.storage.metaDir)
    t.storage.createImmutable(new Path(t.storage.metaDir, ConfigFile), Json.write(config))
    t
  }

  def load(spark: SparkSession, basePath: String): GraftTable = {
    val t = new GraftTable(spark, basePath)
    require(t.storage.exists(new Path(t.storage.metaDir, ConfigFile)),
      s"Not a Graft table: $basePath")
    t
  }

  /** Create-or-load convenience used by the writer API. */
  def getOrCreate(spark: SparkSession, basePath: String, config: => GraftTableConfig): GraftTable =
    if (exists(spark, basePath)) load(spark, basePath) else create(spark, basePath, config)
}
