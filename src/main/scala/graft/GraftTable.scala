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

  @volatile private var _config: GraftTableConfig = _

  def config: GraftTableConfig = {
    if (_config == null)
      _config = Json.readTableConfig(
        storage.readOverwritable(new Path(storage.metaDir, GraftTable.ConfigFile)))
    _config
  }

  /** Persist an updated table config (DDL like RENAME COLUMN; single
    * writer, like the reference's table-config updates).
    */
  private[graft] def updateConfig(c: GraftTableConfig): Unit = {
    storage.overwrite(new Path(storage.metaDir, GraftTable.ConfigFile), Json.write(c))
    _config = c
  }

  // --- logical/physical column mapping (RENAME COLUMN support) ---------
  // Files and the stored schema always carry PHYSICAL names; the
  // config.columnRenames map turns them into the user-visible logical
  // names at the read boundary and back at the write boundary.

  /** Physical → logical: applied to every frame leaving a read path. */
  def logicalize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    config.columnRenames.foldLeft(df) { case (d, (phys, logical)) =>
      if (d.columns.contains(phys)) d.withColumnRenamed(phys, logical) else d
    }

  /** Logical → physical: applied to every incoming frame before writing. */
  def delogicalize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    config.columnRenames.foldLeft(df) { case (d, (phys, logical)) =>
      if (d.columns.contains(logical)) d.withColumnRenamed(logical, phys) else d
    }

  /** The user-visible name of a physical column. */
  def logicalNameOf(physical: String): String =
    config.columnRenames.getOrElse(physical, physical)

  /** The stored (physical) name behind a user-visible column name —
    * identity for columns never renamed.
    */
  def physicalNameOf(logical: String): String =
    config.columnRenames.collectFirst {
      case (p, l) if l.equalsIgnoreCase(logical) => p
    }.getOrElse(logical)

  /** Rename physical fields to their logical names in a schema. */
  def logicalizeSchema(s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    if (config.columnRenames.isEmpty) s
    else org.apache.spark.sql.types.StructType(
      s.fields.map(f => f.copy(name = logicalNameOf(f.name))))

  def isMor: Boolean = config.tableType == GraftTableType.Mor

  /** Data-column schema persisted by the most recent data commit (the
    * reference carries the writer schema in every commit's metadata —
    * ref: hudi-common/.../model/HoodieCommitMetadata.java + the
    * `hoodie.avro.schema.validate` evolution check). Readers pass it to
    * `spark.read.schema(...)` so mixed-footer scans and null-filled
    * evolution columns are always correctly typed.
    */
  def storedDataSchema: Option[org.apache.spark.sql.types.StructType] = {
    // newest data commit CARRYING a schema — metadata-only commits
    // (delete_partition, truncate) legitimately have none, and must not
    // make the table schemaless
    val active = timeline.completedData.reverseIterator
      .map(i => timeline.metadataOf(i).schemaJson)
      .find(_.nonEmpty)
    lazy val archived = storage
      .listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted.lastOption
      .map(n => Json.readCommitMetadata(
        storage.readOverwritable(new Path(storage.archiveDir, n))).schemaJson)
      .filter(_.nonEmpty)
    active.orElse(archived)
      .map(s => GraftTable.relaxNullability(
        org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Full physical schema of stored files: meta columns ++ data columns. */
  def storedFileSchema: Option[org.apache.spark.sql.types.StructType] =
    storedDataSchema.map(GraftTable.fileSchemaOf)

  /** Build the current file-system view: latest archived manifest (if any)
    * + active completed data instants after it. The manifest is a
    * Delta-style checkpoint written at archive time so that view
    * construction stays O(active timeline), not O(table history).
    */
  /** Timestamp of the newest archive checkpoint, if any. The manifest
    * only carries the LATEST file version per group as of this boundary,
    * so point-in-time reads below it are not reconstructible.
    */
  def archiveBoundary: Option[String] =
    storage.listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted.lastOption.map(_.stripSuffix(".manifest"))

  def view: FileSystemView = viewAt(None)

  /** The file-system view as of `maxTs` (inclusive) — commits newer than
    * the cap are excluded. Used by archiving to checkpoint the state AT
    * the archive boundary: a manifest must never reference files of
    * still-active commits, or a later rollback of those commits would
    * leave the manifest pointing at deleted files.
    */
  private[graft] def viewAt(maxTs: Option[String]): FileSystemView = {
    val manifests = storage
      .listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted
    val base: Seq[(GraftInstant, GraftCommitMetadata)] = manifests.lastOption match {
      case Some(name) => expandedManifest(name)
      case None       => Seq.empty
    }
    val afterTs = manifests.lastOption.map(_.stripSuffix(".manifest")).getOrElse("")
    val active = timeline.completedData
      .filter(i => i.ts > afterTs && maxTs.forall(i.ts <= _))
      .map(i => (i, timeline.metadataOf(i)))
    val cappedBase = maxTs match {
      case Some(cap) => base.filter(_._1.ts <= cap)
      case None      => base
    }
    // Clean/rollback/restore deletions are physical: apply them to every
    // view UNCAPPED by maxTs — a file deleted by a later clean must not be
    // served by an as-of view or checkpointed into an archive manifest.
    // Clean deletions additionally arm the as-of guard: time travel that
    // would have chosen a cleaned version fails loudly.
    new FileSystemView(cappedBase ++ active, physicallyDeletedFiles,
      cleanDeletedFiles)
  }

  /** The newest archive manifest, parsed once per PROCESS and re-expanded
    * into one synthetic instant per original write instant (parsed from
    * the file names — collapsing them all under the archive ts would
    * break MOR base-vs-delta ordering: latestSlices keeps deltas only
    * when delta ts > base ts). MEMOIZED process-wide by (basePath,
    * manifest name) in the companion object: even with the parquet
    * manifest format (ArchiveManifest — a distributed columnar load
    * instead of the legacy ~10 s / ~260 MB JSON parse at the 100 TB
    * shape), paying the load on EVERY view build (several per
    * write/read, and once per post-commit hook firing — each of which
    * constructs a FRESH table handle) would dominate planning, while the
    * manifest itself changes only at archive time. Manifests are
    * immutable once written (ArchiveManifest.write keeps a prior
    * attempt's bytes), so name-keyed memoization is always consistent; a
    * new archive publishes a new name and naturally invalidates.
    */
  private[graft] def expandedManifest(
      name: String): Seq[(GraftInstant, GraftCommitMetadata)] =
    GraftTable.expandedManifestCached(this, name)

  /** `partition/fileName` entries removed from storage by completed
    * clean/rollback/restore instants on the active timeline.
    */
  private[graft] def physicallyDeletedFiles: Set[String] =
    cleanDeletedFiles ++ timeline.completed
      .filter(i => i.action == GraftAction.Rollback || i.action == GraftAction.Restore)
      .flatMap(i => timeline.metadataOf(i).deletedFiles)

  /** Files deleted by CLEANS only. Unlike rollback/restore deletions
    * (which erase undone history — every surviving state is correct
    * without them), a clean destroys still-reconstructible PAST states:
    * as-of reads that would have chosen a cleaned version must fail
    * loudly instead of silently serving an older one.
    */
  private[graft] def cleanDeletedFiles: Set[String] = timeline.completed
    .filter(_.action == GraftAction.Clean)
    .flatMap(i => timeline.metadataOf(i).deletedFiles)
    .toSet

  /** Storage path of a manifest file entry: its table-layout path, or the
    * original source file for metadata-only-bootstrapped entries.
    */
  def resolveDataPath(partition: String, f: WriteFileInfo): String =
    f.externalPath.getOrElse(storage.dataFilePath(partition, f.fileName).toString)

  def dataFilePaths(files: Seq[WriteFileInfo]): Seq[String] =
    files.map(f => resolveDataPath(f.partition, f))

  /** source path -> manifest entry for every metadata-only-bootstrapped
    * file (bootstrap commits are immutable once written, so one load per
    * table handle suffices). The ACTIVE timeline alone is NOT enough:
    * once the bootstrap commit is archived, the adopted paths survive
    * only in the archive manifest — without them readDataFiles would
    * misroute adopted files to the internal branch and read NULLs for
    * every meta column (silent key corruption downstream).
    */
  private lazy val externalFiles: Map[String, WriteFileInfo] = {
    val archived = storage
      .listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted.lastOption
      .map(expandedManifest(_).flatMap(_._2.files))
      .getOrElse(Seq.empty)
    (archived ++ timeline.completedData
      .flatMap(i => timeline.metadataOf(i).files))
      .flatMap(f => f.externalPath.map(_ -> f))
      .toMap
  }

  /** Latest archive-manifest HEADER extras — carries per-instant
    * bootstrap source bases (`bootstrap.source.<ts>`) across archiving,
    * so hive-layout partition resurrection keeps its recorded base after
    * the bootstrap commit leaves the active timeline.
    */
  private lazy val manifestHeaderExtra: Map[String, String] =
    storage.listNames(storage.archiveDir)
      .filter(_.endsWith(".manifest"))
      .sorted.lastOption
      .map { n =>
        try Json.readCommitMetadata(
          storage.readOverwritable(new Path(storage.archiveDir, n))).extra
        catch { case _: Exception => Map.empty[String, String] }
      }
      .getOrElse(Map.empty)

  /** Read table data files with the stored schema applied — footer
    * sampling is never trusted for the table schema, so scans over files
    * written before a schema evolution still surface the full current
    * schema (missing columns read as typed nulls).
    *
    * Metadata-only-bootstrapped paths carry no meta columns on disk; the
    * same keygen expressions the writer would have used synthesize them
    * inside the scan (KeyGen), so downstream merge/incremental/index code
    * sees one uniform physical shape — and a bootstrapped table reads
    * each row from exactly ONE file, unlike skeleton-file stitching
    * (ref: HoodieBootstrapRelation.scala:1-195 reads skeleton + source
    * per row; deriving the columns makes the second file unnecessary).
    */
  def readDataFiles(paths: Seq[String]): org.apache.spark.sql.DataFrame =
    readDataFiles(paths, storedDataSchema)

  /** Like `readDataFiles(paths)` but with the stored DATA schema pinned by
    * the caller. Every multi-scan read plan (MOR base+delta merge,
    * compaction's broadcast kernel) MUST resolve the schema ONCE and pass
    * it to each of its scans: re-resolving per scan lets a concurrent
    * schema-evolution commit land between two scans of one plan, and the
    * plan's union fails NUM_COLUMNS_MISMATCH (base scan pre-evolution,
    * delta scan evolved). (ref: MergeOnReadSnapshotRelation.scala:94-137
    * resolves the read schema once before building splits.)
    */
  def readDataFiles(
      paths: Seq[String],
      pinnedDataSchema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.core.MetaColumns
    GraftTable.onReadDataFiles(this, paths)
    val (ext, internal) = paths.partition(externalFiles.contains)
    val internalDf =
      if (internal.isEmpty) None
      else {
        val reader = pinnedDataSchema
          .map(d => spark.read.schema(GraftTable.fileSchemaOf(d)))
          .getOrElse(spark.read)
        Some(reader.format(config.baseFileFormat).load(internal: _*))
      }
    // Hive-layout sources carry partition values only in `field=value/`
    // directory names; Spark resurrects those columns for explicit file
    // paths when given a basePath ABOVE the partition dirs. The bootstrap
    // commit records its qualified source dir for exactly this; older
    // commits without it fall back to stripping trailing `name=value`
    // components from the path — a fallback that can misfire on a FLAT
    // source living inside a `name=value`-named directory (it would
    // resurrect a phantom column), which is why the recorded base wins.
    def hiveBaseOf(p: String): String = {
      var parent = new Path(p).getParent
      while (parent != null && parent.getName.contains("=")) parent = parent.getParent
      if (parent == null) p else parent.toString
    }
    def baseOf(instant: String, p: String): String =
      timeline.completedData.find(_.ts == instant)
        .flatMap(i => timeline.metadataOf(i).extra
          .get(graft.write.GraftWriteClient.BootstrapSourceKey))
        .orElse(manifestHeaderExtra.get(
          s"${graft.write.GraftWriteClient.BootstrapSourceKey}.$instant"))
        .getOrElse(hiveBaseOf(p))
    // one frame per bootstrap instant (CommitTime is a per-instant literal)
    val extDfs = ext.groupBy(p =>
      FileSystemView.instantOfFileName(externalFiles(p).fileName))
      .toSeq.sortBy(_._1)
      .map { case (instant, ps) =>
        val reader = pinnedDataSchema.map(spark.read.schema).getOrElse(spark.read)
          .option("basePath", baseOf(instant, ps.head))
        val nameExpr = concat(graft.write.KeyGen.externalFileIdExpr,
          lit("_" + instant + config.baseFileSuffix))
        reader.format(config.baseFileFormat).load(ps: _*)
          .withColumn(MetaColumns.CommitTime, lit(instant))
          .withColumn(MetaColumns.CommitSeqno,
            concat(lit(instant + "_"), lower(hex(xxhash64(input_file_name())))))
          .withColumn(MetaColumns.RecordKey,
            graft.write.KeyGen.keyExpr(config, physicalNameOf))
          .withColumn(MetaColumns.PartitionPath,
            graft.write.KeyGen.partExpr(config, physicalNameOf))
          .withColumn(MetaColumns.FileName, nameExpr)
          .withColumn(MetaColumns.IsDeleted, lit(false))
      }
    val metaFirst = MetaColumns.AllWithDeleted
    (internalDf.toSeq ++ extDfs)
      .map(df => df.select((metaFirst ++
        df.columns.filterNot(metaFirst.contains)).map(col): _*))
      .reduce(_ unionByName _)
  }
}

object GraftTable {

  /** Full physical file schema for a data-schema snapshot:
    * meta columns ++ tombstone flag ++ data columns.
    */
  private[graft] def fileSchemaOf(
      data: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    import graft.core.MetaColumns
    StructType(
      MetaColumns.All.map(StructField(_, StringType)) ++
        Seq(StructField(MetaColumns.IsDeleted, BooleanType)) ++
        data.fields)
  }

  /** Test seam: invoked at the top of every readDataFiles call with the
    * table and the paths about to be scanned — lets concurrency specs
    * inject a commit (e.g. a schema evolution) BETWEEN the two scans of a
    * multi-scan read plan. No-op in production.
    */
  @volatile private[graft] var onReadDataFiles: (GraftTable, Seq[String]) => Unit =
    (_, _) => ()

  /** Process-wide expanded-manifest memo, keyed by table base path with
    * the manifest NAME as the validity token (names embed the archive ts,
    * and manifests are immutable once published). One entry per table —
    * a newer archive's name replaces the old expansion; a bounded LRU
    * keeps many-table processes (test suites, multi-table streamers) from
    * pinning every expansion on the driver heap. The memo is what makes
    * per-commit consumers that load a FRESH handle each time (the
    * RO-manifest post-commit hook, CLI invocations) O(active timeline)
    * instead of O(table): the 1M-entry cold load (~2-4 s,
    * PlanningScaleSpec) is paid once per archive boundary per process,
    * not once per firing.
    */
  private val manifestMemo =
    new java.util.LinkedHashMap[String, (String, Seq[(GraftInstant, GraftCommitMetadata)])](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Seq[(GraftInstant, GraftCommitMetadata)])])
          : Boolean = size > 8
    }

  /** Cold manifest loads actually performed (memo misses) — observability
    * for specs pinning the O(churn) hook contract (≤1 cold load across N
    * targeted post-commit firings).
    */
  private[graft] val manifestColdLoads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test seam: drop a table's memoized manifest expansion so scale specs
    * can measure a genuinely cold load.
    */
  private[graft] def evictManifestMemo(basePath: String): Unit =
    manifestMemo.synchronized { manifestMemo.remove(basePath); () }

  private def expandedManifestCached(
      t: GraftTable, name: String): Seq[(GraftInstant, GraftCommitMetadata)] = {
    manifestMemo.synchronized {
      val hit = manifestMemo.get(t.basePath)
      if (hit != null && hit._1 == name) return hit._2
    }
    // load OUTSIDE the memo monitor: the cold load is a distributed Spark
    // job (seconds at the 1M-entry shape) and must not serialize every
    // other table's memo hits behind it; two racers on one table do
    // redundant-but-consistent work and the last write wins.
    manifestColdLoads.incrementAndGet()
    val meta = ArchiveManifest.read(t.spark, t.storage, name)
    val expanded = meta.files
      .groupBy(f => FileSystemView.instantOfFileName(f.fileName))
      .toSeq.sortBy(_._1)
      .map { case (its, fs) =>
        (GraftInstant(its, GraftAction.Commit, GraftState.Completed),
          meta.copy(instant = its, files = fs))
      }
    manifestMemo.synchronized { manifestMemo.put(t.basePath, (name, expanded)) }
    expanded
  }

  /** Stored schemas drop NOT NULL markers everywhere (top level and
    * inside struct/array/map): the first commit's frame may carry
    * non-nullable nested fields (e.g. structs built from literals), but
    * merges, null-filled evolution columns and non_defaults fallbacks all
    * legitimately produce nulls — and a cast to a NOT NULL struct field
    * is not even analyzable. Parquet scans return nullable fields anyway,
    * so the markers carry no information worth failing a write over.
    */
  private[graft] def relaxNullability(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(relaxNullability(a.elementType), containsNull = true)
      case m: MapType => MapType(
        relaxNullability(m.keyType), relaxNullability(m.valueType),
        valueContainsNull = true)
      case other => other
    }
  }
  val ConfigFile = "table_config.json"

  def exists(spark: SparkSession, basePath: String): Boolean = {
    val s = new GraftStorage(new Path(basePath), spark.sessionState.newHadoopConf())
    configPresent(s)
  }

  /** A table exists when its config — or the `.new` sibling of a config
    * overwrite a crash interrupted — is present; readOverwritable heals
    * or falls back when the config is actually read.
    */
  private def configPresent(s: GraftStorage): Boolean =
    s.exists(new Path(s.metaDir, ConfigFile)) ||
      s.exists(new Path(s.metaDir, ConfigFile + ".new"))

  /** Initialize a fresh table (fails if one already exists). */
  def create(spark: SparkSession, basePath: String, config: GraftTableConfig): GraftTable = {
    // fail at create time, not as silent type/null-fidelity loss at read
    // time: only columnar formats with full Spark type support are valid
    require(Set("parquet", "orc").contains(config.baseFileFormat),
      s"base.file.format must be 'parquet' or 'orc', got '${config.baseFileFormat}'")
    val t = new GraftTable(spark, basePath)
    require(!configPresent(t.storage),
      s"Graft table already exists at $basePath")
    t.storage.fs.mkdirs(t.storage.metaDir)
    t.storage.createImmutable(new Path(t.storage.metaDir, ConfigFile), Json.write(config))
    t
  }

  def load(spark: SparkSession, basePath: String): GraftTable = {
    val t = new GraftTable(spark, basePath)
    require(configPresent(t.storage), s"Not a Graft table: $basePath")
    t
  }

  /** Create-or-load convenience used by the writer API. */
  def getOrCreate(spark: SparkSession, basePath: String, config: => GraftTableConfig): GraftTable =
    if (exists(spark, basePath)) load(spark, basePath) else create(spark, basePath, config)
}
