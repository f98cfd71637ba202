package graft.utilities

import org.apache.spark.sql.SparkSession

import graft.GraftTable
import graft.core.GraftAction
import graft.read.GraftReadClient

/** Export the latest (or as-of) snapshot of a graft table to a plain
  * columnar dataset, or re-materialize it as a fresh graft table.
  *
  * (ref: hudi-utilities/.../HoodieSnapshotExporter.java — output formats
  * `hudi|parquet|orc`, partition-preserving copy. The `hudi` output mode
  * maps to [[Bootstrap.fullRecord]]-style re-ingest; the columnar modes
  * are one distributed snapshot read + partitioned write, so export cost
  * is a single pass over live data regardless of table history.)
  */
object SnapshotExporter {

  /** Write the snapshot as plain `format` files under `outputDir`,
    * preserving the table's partition layout via `partitionBy`. Meta
    * columns are dropped — the export is a clean handoff dataset.
    */
  def exportColumnar(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      format: String = "parquet",
      asOf: Option[String] = None): Unit = {
    val table = GraftTable.load(spark, tablePath)
    val rc = new GraftReadClient(table)
    val df = rc.snapshotData(asOf)
    val parts = table.config.partitionSourceFields
    val w = df.write.mode("overwrite").format(format)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).save(outputDir)
  }

  /** Refresh an existing columnar export IN PLACE: rewrite only the
    * partitions touched by commits after `sinceTs` (the instant the
    * previous export ran at — returned by this method) and drop export
    * partitions the table no longer has. At 100 TB this is the export
    * cadence that works: cost tracks the churned partitions, never the
    * corpus. Returns (exportInstant, touchedPartitions) — feed the
    * instant back as the next call's `sinceTs`.
    *
    * Correctness shape: rows are read from the SNAPSHOT pinned at the
    * export instant (not stitched from the change feed), so the refresh
    * is idempotent and exact however many commits — including deletes,
    * partition drops, compactions — landed in the band. Dynamic
    * partition overwrite replaces exactly the rewritten partitions;
    * partitions with no surviving rows are deleted explicitly (dynamic
    * overwrite cannot drop a partition it writes zero rows to).
    */
  /** Content instants an incremental consumer must scan: data commits
    * PLUS rollbacks — a rollback/restore rewinds content (deletedFiles +
    * resurrected replacePartitions on its metadata) without leaving a
    * data commit, and after a restore the newest DATA instant can even
    * order below a previously-taken cursor.
    */
  private def contentInstants(table: GraftTable) =
    table.timeline.completed.filter(i =>
      GraftAction.DataActions.contains(i.action) ||
        i.action == GraftAction.Rollback)

  /** The export cursor: newest content instant, CAPPED below the
    * earliest still-pending data instant — a writer that began earlier
    * but completes later would otherwise land below an already-taken
    * cursor and be skipped forever (the same hollow-commit guard as
    * Timeline.safeIncrementalEnd).
    */
  def exportCursor(spark: SparkSession, tablePath: String): Option[String] = {
    val table = GraftTable.load(spark, tablePath)
    cursorOf(table)
  }

  private def cursorOf(table: GraftTable): Option[String] = {
    val pendingFloor = table.timeline.pending
      .filter(i => GraftAction.DataActions.contains(i.action))
      .map(_.ts).minOption
    val eligible = contentInstants(table).map(_.ts)
      .filter(ts => pendingFloor.forall(ts < _))
    eligible.maxOption
  }

  def exportIncrementalColumnar(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      sinceTs: String,
      format: String = "parquet"): (String, Seq[String]) = {
    import org.apache.spark.sql.functions.col
    val table = GraftTable.load(spark, tablePath)
    val parts = table.config.partitionSourceFields
    val tl = table.timeline
    // Partition-level incrementality needs the export dir layout to be
    // recoverable from the table's internal partition paths; transform
    // keygens (`field:timestamp` and the single-field
    // partitionTimestampFormat shorthand) format values so the mapping
    // breaks, and a non-partitioned table has no partitions to diff —
    // all fall back to a full (still exact) refresh.
    val identityLayout = parts.nonEmpty &&
      !table.config.partitionFields.exists(_.contains(":")) &&
      !(table.config.partitionTimestampFormat.isDefined &&
        table.config.partitionFields.size == 1)
    val now = cursorOf(table).getOrElse(sinceTs)
    if (now <= sinceTs) return (sinceTs, Seq.empty)
    if (!identityLayout) {
      exportColumnar(spark, tablePath, outputDir, format,
        asOf = tl.completedData.map(_.ts).maxOption)
      return (now, Seq(""))
    }
    val touched = contentInstants(table)
      .filter(i => i.ts > sinceTs && i.ts <= now)
      .flatMap { i =>
        val m = tl.metadataOf(i)
        m.files.map(_.partition) ++ m.replacePartitions ++
          m.replacedFileIds.keys ++
          m.deletedFiles.map(pf => pf.substring(0, math.max(pf.lastIndexOf('/'), 0)))
      }.distinct
    if (touched.isEmpty) return (now, Seq.empty)
    val touchedSet = touched.toSet
    // rows come from the CURRENT snapshot (not pinned to `now`): a
    // rollback instant at `now` has no data view of its own, and any
    // commit landing between `now` and the read only makes rows in the
    // touched partitions fresher — the next refresh re-exports its
    // partitions again (idempotent). Persisted: the partitioned write
    // AND the row-liveness pass below both consume it; without the
    // persist a MOR merge scan of every touched partition runs twice.
    val df = new GraftReadClient(table).snapshotData(None, touchedSet.contains)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      df.write.mode("overwrite").format(format)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(parts: _*).save(outputDir)
      // Stale export dirs: dynamic overwrite only replaces partition
      // dirs it writes rows to, and a touched INTERNAL partition maps
      // to up to 2^k export dirs — each `default` path component may
      // have come from NULL/empty values (exported as
      // __HIVE_DEFAULT_PARTITION__) or from the literal string
      // "default", and those are DISTINCT export dirs fed by distinct
      // row populations. Enumerate every variant dir of every touched
      // partition and delete the ones with no surviving rows: that
      // covers both the fully-dead partition (delete_partition, or
      // every row tombstoned — slices may still exist pre-compaction)
      // and the half-dead mixed case (e.g. all NULL-lang rows deleted
      // while literal-"default" rows survive, where the overwrite
      // rewrote only the surviving variant).
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
      val aliveDirs = df
        .select(parts.map(f => col(f).cast("string")): _*)
        .distinct().collect().map { r =>
          parts.indices.map { i =>
            val v = r.getString(i)
            val rendered =
              if (v == null || v.isEmpty) "__HIVE_DEFAULT_PARTITION__"
              else escapePathName(v)
            s"${parts(i)}=$rendered"
          }.mkString("/")
        }.toSet
      val fs = new org.apache.hadoop.fs.Path(outputDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.foreach { p =>
        val rels = parts.zip(p.split("/", -1))
          .foldLeft(Seq("")) { case (acc, (f, v)) =>
            val opts =
              if (v == "default")
                Seq(s"$f=default", s"$f=__HIVE_DEFAULT_PARTITION__")
              else Seq(s"$f=${escapePathName(v)}")
            for (a <- acc; o <- opts)
              yield if (a.isEmpty) o else s"$a/$o"
          }
        rels.filterNot(aliveDirs).foreach(r =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$outputDir/$r"), true))
      }
      (now, touched)
    } finally df.unpersist(false)
  }

  /** Manifest-only LIVE export of the READ-OPTIMIZED view: one text file
    * per partition listing the absolute URIs of the live BASE files —
    * the symlink-manifest pattern Trino/Presto/Athena consume through
    * `SymlinkTextInputFormat` over a parquet SerDe, and the cheap
    * equivalent of the reference's RO input-format path (ref:
    * HoodieROTablePathFilter.java:116 + HoodieParquetInputFormat — both
    * select the latest base file per group at split time; ours
    * precomputes that selection into a manifest).
    *
    * ZERO data is copied: a refresh is a driver-side metadata pass (the
    * file list comes from the commit manifest), so it can run from the
    * post-commit hook on every compaction — see [[roManifestCallback]].
    * Staleness on MOR = the delta debt accrued since the last
    * compaction; COW manifests are exact as of the last refresh.
    * Consumers see the physical base files: graft meta columns included
    * (like the reference's `_hoodie_*` columns in Hive), bootstrapped
    * external files with their original columns only. Tombstones never
    * reach base files (COW merges and compaction filter them), so a
    * plain reader of the listed files sees live rows only.
    *
    * Consistency: each partition's manifest is replaced by an atomic
    * overwrite-rename, so a reader sees the old or the new list, never
    * a torn one; manifests of vanished partitions are deleted. Keep the
    * refresh cadence inside the clean horizon (`cleanRetainCommits`) —
    * cleaning deletes base-file versions a sufficiently stale manifest
    * may still reference.
    *
    * Returns the partition manifest dirs written (relative to
    * `outputDir`; `Seq("")` for a non-partitioned table).
    *
    * @param onlyPartitions refresh ONLY these internal partition paths
    *   (the post-commit hook passes the commit's touched partitions, so
    *   per-commit cost is O(churned partitions), never O(table) — at
    *   100 TB / 100k partitions a full rewrite per commit is the driver
    *   bottleneck). A targeted partition with no live base files gets its
    *   manifest DELETED (partition dropped, or all-delta). The global
    *   stale-manifest reap runs only on a FULL refresh — run one
    *   periodically to re-sync everything (and to bound the
    *   concurrent-writer staleness window described on
    *   [[roManifestCallback]]).
    */
  def exportSymlinkManifest(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      onlyPartitions: Option[Set[String]] = None): Seq[String] = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val table = GraftTable.load(spark, tablePath)
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outputDir)
    val fs = out.getFileSystem(conf)
    fs.mkdirs(out)
    val parts = table.config.partitionSourceFields
    def dirOf(p: String): String =
      if (parts.isEmpty) ""
      else parts.zip(p.split("/", -1))
        .map { case (f, v) => s"$f=${escapePathName(v)}" }.mkString("/")
    val tableFs = table.storage.fs
    // Targeted refreshes resolve ONLY the touched partitions' slices —
    // combined with the process-wide expanded-manifest memo
    // (GraftTable.expandedManifestCached) this is what keeps the
    // post-commit hook O(churn) end-to-end: the manifest cold load is
    // paid once per archive boundary per process, and the per-firing
    // slice resolution skips the table's other ~1M entries.
    val byPart = table.view.latestSlices(None, onlyPartitions)
      .groupBy(_.partition)
    val targets: Seq[String] = onlyPartitions match {
      case Some(ps) => ps.toSeq.sorted // live or dead — dead ones reap below
      case None     => byPart.keys.toSeq.sorted
    }
    val written = targets.flatMap { p =>
      // RO view = base files only; delta-only groups (MOR inserts routed
      // to logs before their first compaction) have nothing to list yet
      val paths = byPart.getOrElse(p, Seq.empty).flatMap(s =>
        s.base.map(f => table.resolveDataPath(s.partition, f)))
      val rel = dirOf(p)
      val dir = if (rel.isEmpty) out else new Path(out, rel)
      if (paths.isEmpty) {
        // a targeted partition with nothing to serve: remove its manifest
        // so engines stop reading rows the table no longer has
        fs.delete(new Path(dir, "manifest"), false)
        None
      } else {
        // qualify against the TABLE's filesystem so the listed URIs
        // resolve from any engine (external bootstrap paths already
        // carry their own scheme)
        val uris = paths.map(pp => tableFs.makeQualified(new Path(pp)).toString)
        fs.mkdirs(dir)
        val tmp = new Path(dir, s".manifest_tmp_${java.util.UUID.randomUUID}")
        val os = fs.create(tmp, true)
        try os.write((uris.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
        finally os.close()
        FileContext.getFileContext(dir.toUri, conf)
          .rename(tmp, new Path(dir, "manifest"), Options.Rename.OVERWRITE)
        Some(rel)
      }
    }
    // manifests of partitions the table no longer has would double-serve
    // rows an engine also finds under the partition's new manifest — or
    // serve dropped partitions forever; delete them. FULL refresh only:
    // a targeted refresh already deleted its dead targets above and must
    // not pay (or race) an O(all manifests) listing per commit.
    if (onlyPartitions.isEmpty) {
      val keep = written.toSet
      // compare SCHEME-FREE paths: listFiles returns qualified (file:/…)
      // paths while `out` may be schemeless — a URI relativize across
      // that mismatch returns the full path, which would mark every
      // manifest just written as stale
      val outPath = fs.makeQualified(out).toUri.getPath.stripSuffix("/")
      val it = fs.listFiles(out, true)
      val stale = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName == "manifest") {
          val rel = st.getPath.getParent.toUri.getPath
            .stripSuffix("/").stripPrefix(outPath).stripPrefix("/")
          if (!keep.contains(rel)) stale += st.getPath
        }
      }
      stale.foreach(fs.delete(_, false))
    }
    written
  }

  /** Post-commit hook keeping a symlink-manifest export live: plug into
    * `WriteConfig.commitCallback` on writers and service runners. The
    * refresh after `compact` is the one that moves a MOR table's RO
    * view; firing on every data commit keeps COW exports current too,
    * and rollback/restore publishes fire it over the undone partitions
    * so non-Spark engines never keep serving rolled-back base files.
    * Each firing refreshes ONLY the partitions the commit touched
    * (written/replaced/dropped/undone), so per-commit cost tracks churn,
    * not table size; zero-file commits (schema evolution) skip entirely.
    * Callback failures are logged and swallowed by the callback contract
    * (the commit is already durable); the next refresh — or a periodic
    * full `exportSymlinkManifest` — self-heals.
    *
    * Concurrent writers: two commits touching one partition fire
    * concurrently, and each loads its file-system view independently —
    * a callback that loaded BEFORE the other commit can re-publish a
    * manifest one commit stale, healed by the partition's next touch.
    * Multi-writer tables should therefore also run the periodic full
    * `exportSymlinkManifest` to bound that window (single-writer +
    * async-services setups serialize publishes and never hit it).
    */
  def roManifestCallback(
      spark: SparkSession,
      outputDir: String): (String, graft.core.GraftCommitMetadata) => Unit =
    (tablePath, meta) => {
      // deletedFiles covers ROLLBACK/RESTORE firings: an undo commit
      // carries no written files, only the files it physically removed
      // (plus the replace-partitions it resurrected) — without it a
      // rolled-back compaction would keep serving the deleted base file
      // to non-Spark engines until the next commit happened to touch the
      // partition. (Clean deletions never change the LATEST slice, and
      // cleans don't fire the hook.)
      val touched: Set[String] =
        (meta.files.map(_.partition) ++ meta.replacedFileIds.keys ++
          meta.replacePartitions ++
          meta.deletedFiles.map(pf =>
            pf.substring(0, math.max(pf.lastIndexOf('/'), 0)))).toSet
      if (touched.nonEmpty)
        exportSymlinkManifest(spark, tablePath, outputDir, Some(touched))
      ()
    }

  /** Re-materialize the snapshot as a new graft table at `outputDir`
    * (the reference's `--output-format hudi`): a fresh single-commit
    * table with the same key/partition config — history, tombstones and
    * delta debt are left behind.
    */
  def exportAsGraft(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      asOf: Option[String] = None): String = {
    val table = GraftTable.load(spark, tablePath)
    val df = new GraftReadClient(table).snapshotData(asOf)
    // the snapshot carries LOGICAL column names, which become the new
    // table's physical names — copying the rename map would remap them
    // back to the source's old physical names on the next write
    val target = GraftTable.create(spark, outputDir,
      table.config.copy(columnRenames = Map.empty))
    new graft.write.GraftWriteClient(target).bulkInsert(df)
  }
}
