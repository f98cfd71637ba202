package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.GraftTable
import graft.core._

/** Read relations over a Graft table: snapshot, read-optimized,
  * incremental, time travel.
  * (ref: hudi-spark-datasource/.../DefaultSource.scala:111-137 dispatch;
  * query types snapshot | read_optimized | incremental,
  * DataSourceOptions.scala:43-45)
  *
  * All reads resolve the file list on the driver from the commit-metadata
  * manifest (no storage listing) and hand Spark a plain multi-path parquet
  * scan — predicate pushdown, column pruning and vectorized reading are
  * stock Spark from there. For MOR, only file groups that actually have
  * delta files pay the merge (window dedup); clean groups stay on the
  * pushdown-friendly base-scan path.
  */
final class GraftReadClient(val table: GraftTable) {

  private val spark = table.spark
  private def cfg = table.config

  /** ONE schema snapshot per READ PLAN: each public read entry resolves
    * the stored schema once (a `SchemaPin`) and threads it through every
    * scan of that plan, so a concurrent schema-evolution commit landing
    * between the base and delta reads of a MOR merge (or between any two
    * scans of one plan) can never produce a mixed-schema union
    * (NUM_COLUMNS_MISMATCH). The pin is PER OPERATION, never per client:
    * a long-lived client must see post-evolution schemas on its next read
    * (new files carry the widened types — a stale instance-lifetime pin
    * would fail reading them). (ref:
    * MergeOnReadSnapshotRelation.scala:94-137 — the read schema is
    * resolved once, before splits are built.)
    */
  private type SchemaPin = Option[org.apache.spark.sql.types.StructType]

  private def pinSchema(): SchemaPin = table.storedDataSchema

  private def readData(paths: Seq[String], pin: SchemaPin): DataFrame =
    table.readDataFiles(paths, pin)

  /** Latest-wins precedence for MOR log merging.
    * (ref: HoodieMergedLogRecordScanner.java:80-116 — latest by commit
    * order; "event_time" payload also honors the precombine field,
    * DefaultHoodieRecordPayload.java:55-75)
    */
  private def mergeOrder(df: DataFrame): Seq[Column] = {
    val pc = cfg.precombineField
      .filter(_ => cfg.payloadClass == "event_time")
      .filter(df.columns.contains)
    pc.map(f => col(f).desc_nulls_last).toSeq ++ Seq(
      col(MetaColumns.CommitTime).desc,
      col(MetaColumns.CommitSeqno).desc)
  }

  private def readFiles(paths: Seq[String], pin: SchemaPin): Option[DataFrame] =
    if (paths.isEmpty) None else Some(readData(paths, pin))

  private def basePath(s: FileSlice, f: WriteFileInfo): String =
    table.resolveDataPath(s.partition, f)

  /** Snapshot view (optionally as of a past instant = time travel).
    * COW: latest base files, a pure columnar scan
    * (ref: DefaultSource.scala:190-247).
    * MOR: base+delta merge per slice
    * (ref: MergeOnReadSnapshotRelation.scala:59-222).
    */
  def snapshot(asOf: Option[String] = None): DataFrame =
    snapshotFromSlices(table.view.latestSlices(asOf), asOf)

  /** All merging happens on PHYSICAL column names (what files carry);
    * the rename map is applied once, as the frame leaves the read path
    * (see GraftTableConfig.columnRenames).
    */
  /** Point-in-time reads below the archive checkpoint would silently
    * miss every group rewritten before the boundary (the manifest keeps
    * only the latest version per group) — fail loudly instead.
    */
  private def checkAsOf(asOf: Option[String]): Unit =
    for (ts <- asOf; b <- table.archiveBoundary)
      require(ts >= b,
        s"time travel to $ts predates the archive checkpoint $b: older " +
          s"file versions are not reconstructible; earliest supported instant is $b")

  private def snapshotFromSlices(
      slices: Seq[FileSlice], asOf: Option[String]): DataFrame = {
    checkAsOf(asOf)
    table.logicalize(physicalSnapshotFromSlices(slices, asOf, pinSchema()))
  }

  private def physicalSnapshotFromSlices(
      slices: Seq[FileSlice], asOf: Option[String], pin: SchemaPin): DataFrame = {
    if (!table.isMor) {
      val paths = slices.flatMap(s => s.base.map(f => basePath(s, f)))
      readFiles(paths, pin).map(dropTombstones).getOrElse(emptyFrame(pin))
    } else {
      val (withDeltas, baseOnly) = slices.partition(_.deltas.nonEmpty)
      val cleanDf = readFiles(
        baseOnly.flatMap(s => s.base.map(f => basePath(s, f))), pin)
      val mergedDf = mergeDirtyGroups(withDeltas, pin)
      (cleanDf, mergedDf) match {
        case (Some(a), Some(b)) => dropTombstones(a).unionByName(b)
        case (Some(a), None)    => dropTombstones(a)
        case (None, Some(b))    => b
        case _                  => emptyFrame(pin)
      }
    }
  }

  /** Merge the file groups that have delta files. Two plans:
    *
    * BROADCAST (delta volume under Spark's broadcast threshold — the
    * normal case, since compaction bounds delta debt): deltas reduce to
    * their latest row per key with a small window, then the base rows
    * STREAM from their scan through a broadcast-hash left join picking
    * the payload-aware winner per key; delta-only keys (inserts routed to
    * logs, keys deleted-then-reinserted) come from an anti-join against
    * the narrow base-key projection. The full base rows never shuffle —
    * at scale, MOR read amplification is bounded by delta size, not
    * group size (the reference's merged-log-scanner + base iterator has
    * the same locality, HoodieMergeOnReadRDD.scala:196-305).
    *
    * SHUFFLE fallback (delta debt above the threshold): cluster
    * base∪deltas by (partition, fileGroup) and run the latest-wins
    * window — one shuffle, reused by the window.
    */
  private def mergeDirtyGroups(
      withDeltas: Seq[FileSlice], pin: SchemaPin): Option[DataFrame] = {
    if (withDeltas.isEmpty) return None
    val basePaths = withDeltas.flatMap(s => s.base.map(f => basePath(s, f)))
    val deltaPaths = withDeltas.flatMap(s => s.deltas.map(f => basePath(s, f)))
    val deltaBytes = withDeltas.flatMap(_.deltas).map(_.bytes).sum
    // The byte gate uses COMPRESSED file sizes, which can badly
    // under-estimate the in-memory broadcast/driver footprint of highly
    // compressible deltas (RLE'd columns) — the manifest row count is the
    // second, expansion-proof valve on every delta-derived broadcast and
    // on the driver materialization below. Files from commits predating
    // record counts carry 0 and pass, same as the pre-gate behavior.
    val deltaRows = withDeltas.flatMap(_.deltas).map(_.records).sum
    val budget = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (deltaPaths.isEmpty)
      return readFiles(basePaths, pin).map(dropTombstones)
    if (basePaths.isEmpty || budget <= 0 || deltaBytes > budget ||
        deltaRows > GraftReadClient.maxBroadcastDeltaRows(spark))
      return readFiles(basePaths ++ deltaPaths, pin).map(mergeLatestPerGroup)

    val g = "_g_group"
    // both scans read under the SAME pinned schema (see SchemaPin) —
    // the union below must never see two column sets
    val base = readData(basePaths, pin)
      .withColumn(g, graft.write.GraftWriteClient.fileIdOfScan)
    val deltas = readData(deltaPaths, pin)
      .withColumn(g, graft.write.GraftWriteClient.fileIdOfScan)
    val keyCols = Seq(MetaColumns.PartitionPath, g, MetaColumns.RecordKey)

    // 1. latest delta row per key (small input: delta files only);
    // non-defaults payloads fold fields across delta versions and carry
    // the tombstone barrier for the join below.
    //
    // Materialize delta-latest ONCE, driver-side. The lazy plan fed THREE
    // downstream subplans (the broadcastWinner build, the dKeys semi
    // build, and the anti-join probe side), each re-scanning and
    // re-collapsing the delta files per execution. The gates above
    // already bound it to broadcast size — anything small enough to
    // broadcast to every executor is small enough to hold once on the
    // driver — so collect it into a LocalRelation: one delta scan total,
    // and every downstream broadcast builds without a Spark job. Lifetime
    // is the plan's own (GC'd with the returned frame) — no persist to
    // leak out of a lazy read. Collected in Catalyst's INTERNAL format:
    // the Row-based route re-converts every delta row external and back
    // on the driver before the LocalRelation can exist. For DEFAULT
    // payloads (newest row wins whole — the collapse is a pure argmax on
    // (commit, seqno)) the collapse itself folds on the driver over the
    // raw collected rows, so the delta job is a plain projected scan
    // with no exchange and no aggregate; event_time / non_defaults keep
    // the plan-side collapse (their folds combine versions field-wise).
    val driverFold = cfg.payloadClass != "overwrite_non_defaults" &&
      cfg.precombineField
        .filter(_ => cfg.payloadClass == "event_time")
        .filter(deltas.columns.contains).isEmpty
    val (dLatestRows, dAttrs) =
      if (driverFold)
        graft.write.MergeKernel.collapseLatestDriver(deltas, keyCols,
          Seq(MetaColumns.CommitTime, MetaColumns.CommitSeqno))
      else
        org.apache.spark.sql.graft.Shims.collectInternal(
          graft.write.MergeKernel.collapseVersions(
            deltas, keyCols.map(col), mergeOrder(deltas), cfg.payloadClass,
            "_g_rank", withBarrier = true, precombine = cfg.precombineField))
    val dLatest = org.apache.spark.sql.graft.Shims.localDf(
      spark, dAttrs, dLatestRows)

    // 2. base rows stream through a broadcast join; per-column winner.
    // The incoming side is pre-shaped by a ZERO-COPY attribute rename
    // (key names kept, everything else _g_in_-prefixed): a
    // select-over-LocalRelation here would be eagerly evaluated row by
    // row with interpreted expressions by ConvertToLocalRelation — once
    // per optimize, again per AQE re-optimization.
    val dataCols = base.columns.filterNot(c => keyCols.contains(c)).toSeq
    val incShaped = org.apache.spark.sql.graft.Shims.renamedLocalDf(
      spark, dAttrs, dLatestRows,
      n => if (keyCols.contains(n)) n else graft.write.MergeKernel.InPrefix + n)
    val mergedBase = graft.write.MergeKernel.broadcastWinnerShaped(
      base, incShaped, keyCols, dataCols, cfg.payloadClass, cfg.precombineField)

    // 3. delta-only keys. A direct anti-join against the base keys would
    // let the planner SHUFFLE the (huge) base-key projection once its
    // size estimate exceeds the broadcast threshold — at scale that is a
    // full exchange of every merged group's keys to find a handful of
    // delta inserts. Invert it: the base scan STREAMS through a
    // broadcast semi-join against the (small, ≤ delta debt, row-gated
    // above) delta keys, and the surviving matched keys — at most
    // |delta keys| rows — come back as the broadcast side of the
    // anti-join. Nothing base-sized ever shuffles. dKeys is projected on
    // the driver (codegen'd, once) for the same
    // no-eager-interpreted-projection reason as above.
    val dKeys = org.apache.spark.sql.graft.Shims.projectLocal(
      spark, dAttrs, dLatestRows, keyCols)
    val matchedKeys = base.select(keyCols.map(col): _*)
      .join(broadcast(dKeys), keyCols, "left_semi")
    val barrierCols = Seq(graft.write.MergeKernel.TombBarrier,
      graft.write.MergeKernel.KillFloor, graft.write.MergeKernel.KillAny)
      .filter(dLatest.columns.contains)
    val insertsSrc =
      if (barrierCols.isEmpty) dLatest else dLatest.drop(barrierCols: _*)
    val inserts = insertsSrc
      .join(broadcast(matchedKeys), keyCols, "left_anti")

    Some(dropTombstones(mergedBase.unionByName(inserts).drop(g)))
  }

  /** Read-optimized view: base files only (MOR reads skip the log merge).
    * (ref: DataSourceOptions.scala QUERY_TYPE_READ_OPTIMIZED)
    */
  def readOptimized(asOf: Option[String] = None): DataFrame = {
    checkAsOf(asOf)
    val pin = pinSchema()
    val paths = table.view.latestSlices(asOf)
      .flatMap(s => s.base.map(f => basePath(s, f)))
    table.logicalize(
      readFiles(paths, pin).map(dropTombstones).getOrElse(emptyFrame(pin)))
  }

  /** Incremental view: records written in commits with
    * begin < ts <= end, deduped to the latest version per key.
    * (ref: IncrementalRelation.scala:60-181 — file list from commit
    * metadata, then a `_hoodie_commit_time` band filter)
    */
  /** Glob → full-match predicate over partition paths (Hadoop glob
    * syntax: `*`, `?`, `[...]`, `{a,b}`), for partition-scoped
    * incremental pulls (ref: hoodie.datasource.read.incr.path.glob,
    * IncrementalRelation.scala:136-147). Pruning happens at the FILE
    * GROUP level — non-matching partitions are never scanned.
    */
  private def partitionMatcher(glob: Option[String]): String => Boolean =
    glob match {
      case None => _ => true
      case Some(g) =>
        val p = new org.apache.hadoop.fs.GlobPattern(g)
        s => p.matches(s)
    }

  def incremental(
      beginTs: String,
      endTs: Option[String] = None,
      partitionGlob: Option[String] = None): DataFrame = {
    val end = endTs.getOrElse(
      table.timeline.lastCompletedData.map(_.ts).getOrElse(beginTs))
    val inGlob = partitionMatcher(partitionGlob)
    // Commits archived out of the active timeline would be silently
    // missing from the per-commit file-list path (their metadata is gone
    // from `.graft/`). Rows keep their ORIGINAL _graft_commit_time
    // through compaction and clustering rewrites, so the latest-version
    // band over the snapshot is a correct fallback — same result set,
    // one full-snapshot scan instead of a touched-files scan (the
    // full-table-scan fallback the reference exposes for incremental
    // reads that outrun the active timeline). An `end` below the archive
    // checkpoint itself is rejected by the snapshot's asOf guard — that
    // state is not reconstructible.
    val archivedInRange = table.timeline.archivedInstants.exists(i =>
      GraftAction.DataActions.contains(i.action) && i.ts > beginTs && i.ts <= end)
    if (archivedInRange) {
      val band = snapshot(Some(end)).filter(
        col(MetaColumns.CommitTime) > beginTs && col(MetaColumns.CommitTime) <= end)
      // the full-snapshot fallback has no file-group list to prune, so
      // the glob applies as a row filter on the partition-path meta
      // column (GlobPattern compiles to a java regex; anchor for the
      // full match its matches() performs)
      return partitionGlob.fold(band) { g =>
        val regex = new org.apache.hadoop.fs.GlobPattern(g).compiled.pattern
        band.filter(col(MetaColumns.PartitionPath).rlike(s"^(?:$regex)$$"))
      }
    }
    val instants = table.timeline.dataInstantsBetween(beginTs, end)
    // The pull is the SNAPSHOT state of the groups the band touched,
    // band-filtered on the rows' original commit times — i.e. a merge
    // scan of each touched group's latest slice as of `end`, exactly the
    // reference's MOR incremental shape (MergeOnReadIncrementalRelation:
    // merge scan + commit-time band filters). Reading band FILES instead
    // would resurrect states later band commits overrode: rows of
    // groups a later commit replaced (insert_overwrite, delete_partition,
    // clustering), rows a later COW rewrite physically dropped (a partial
    // delete leaves no tombstone), and — under event_time — stale MOR
    // delta rows whose ordering lost to a pre-band winner the delta files
    // alone cannot see. The as-of-end view handles every one of those:
    // replaced groups are gone, only latest versions are read, and the
    // full-slice merge folds band rows against the pre-band state. Band
    // files cleaning already deleted are irrelevant here for the same
    // reason — only latest slices are read.
    val pin = pinSchema()
    val touched: Set[(String, String)] = instants.flatMap { i =>
      table.timeline.metadataOf(i).files.map(f => (f.partition, f.fileId))
    }.filter(g => inGlob(g._1)).toSet
    if (touched.isEmpty) // metadata-only band (e.g. delete_partition)
      return table.logicalize(emptyFrame(pin).filter(lit(false)))
    val slices = table.view.latestSlices(Some(end))
      .filter(s => touched((s.partition, s.fileId)))
    table.logicalize(
      physicalSnapshotFromSlices(slices, Some(end), pin).filter(
        col(MetaColumns.CommitTime) > beginTs && col(MetaColumns.CommitTime) <= end))
  }

  /** Change-data-capture view: one row PER CHANGE for every data commit
    * with begin < ts <= end, Delta-CDF-shaped — `_change_ordinal` (1-based
    * position of the commit in the band), `_change_type` (`insert` |
    * `update_preimage` | `update_postimage` | `delete`) and the full data
    * columns of the image. (ref: the reference's CDC incremental format,
    * hudi-spark-datasource/.../cdc/CDCRelation.scala +
    * HoodieCDCExtractor.java — ours infers changes from adjacent file-slice
    * versions, its "as-of inference" path, instead of writing CDC logs.)
    *
    * Per commit, only the file groups that commit touched are read: the
    * slice as of the previous commit (before image) full-outer-joined to
    * the slice as of the commit (after image) on (partition, key). Rows
    * whose stored commit time equals the commit are changes — merged-in
    * old rows keep their original commit time, so clustering and
    * compaction rewrites emit zero changes, as they should. The join
    * shuffles only the touched groups' rows; plan size grows linearly with
    * the band length (use `incremental` for wide bands where per-commit
    * granularity isn't needed).
    *
    * Needs the PREVIOUS file-slice versions: fails loudly when cleaning
    * already deleted a needed version or the band outruns the active
    * timeline. A record whose partition value changed under the global
    * index appears as delete + insert, not update.
    */
  def changes(
      beginTs: String,
      endTs: Option[String] = None,
      reliableCheckpoint: Boolean = false,
      partitionGlob: Option[String] = None): DataFrame = {
    val inGlob = partitionMatcher(partitionGlob)
    val tl = table.timeline
    val pin = pinSchema() // ONE schema for every per-commit image in the band
    if (pin.isEmpty) { // empty table: no changes, bare schema
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("_change_ordinal", IntegerType),
          StructField("_change_type", StringType))))
    }
    val end = endTs.getOrElse(tl.lastCompletedData.map(_.ts).getOrElse(beginTs))
    require(!tl.archivedInstants.exists(i =>
      GraftAction.DataActions.contains(i.action) && i.ts > beginTs && i.ts <= end),
      s"change feed ($beginTs, $end] spans archived commits: per-commit " +
        "file versions are gone; use incremental() for the collapsed band")
    val commits = tl.dataInstantsBetween(beginTs, end)
    val allData = tl.completedData.map(_.ts)
    // CLEAN-deleted files per group, for the needed-version guard.
    // Rollback/restore deletions don't count: they erase undone history,
    // and a rolled-back commit's files are never a before-image any
    // surviving commit needs.
    val deletedByGroup: Map[(String, String), Seq[String]] =
      table.cleanDeletedFiles.toSeq
      .map { pf =>
        val slash = pf.lastIndexOf('/')
        val name = pf.substring(slash + 1)
        ((pf.substring(0, math.max(slash, 0)), name.takeWhile(_ != '_')),
          FileSystemView.instantOfFileName(name))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    // one view (one timeline-metadata pass) serves every per-commit as-of
    // resolution in the band
    val view = table.view
    val perCommit = commits.zipWithIndex.flatMap { case (c, i) =>
      val meta = tl.metadataOf(c)
      val touched: Set[(String, String)] =
        (meta.files.map(f => (f.partition, f.fileId)).toSet ++
          meta.replacedFileIds.toSeq.flatMap { case (p, ids) => ids.map((p, _)) })
          .filter(g => inGlob(g._1))
      if (touched.isEmpty) None
      else {
        // Before-image instant: the last ACTIVE data commit below c, or —
        // when archiving consumed everything below the band — the archive
        // checkpoint boundary, whose manifest IS the table state at that
        // instant. Falling through to "0" on an archived table would
        // as-of-filter the manifest entries away: empty before-images,
        // every pre-existing row re-emitted as an insert, deletes lost.
        val prev = allData.filter(_ < c.ts).lastOption
          .orElse(table.archiveBoundary.filter(_ < c.ts))
          .getOrElse("0")
        val beforeSlices = view.latestSlices(Some(prev))
          .filter(s => touched((s.partition, s.fileId)))
        touched.foreach { g =>
          val liveBase = beforeSlices.find(s => (s.partition, s.fileId) == g)
            .flatMap(_.baseInstant).getOrElse("")
          require(!deletedByGroup.getOrElse(g, Nil)
            .exists(ts => ts <= prev && ts > liveBase),
            s"change feed for commit ${c.ts} needs a cleaned file version " +
              s"of group ${g._1}/${g._2}; lower the band or clean less aggressively")
        }
        val afterSlices = view.latestSlices(Some(c.ts))
          .filter(s => touched((s.partition, s.fileId)))
        Some(changeSet(
          physicalSnapshotFromSlices(beforeSlices, None, pin),
          physicalSnapshotFromSlices(afterSlices, None, pin), c.ts, i + 1))
      }
    }
    // A wide band would otherwise union one full-outer-join branch per
    // commit into a single plan — O(commits) analysis/optimization cost
    // on the driver and a plan tree Catalyst re-walks on every rule. Past
    // a chunk of commits, truncate the lineage with localCheckpoint so
    // the final union is O(commits/chunk) flat scans. The checkpoint is
    // eager (the chunk computes at call time) and holds executor-local
    // storage for the band's change rows — the band itself is what bounds
    // that, and per-commit change sets are deltas, not snapshots.
    //
    // localCheckpoint blocks die with their executor: on a cluster with
    // churn (spot nodes, dynamic allocation), a wide-band read can lose a
    // chunk mid-query and fail. `reliableCheckpoint` materializes each
    // chunk as parquet under the table's own temp dir instead — survives
    // any executor loss, read back as plain columnar scans. Dirs are
    // tagged cdc_ckpt_ and reaped once older than CdcCheckpointTtlMillis
    // by the next reliable read or table clean; the returned frame must
    // be drained within that TTL (see GraftReadClient.CdcCheckpointTtl).
    val chunk = 16
    def reliably(df: DataFrame): DataFrame = {
      val dir = new org.apache.hadoop.fs.Path(table.storage.tempDir,
        s"cdc_ckpt_${java.util.UUID.randomUUID}")
      df.write.parquet(dir.toString)
      spark.read.parquet(dir.toString)
    }
    if (reliableCheckpoint && perCommit.size > chunk) reapStaleCdcCheckpoints()
    val unioned =
      if (perCommit.isEmpty) changeSet(emptyFrame(pin), emptyFrame(pin), end, 0)
      else if (perCommit.size <= chunk) perCommit.reduce(_ unionByName _)
      else perCommit.grouped(chunk)
        .map(g => if (reliableCheckpoint) reliably(g.reduce(_ unionByName _))
                  else g.reduce(_ unionByName _).localCheckpoint())
        .reduce(_ unionByName _)
    table.logicalize(unioned)
  }

  private def reapStaleCdcCheckpoints(): Unit =
    GraftReadClient.reapStaleCdcCheckpoints(table)

  /** One commit's change rows from its before/after images (physical
    * names, tombstones already dropped, full stored schema on both sides —
    * old files surface newer columns as nulls, so the sides always align).
    */
  private def changeSet(
      before: DataFrame, after: DataFrame, commitTs: String, ord: Int): DataFrame = {
    val key = Seq(MetaColumns.PartitionPath, MetaColumns.RecordKey)
    val dataCols = before.columns.toSeq
      .filterNot(MetaColumns.AllWithDeleted.contains)
    val ct = MetaColumns.CommitTime
    val b = before.select((key.map(col) :+ col(ct).as("_b_ct")) ++
      dataCols.map(c => col(c).as(s"_b_$c")): _*)
    val a = after.select((key.map(col) :+ col(ct).as("_a_ct")) ++
      dataCols.map(c => col(c).as(s"_a_$c")): _*)
    def rowOf(tpe: String, prefix: String) = struct(
      (lit(tpe).as("_change_type") +:
        dataCols.map(c => col(s"$prefix$c").as(c))): _*)
    b.join(a, key, "full_outer")
      // keys absent on one side or (re)written by THIS commit are changes;
      // rows merged through unchanged keep their old commit time and drop
      .filter(col("_b_ct").isNull || col("_a_ct").isNull || col("_a_ct") === commitTs)
      .select(explode(
        when(col("_b_ct").isNull, array(rowOf("insert", "_a_")))
          .when(col("_a_ct").isNull, array(rowOf("delete", "_b_")))
          .otherwise(array(
            rowOf("update_preimage", "_b_"),
            rowOf("update_postimage", "_a_")))).as("_c"))
      .select(lit(ord).as("_change_ordinal"), col("_c.*"))
  }

  /** MOR snapshot merge: cluster dirty rows by their FILE GROUP first
    * (base and its deltas share the fileId filename prefix), then run the
    * latest-wins window within (fileId, key). The shuffle is keyed on
    * (partition, fileId) — each file group merges independently, exactly
    * the reference's per-slice merge
    * (ref: HoodieMergeOnReadRDD.scala:196-305) — and HashPartitioning
    * (part, fileId) satisfies the window's clustering requirement, so no
    * second shuffle follows.
    */
  private def mergeLatestPerGroup(df: DataFrame): DataFrame = {
    val g = "_g_group"
    val withG = df.withColumn(g, graft.write.GraftWriteClient.fileIdOfScan)
    dropTombstones(
      graft.write.MergeKernel.collapseVersions(
        withG.repartition(col(MetaColumns.PartitionPath), col(g)),
        Seq(col(MetaColumns.PartitionPath), col(g), col(MetaColumns.RecordKey)),
        mergeOrder(df), cfg.payloadClass, "_g_rank",
        precombine = cfg.precombineField)
        .drop(g))
  }

  /** Dedup to latest row per (partition, key) and drop tombstones. */
  private def mergeLatestPerKey(df: DataFrame): DataFrame =
    dropTombstones(
      graft.write.MergeKernel.collapseVersions(df,
        Seq(col(MetaColumns.PartitionPath), col(MetaColumns.RecordKey)),
        mergeOrder(df), cfg.payloadClass, "_g_rank",
        precombine = cfg.precombineField))

  private def dropTombstones(df: DataFrame): DataFrame =
    if (df.columns.contains(MetaColumns.IsDeleted))
      df.filter(!col(MetaColumns.IsDeleted)).drop(MetaColumns.IsDeleted)
    else df

  /** User-visible projection: data columns only. */
  def dataOnly(df: DataFrame): DataFrame =
    df.drop(MetaColumns.AllWithDeleted: _*)

  def snapshotData(asOf: Option[String] = None): DataFrame = dataOnly(snapshot(asOf))

  /** Snapshot restricted to the partitions `keep` accepts — pruning at
    * the manifest/file-list level, so excluded partitions cost nothing:
    * no paths listed, no footers read, no tasks scheduled. This is the
    * scale path for any query carrying a partition-key predicate (e.g.
    * multi-probe LSH ANN over a bucket-partitioned corpus); a filter on
    * the returned frame only gets footer-stats skipping AFTER every
    * latest file is already in the scan.
    */
  def snapshotData(asOf: Option[String], keep: String => Boolean): DataFrame =
    dataOnly(snapshot(asOf, keep))

  /** Snapshot (meta columns included) restricted to partitions `keep`
    * accepts — the manifest-level pruning entry used by the SQL relation
    * when a query constrains every partition field.
    */
  def snapshot(asOf: Option[String], keep: String => Boolean): DataFrame =
    snapshot(asOf, keep, _ => true)

  /** Snapshot additionally restricted to file slices `keepSlice` accepts —
    * the column-stats data-skipping entry (see graft.core.ColumnStats):
    * slices whose per-file min/max ranges cannot satisfy the query's
    * pushed filters never enter the scan. Both prunes run on the driver
    * against the manifest, before any path is listed or footer read.
    */
  def snapshot(
      asOf: Option[String],
      keep: String => Boolean,
      keepSlice: FileSlice => Boolean): DataFrame =
    snapshotFromSlices(
      table.view.latestSlices(asOf)
        .filter(s => keep(s.partition) && keepSlice(s)), asOf)

  /** Read-optimized view restricted to partitions `keep` accepts. */
  def readOptimized(asOf: Option[String], keep: String => Boolean): DataFrame =
    readOptimized(asOf, keep, _ => true)

  /** Read-optimized view with partition + column-stats slice pruning. */
  def readOptimized(
      asOf: Option[String],
      keep: String => Boolean,
      keepSlice: FileSlice => Boolean): DataFrame = {
    checkAsOf(asOf)
    val pin = pinSchema()
    val paths = table.view.latestSlices(asOf)
      .filter(s => keep(s.partition) && keepSlice(s))
      .flatMap(s => s.base.map(f => basePath(s, f)))
    table.logicalize(
      readFiles(paths, pin).map(dropTombstones).getOrElse(emptyFrame(pin)))
  }

  /** Zero-row frame carrying the stored schema MINUS the tombstone
    * column, so downstream column references resolve on an empty table
    * with the SAME schema every non-empty read path produces (those all
    * drop the column via dropTombstones) — an empty streaming
    * micro-batch with one extra attribute would fail Spark's
    * output-schema check, and an empty snapshot would change schema the
    * moment data arrived.
    */
  private def emptyFrame(pin: SchemaPin): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val schema = StructType(
      pin.map(graft.GraftTable.fileSchemaOf).getOrElse(new StructType())
        .filterNot(_.name == MetaColumns.IsDeleted))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Point lookup: rows whose key is in `keys` — a broadcast semi-join
    * against the snapshot, restricted up front to the file GROUPS whose
    * manifest key ranges / sidecar blooms can contain any requested key.
    * Both prunes run on the driver (the keys are already here), so a
    * point read on a million-group table plans in O(groups) and scans
    * O(matching groups). Pruning is group-granular: a kept MOR group
    * still reads its full slice, so the latest-wins merge stays correct.
    * (ref: HoodieReadClient.java:138-196)
    */
  def readByKeys(keys: Seq[String]): DataFrame = {
    import spark.implicits._
    import graft.write.GraftWriteClient.utf8Lte
    val k = keys.toDF(MetaColumns.RecordKey)
    val slices = table.view.latestSlices(None)
    val kMin = keys.reduceOption((a, b) => if (utf8Lte(a, b)) a else b)
    val kMax = keys.reduceOption((a, b) => if (utf8Lte(a, b)) b else a)
    val ranged = (kMin, kMax) match {
      case (Some(lo), Some(hi)) =>
        slices.filter(s => (s.base.toSeq ++ s.deltas).exists(f =>
          f.minKey.isEmpty || f.maxKey.isEmpty ||
            (utf8Lte(f.minKey, hi) && utf8Lte(lo, f.maxKey))))
      case _ => slices
    }
    val blooms = graft.write.GraftWriteClient.loadBlooms(
      spark, table.storage,
      ranged.flatMap(s => (s.base.toSeq ++ s.deltas).map(_.fileName)))
    val pruned =
      if (blooms.isEmpty) ranged
      else {
        // each file is probed at most once (one slice per file, exists
        // short-circuits), so deserialize inline — no cache needed
        def hit(fileName: String): Boolean = blooms.get(fileName) match {
          case None => true // no sidecar for this file: must scan
          case Some(bytes) =>
            val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(bytes))
            keys.exists(bf.mightContainString)
        }
        ranged.filter(s => (s.base.toSeq ++ s.deltas).exists(f => hit(f.fileName)))
      }
    snapshotFromSlices(pruned, None)
      .join(broadcast(k), Seq(MetaColumns.RecordKey), "left_semi")
  }
}

object GraftReadClient {
  /** Row-count valve on the MOR broadcast-merge plan (and compaction's
    * mirror of it): the byte gate reads compressed delta file sizes, so a
    * highly compressible delta could pass it while its decoded rows blow
    * the driver/executor broadcast budget — the old plan degraded to a
    * shuffle there; a forced broadcast would OOM. 4M rows bounds the
    * decoded footprint at a few hundred MB for ordinary row widths while
    * leaving every sanely-compacted table on the broadcast path.
    * Override per session with `spark.graft.read.maxBroadcastDeltaRows`.
    */
  val MaxBroadcastDeltaRowsDefault: Long = 4L * 1024 * 1024

  private[graft] def maxBroadcastDeltaRows(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.read.maxBroadcastDeltaRows")
      .map(_.toLong).getOrElse(MaxBroadcastDeltaRowsDefault)

  /** Lifetime contract of a reliable-checkpoint CDC frame: the returned
    * DataFrame lazily re-reads its cdc_ckpt_ chunk dirs, and any later
    * reliable read OR table clean reaps dirs older than this TTL.
    * Consumers must fully drain (or persist elsewhere) a reliable
    * changes() result within the TTL.
    */
  val CdcCheckpointTtlMillis: Long = 24L * 3600 * 1000

  /** Delete cdc_ckpt_ temp dirs older than the TTL — finished reads never
    * clean up inline (the returned frame lazily re-reads its chunks), so
    * age is the only safe reclamation signal. Called by later reliable
    * reads and by TableServices.clean, so orphaned chunks die with
    * routine maintenance even if no further wide-band read ever runs.
    */
  def reapStaleCdcCheckpoints(table: GraftTable): Unit = {
    val fs = table.storage.fs
    val cutoff = System.currentTimeMillis() - CdcCheckpointTtlMillis
    if (fs.exists(table.storage.tempDir))
      fs.listStatus(table.storage.tempDir)
        .filter(s => s.getPath.getName.startsWith("cdc_ckpt_") &&
          s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
  }
}
