package graft.services

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.GraftTable
import graft.core._
import graft.write.{GraftWriteClient, WriteConfig}

/** Pluggable compaction candidate selection — which dirty file slices a
  * scheduled run takes, and in what order
  * (ref: hudi-client/hudi-client-common/.../compact/strategy/
  * CompactionStrategy.java and its five shipped orderings).
  */
trait CompactionStrategy {
  /** Order + filter the dirty slices for one run; `targetIOBytes` bounds
    * total (read base + deltas + write base) volume where the strategy
    * honors it.
    */
  def orderAndFilter(slices: Seq[FileSlice], targetIOBytes: Long): Seq[FileSlice]
}

object CompactionStrategy {

  private def ioOf(s: FileSlice): Long =
    s.base.map(_.bytes).getOrElse(0L) * 2 + s.deltas.map(_.bytes).sum

  private def boundByIO(ss: Seq[FileSlice], target: Long): Seq[FileSlice] = {
    var budget = target
    ss.takeWhile { s => val ok = budget > 0; budget -= ioOf(s); ok }
  }

  /** Default: largest delta debt first, IO-bounded — pays down the most
    * read amplification per IO spent
    * (ref: LogFileSizeBasedCompactionStrategy.java).
    */
  object LogFileSizeBased extends CompactionStrategy {
    override def orderAndFilter(ss: Seq[FileSlice], target: Long): Seq[FileSlice] =
      boundByIO(ss.sortBy(s => -s.deltas.map(_.bytes).sum), target)
  }

  /** Keep discovery order, stop at the IO bound
    * (ref: BoundedIOCompactionStrategy.java).
    */
  object BoundedIO extends CompactionStrategy {
    override def orderAndFilter(ss: Seq[FileSlice], target: Long): Seq[FileSlice] =
      boundByIO(ss, target)
  }

  /** Everything, no bound (ref: UnBoundedCompactionStrategy.java). */
  object Unbounded extends CompactionStrategy {
    override def orderAndFilter(ss: Seq[FileSlice], target: Long): Seq[FileSlice] = ss
  }

  /** Latest partitions first (lexicographic partition-path order — date
    * partitions sort correctly), capped at `targetPartitions` per run,
    * no IO bound within them
    * (ref: DayBasedCompactionStrategy.java — last-in-first-compacted).
    */
  final case class DayBased(targetPartitions: Int = 10) extends CompactionStrategy {
    override def orderAndFilter(ss: Seq[FileSlice], target: Long): Seq[FileSlice] = {
      val keep = ss.map(_.partition).distinct
        .sorted(Ordering[String].reverse).take(targetPartitions).toSet
      ss.filter(s => keep(s.partition))
        .sortBy(s => (s.partition, -s.deltas.map(_.bytes).sum))(
          Ordering.Tuple2(Ordering[String].reverse, Ordering[Long]))
    }
  }

  /** Latest partitions first AND IO-bounded
    * (ref: BoundedPartitionAwareCompactionStrategy.java).
    */
  final case class BoundedPartitionAware(targetPartitions: Int = 10)
    extends CompactionStrategy {
    override def orderAndFilter(ss: Seq[FileSlice], target: Long): Seq[FileSlice] =
      boundByIO(DayBased(targetPartitions).orderAndFilter(ss, target), target)
  }
}

/** Maintenance operators: compaction, clustering, cleaning, archiving,
  * rollback, savepoint, restore.
  * (ref: hudi-client/hudi-client-common/.../table/action/{compact,cluster,
  * clean,rollback,savepoint,restore} and AbstractHoodieWriteClient.java:504-659)
  */
final class TableServices(val table: GraftTable, val wc: WriteConfig = WriteConfig()) {

  private val spark = table.spark

  /** Label the Spark jobs of a service phase (UI/event-log attribution,
    * mirroring GraftWriteClient.phase — restores the caller's label).
    */
  private def phase[T](name: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("graft: " + name)
    try body finally sc.setJobDescription(prev)
  }

  // fail a typo'd reporter at construction, not at first service run
  if (wc.metricsOn)
    graft.metrics.GraftMetrics.ensureReporter(
      wc.metricsReporter, wc.metricsReportPeriodSec)

  private def metricsOn: Boolean = wc.metricsOn
  private def tableName: String = table.config.tableName

  /** Compaction-debt gauges (pending plans + outstanding delta files)
    * from the current view — the "how far behind is this MOR table"
    * number an operator alarms on. Service cadence only (schedule /
    * execute passes, which already paid for a view), never per commit.
    */
  private def emitCompactionDebt(): Unit = if (metricsOn) {
    val outstanding = table.view.latestSlices(None).map(_.deltas.size.toLong).sum
    graft.metrics.GraftMetrics.compactionDebt(
      tableName, pendingCompactionPlans.size.toLong, outstanding)
  }

  // =====================================================================
  // Compaction (MOR): merge delta files into new base files.
  // (ref: HoodieSparkMergeOnReadTableCompactor.java:90-189; strategy
  // LogFileSizeBased per HoodieCompactionConfig.java:162-164, IO-bounded
  // by hoodie.compaction.target.io = 500GB :156-158)
  // =====================================================================

  /** Compact file slices with delta files, largest delta volume first,
    * bounded by `targetIOBytes`. Returns the compaction instant, or None
    * if nothing to compact.
    */
  /** Service-side OCC, the same file-group conflict rule as the write
    * path (ref: SimpleConcurrentFileWritesConflictResolutionStrategy
    * .java:44-115): a data commit that completed AFTER this service built
    * its view and touches a chosen group conflicts. For compaction only
    * racers whose instant orders BELOW the compaction instant are fatal —
    * they would be shadowed by the new base, whereas a delta with a newer
    * instant simply layers on top of it. A replace-style service
    * (clustering) kills the whole group, so ANY racer is fatal there.
    */
  private[graft] def serviceConflict(
      baseSeen: Set[String],
      myTs: String,
      touched: Set[(String, String)],
      olderOnly: Boolean): Option[String] =
    table.timeline.completedData
      .filter(i => !baseSeen.contains(i.ts) && i.ts != myTs && (!olderOnly || i.ts < myTs))
      .find { i =>
        val meta = table.timeline.metadataOf(i)
        // .toSeq first — a Map-to-tuples flatMap would collapse to one id
        // per partition (see GraftWriteClient.conflictingInstant)
        val theirs = meta.files.map(f => (f.partition, f.fileId)).toSet ++
          meta.replacedFileIds.toSeq.flatMap { case (p, ids) => ids.map((p, _)) }.toSet
        // partition-replacing racers (delete_partition / insert_overwrite
        // [_table]) also kill every group in their declared partitions;
        // a service's input groups pre-exist so they are normally in the
        // racer's replaced set too, but the declared-partition check keeps
        // this safe even when the racer's begin snapshot missed a group
        (theirs & touched).nonEmpty ||
          meta.replacePartitions.exists(p => touched.exists(_._1 == p)) ||
          (meta.operation == "insert_overwrite_table" && touched.nonEmpty)
      }
      .map(_.ts)

  /** A won plan claim: the inflight marker plus the daemon heartbeat
    * that keeps it visibly alive (mtime refresh) for as long as the
    * execution runs. `close()` stops the heartbeat; it never deletes
    * the marker — completion and failure cleanup own that.
    */
  private final class ServiceClaim(
      val instant: GraftInstant, p: Path, intervalMs: Long, token: String) {
    // mtime refresh is the cheap heartbeat, but several object-store
    // connectors do not support setTimes — a silently dead heartbeat
    // would get any execution longer than serviceClaimTtlMs judged
    // crashed and double-executed. Probe once at claim time; when
    // unsupported, refreshMarker falls back to rewriting the marker with
    // its own token. Every beat also re-reads the token, so a zombie
    // owner (paused past the TTL, marker broken and re-claimed) detects
    // the loss instead of silently refreshing the new owner's claim.
    private val canSetTimes = table.storage.probeSetTimes(p)
    /** True once the claim is lost — the marker carries a foreign token,
      * or it persists but cannot be refreshed (it WILL be crash-judged
      * after the TTL): a second runner may legitimately own the plan now,
      * so this owner must stop before publishing instead of racing it.
      */
    @volatile var refreshFailed: Boolean = false
    private def refresh(): Unit =
      if (!table.storage.refreshMarker(p, token, canSetTimes)) refreshFailed = true
    private val exec =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, s"graft-claim-heartbeat-${instant.ts}")
        t.setDaemon(true); t
      }
    exec.scheduleAtFixedRate(() => refresh(), intervalMs, intervalMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    /** Throw if the heartbeat lost the marker — called at the last point
      * before a publish/cleanup decision that assumes exclusive ownership.
      */
    def ensureLive(): Unit =
      if (refreshFailed) throw new IllegalStateException(
        s"service claim heartbeat lost for ${instant.ts}: the inflight " +
          "marker could not be refreshed and may have been re-claimed")
    def close(): Unit = exec.shutdownNow()
  }

  /** Claim a scheduled plan for execution. The ATOMIC CREATE of the
    * plan's inflight marker is the mutex between concurrent runners of
    * the same plan — two service threads draining pending plans, or a
    * second process via the schedule/execute split (a blind
    * delete-marker-then-execute let both race the same staging dir and
    * die on the completed-instant create). A live marker yields; one
    * older than `serviceClaimTtlMs` belongs to a crashed attempt —
    * break it and re-race the create. Three guards make "live" reliable
    * for executions of ANY length (a legitimate compaction easily
    * outruns the commit-lock TTL, so that TTL must not apply here):
    *  - the winner HEARTBEATS the marker (ref: the reference's
    *    heartbeat-expired instant cleanup, HoodieHeartbeatClient.java),
    *    so staleness means crashed, not slow;
    *  - markers carry a unique claim token, and a breaker re-reads
    *    status+token before deleting so it only ever breaks the EXACT
    *    marker it judged stale, never a fresh claim that replaced it;
    *  - a creator CONFIRMS its token after the create (a breaker's
    *    delete racing the create is decided by whose content survives —
    *    same protocol as FileLockProvider).
    */
  private def claimInflight(requested: GraftInstant): Option[ServiceClaim] = {
    val inflight = requested.copy(state = GraftState.Inflight)
    val p = new Path(table.storage.metaDir, inflight.fileName)
    val token = s"""{"claim":"${java.util.UUID.randomUUID}"}"""
    def tryWin(): Boolean = {
      val created =
        try { table.storage.createImmutable(p, token); true }
        catch { case _: java.io.IOException => false }
      created && (try table.storage.readString(p) == token
        catch { case _: java.io.IOException => false })
    }
    def won(): Option[ServiceClaim] = Some(
      new ServiceClaim(inflight, p, math.max(1000L, wc.serviceClaimTtlMs / 5), token))
    if (tryWin()) return won()
    try {
      val st1 = table.storage.fs.getFileStatus(p)
      if (System.currentTimeMillis() - st1.getModificationTime <= wc.serviceClaimTtlMs)
        return None
      val t1 = table.storage.readString(p)
      val st2 = table.storage.fs.getFileStatus(p)
      if (st2.getModificationTime == st1.getModificationTime &&
        table.storage.readString(p) == t1)
        table.storage.delete(p)
    } catch { case _: java.io.IOException => () /* owner just finished */ }
    if (tryWin()) won() else None
  }

  /** The OCC snapshot a persisted plan carries. Legacy plans (written
    * before `baseSeen` existed) fall back to deriving it from the ts
    * watermark — the old, weaker semantics, only for plans already on
    * disk when the engine upgraded.
    */
  private def planBaseSeen(baseSeen: Seq[String], baseTs: String): Set[String] =
    if (baseSeen.nonEmpty) baseSeen.toSet
    else table.timeline.completedData.map(_.ts).filter(_ <= baseTs).toSet

  /** Abort a service whose publish raced a conflicting commit: the files
    * it already moved into the table were never referenced by any commit,
    * so deleting them is invisible to readers.
    */
  private def abortConflicted(
      op: String, ts: String, written: Seq[WriteFileInfo], other: String): Nothing = {
    written.foreach(f =>
      table.storage.delete(table.storage.dataFilePath(f.partition, f.fileName)))
    throw new graft.write.ConcurrentWriteConflictException(
      s"$op $ts conflicts with concurrently committed $other " +
        "on overlapping file groups; retry")
  }

  /** Service publishes run their [conflict check + completed-instant
    * transition] under the same configured lock provider as writer
    * commits (graft.write.LockProvider; ref: TransactionManager.java —
    * the reference wraps table-service commits in the same transaction
    * seam). Metadata-only: data staging happened before this section.
    */
  /** Fire the configured post-commit hook after a SERVICE publish — the
    * same fire-after-durable, swallow-failures contract as the write
    * client's (GraftWriteClient.commit): compaction/clustering move the
    * base-file set, which is exactly what hooks like the read-optimized
    * symlink-manifest refresh (SnapshotExporter.roManifestCallback) need
    * to observe.
    */
  private def fireCommitCallback(meta: GraftCommitMetadata): Unit =
    wc.commitCallback.foreach { cb =>
      try cb(table.basePath, meta)
      catch { case e: Exception =>
        System.err.println(s"[graft] commit callback failed for ${meta.instant}: $e")
      }
    }

  private def withCommitLock[T](f: => T): T = {
    val lock = graft.write.LockProvider.forTable(
      wc.lockProvider, table.storage, wc.lockTtlMs, wc.lockJdbcUrl)
    if (!lock.tryLock(wc.lockTimeoutMs))
      throw new graft.write.LockAcquireException(
        s"table service could not acquire the '${wc.lockProvider}' commit " +
          s"lock within ${wc.lockTimeoutMs} ms; nothing was published — retry")
    try f finally lock.unlock()
  }

  def compact(
      targetIOBytes: Long = 500L * 1024 * 1024 * 1024,
      strategy: CompactionStrategy = CompactionStrategy.LogFileSizeBased): Option[String] = {
    // Drain plans left by a crashed or lock-blocked prior attempt FIRST:
    // their groups are claimed (scheduleCompaction skips them), so
    // without this a dead plan would exempt its groups from compaction
    // forever; stale plans self-discard inside executeCompaction.
    val retried = pendingCompactionPlans.flatMap(p => executeCompaction(p.instant))
    scheduleCompaction(targetIOBytes, strategy).flatMap(executeCompaction)
      .orElse(retried.lastOption)
  }

  /** Plan a compaction and persist it as a `<ts>.compaction.requested`
    * instant WITHOUT executing it — the chosen slices and the OCC floor
    * are frozen in the plan so any TableServices instance (a separate
    * runner, a later session) can execute it. Returns the plan instant,
    * or None when nothing needs compacting.
    * (ref: ScheduleCompactionActionExecutor + HoodieCompactionPlan.avsc)
    */
  def scheduleCompaction(
      targetIOBytes: Long = 500L * 1024 * 1024 * 1024,
      strategy: CompactionStrategy = CompactionStrategy.LogFileSizeBased): Option[String] = {
    // OCC snapshot: read BEFORE building the view, so a commit that
    // lands between the two reads conservatively conflicts
    val seen = table.timeline.completedData.map(_.ts)
    val view = table.view
    // groups already claimed by a pending plan are not re-planned
    val claimed = pendingCompactionPlans
      .flatMap(_.slices.map(s => (s.partition, s.fileId))).toSet
    val candidates = view.latestSlices(None)
      .filter(_.deltas.nonEmpty)
      .filterNot(s => claimed.contains((s.partition, s.fileId)))
    if (candidates.isEmpty) return None

    val chosen = strategy.orderAndFilter(candidates, targetIOBytes)
    if (chosen.isEmpty) return None

    val ts = InstantTimeGenerator.next()
    table.timeline.createRequested(ts, GraftAction.Compaction,
      Json.write(CompactionPlan(
        ts, seen.lastOption.getOrElse(""), chosen, baseSeen = seen)))
    emitCompactionDebt() // schedule-only runners still update the gauges
    Some(ts)
  }

  /** Scheduled-but-unexecuted compaction plans, oldest first. */
  def pendingCompactionPlans: Seq[CompactionPlan] =
    table.timeline.pending
      .filter(i => i.action == GraftAction.Compaction &&
        i.state == GraftState.Requested)
      .sortBy(_.ts)
      .map(i => Json.readCompactionPlan(
        table.storage.readString(new Path(table.storage.metaDir, i.fileName))))

  /** Execute a previously scheduled plan. Completes as a `commit` instant
    * at the PLAN's timestamp (the reference's compaction state machine:
    * compaction.requested → compaction.inflight → commit), so delta
    * commits that landed after scheduling order above the new base file
    * and stay visible. On failure the requested plan survives for retry.
    */
  /** A plan is stale when a chosen group no longer exists or its base
    * file changed since scheduling (a racing clustering / overwrite /
    * compaction) — executing it would read dead files or shadow newer
    * data. `deltasToo` also invalidates on new delta files (clustering
    * plans: a rewrite would shadow them; compaction plans tolerate them —
    * newer deltas simply layer above the compacted base).
    */
  private def planIsStale(chosen: Seq[FileSlice], deltasToo: Boolean): Boolean = {
    val current = table.view.latestSlices(None)
      .map(s => (s.partition, s.fileId) -> s).toMap
    chosen.exists { s =>
      current.get((s.partition, s.fileId)) match {
        case None => true
        case Some(cur) =>
          cur.base.map(_.fileName) != s.base.map(_.fileName) || {
            val curDeltas = cur.deltas.map(_.fileName)
            if (deltasToo) curDeltas != s.deltas.map(_.fileName)
            // compaction tolerates NEW deltas layering above the plan,
            // but every planned input must still exist — a rolled-back
            // delta makes the plan unexecutable, so discard it
            else !s.deltas.map(_.fileName).toSet.subsetOf(curDeltas.toSet)
          }
      }
    }
  }

  def executeCompaction(planTs: String): Option[String] = {
    val execT0 = System.nanoTime()
    val requested = GraftInstant(planTs, GraftAction.Compaction, GraftState.Requested)
    val reqPath = new Path(table.storage.metaDir, requested.fileName)
    require(table.storage.exists(reqPath), s"no scheduled compaction $planTs")
    val plan = Json.readCompactionPlan(table.storage.readString(reqPath))
    val chosen = plan.slices
    if (chosen.isEmpty || planIsStale(chosen, deltasToo = false)) {
      table.timeline.deleteInstant(requested); return None
    }
    val baseSeen = planBaseSeen(plan.baseSeen, plan.baseTs)
    val ts = planTs
    val claim = claimInflight(requested).getOrElse(return None)
    try {
      val staging = new Path(table.storage.tempDir, ts)
      val g = GraftWriteClient.ColTargetFile
      // ONE schema snapshot for every scan of this compaction plan — a
      // concurrent evolution commit landing between the base and delta
      // reads must not give the merge two column sets (same pin as
      // GraftReadClient.planDataSchema)
      val pinnedSchema = table.storedDataSchema

      def pathsOf(ss: Seq[FileSlice], withDeltas: Boolean): Seq[String] =
        ss.flatMap(s =>
          (s.base.toSeq ++ (if (withDeltas) s.deltas else Seq.empty)).map(f =>
            table.resolveDataPath(s.partition, f)))

      /** Shuffle plan: cluster base∪deltas by (partition, group), window
        * to the latest row per key.
        */
      def windowMerged(ss: Seq[FileSlice]): DataFrame = {
        val df = table.readDataFiles(pathsOf(ss, withDeltas = true), pinnedSchema)
          .withColumn(g, GraftWriteClient.fileIdOfScan)
        graft.write.MergeKernel.collapseVersions(
          df.repartition(col(MetaColumns.PartitionPath), col(g)),
          Seq(col(MetaColumns.PartitionPath), col(g), col(MetaColumns.RecordKey)),
          mergeOrderCols(df.columns.toSeq), table.config.payloadClass, "_g_rank",
          precombine = table.config.precombineField)
      }

      def stage(df: DataFrame, overwrite: Boolean): Unit = df
        .filter(!col(MetaColumns.IsDeleted))
        .withColumn(MetaColumns.FileName,
          concat(col(g), lit("_" + ts + table.config.baseFileSuffix)))
        .withColumn(GraftWriteClient.StagePartCol, col(MetaColumns.PartitionPath))
        .withColumn(GraftWriteClient.StageFileCol, col(g))
        .drop(g)
        .write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
        .partitionBy(GraftWriteClient.StagePartCol, GraftWriteClient.StageFileCol)
        .format(table.config.baseFileFormat)
        .save(staging.toString)

      // Like the MOR snapshot read, compaction avoids shuffling the base
      // rows when the delta debt fits the broadcast threshold: deltas
      // reduce to their latest row per key, base rows stream through the
      // shared broadcast winner kernel, and only groups whose deltas
      // introduce NEW keys (which would land in a different task than
      // their group's base rows and break the one-file-per-group write)
      // fall back to the clustered-window plan.
      val deltaBytes = chosen.flatMap(_.deltas).map(_.bytes).sum
      // row-count valve on top of the compressed-byte gate — see
      // GraftReadClient.MaxBroadcastDeltaRowsDefault for the rationale
      val deltaRows = chosen.flatMap(_.deltas).map(_.records).sum
      val budget = spark.sessionState.conf.autoBroadcastJoinThreshold
      val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
      val bcastOk = budget > 0 && deltaBytes <= budget &&
        deltaRows <= graft.read.GraftReadClient.maxBroadcastDeltaRows(spark) &&
        chosen.forall(s => s.base.exists(_.bytes <= maxSplit))
      if (!bcastOk) {
        phase("compact-merge")(stage(windowMerged(chosen), overwrite = true))
      } else phase("compact-merge") {
        val keyCols = Seq(MetaColumns.PartitionPath, g, MetaColumns.RecordKey)
        val base = table.readDataFiles(pathsOf(chosen, withDeltas = false), pinnedSchema)
          .withColumn(g, GraftWriteClient.fileIdOfScan)
        val deltas = table.readDataFiles(
          chosen.flatMap(s => s.deltas.map(f =>
            table.resolveDataPath(s.partition, f))), pinnedSchema)
          .withColumn(g, GraftWriteClient.fileIdOfScan)
        // Materialize delta-latest ONCE, driver-side (mirror of
        // GraftReadClient.mergeDirtyGroups): bcastOk already bounds it to
        // broadcast size, so a LocalRelation replaces the executor
        // persist — one delta scan total, downstream broadcasts build
        // without a Spark job, and no unpersist bookkeeping. Internal-row
        // collect: the Row route converts every value external and back.
        // Default payloads fold newest-per-key on the DRIVER over the raw
        // collected rows (the delta job is then a plain projected scan —
        // no exchange, no aggregate); event_time / non_defaults keep the
        // plan-side collapse (their folds combine versions field-wise).
        val driverFold = table.config.payloadClass != "overwrite_non_defaults" &&
          table.config.precombineField
            .filter(_ => table.config.payloadClass == "event_time")
            .filter(deltas.columns.contains).isEmpty
        val (dRows, dAttrs) =
          if (driverFold)
            graft.write.MergeKernel.collapseLatestDriver(deltas, keyCols,
              Seq(MetaColumns.CommitTime, MetaColumns.CommitSeqno))
          else
            org.apache.spark.sql.graft.Shims.collectInternal(
              graft.write.MergeKernel.collapseVersions(
                deltas, keyCols.map(col), mergeOrderCols(deltas.columns.toSeq),
                table.config.payloadClass, "_g_rank", withBarrier = true,
                precombine = table.config.precombineField))
        val dKeys = org.apache.spark.sql.graft.Shims.projectLocal(
          spark, dAttrs, dRows, keyCols)
        // Insert probe, same inverted shape as mergeDirtyGroups: the base
        // keys stream through a broadcast semi against the (small) delta
        // keys, so nothing base-sized ever shuffles at scale. dLatest
        // holds exactly one row per (partition, group, key), so "does any
        // delta key miss the base" reduces per group to comparing the
        // delta key count (known driver-side) with the count of DISTINCT
        // base keys the semi lets through — the probe collects one row
        // per dirty group instead of the matched key set.
        val pIdx = dAttrs.indexWhere(_.name == MetaColumns.PartitionPath)
        val gIdx = dAttrs.indexWhere(_.name == g)
        val deltaKeyCount: Map[(String, String), Long] = dRows
          .groupBy(r => (r.getString(pIdx), r.getString(gIdx)))
          .view.mapValues(_.length.toLong).toMap
        val matchedCount: Map[(String, String), Long] =
          base.select(keyCols.map(col): _*)
            .join(broadcast(dKeys), keyCols, "left_semi")
            .groupBy(col(MetaColumns.PartitionPath), col(g))
            .agg(count_distinct(col(MetaColumns.RecordKey)).as("_c"))
            .collect()
            .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val insertGroupIds = deltaKeyCount.collect {
          case ((p, gid), n) if matchedCount.getOrElse((p, gid), 0L) < n => gid
        }.toSet
        val (shufChosen, bcastChosen) =
          chosen.partition(s => insertGroupIds.contains(s.fileId))
        val first =
          if (bcastChosen.nonEmpty) {
            val bIds = bcastChosen.map(_.fileId)
            val bIdSet = bIds.toSet
            val dataCols = base.columns.filterNot(keyCols.contains).toSeq
            // the group filter and the _g_in_ reshape both run driver-side
            // over the held rows (plain filter + zero-copy rename) — a
            // filter/select over a LocalRelation would be eagerly
            // evaluated row-by-row with interpreted expressions instead
            val bRows = dRows.filter(r => bIdSet.contains(r.getString(gIdx)))
            val incShaped = org.apache.spark.sql.graft.Shims.renamedLocalDf(
              spark, dAttrs, bRows,
              n => if (keyCols.contains(n)) n
                   else graft.write.MergeKernel.InPrefix + n)
            val mergedB = graft.write.MergeKernel.broadcastWinnerShaped(
              base.filter(col(g).isInCollection(bIds)),
              incShaped, keyCols, dataCols,
              table.config.payloadClass, table.config.precombineField)
            stage(mergedB, overwrite = true)
            false
          } else true
        if (shufChosen.nonEmpty) stage(windowMerged(shufChosen), overwrite = first)
      }

      claim.ensureLive()
      val written = phase("compact-publish")(
        publishCompacted(staging, ts, pinnedSchema))
      TableServices.prePublishHook()
      val publishedMeta = withCommitLock {
        // plan liveness, re-checked under the lock: a rollback/restore
        // that ran while this execution was in flight DISCARDED the plan
        // (its inputs were undone) — publishing anyway would resurrect
        // rolled-back rows into a fresh commit. The requested marker is
        // the liveness token; rollback's discard happens under this same
        // lock, so the two can never interleave.
        if (!table.storage.exists(reqPath))
          abortConflicted("compact", ts, written,
            "a rollback/restore that discarded the plan")
        if (wc.occEnabled) {
          val touched = chosen.map(s => (s.partition, s.fileId)).toSet
          serviceConflict(baseSeen, ts, touched, olderOnly = true)
            .foreach(other => abortConflicted("compact", ts, written, other))
        }
        // A chosen group whose every row was tombstoned produces no new base
        // file; record it as replaced so the stale base version is hidden
        // from read-optimized readers and the group stops being a compaction
        // candidate (mirror of the COW vanished-group fix). EXCEPT: a racer
        // ABOVE our instant that appended a delta to such a group is exempt
        // from serviceConflict (olderOnly) because its delta would layer
        // over our new base — but a vanished group has no new base, and
        // replacing it would drop the racer's committed delta from every
        // slice (committed data loss). Re-read the timeline here, under the
        // commit lock, and keep any such group un-replaced: its stale slice
        // stays latest with the live delta layering above it, and a later
        // compaction folds the tombstones for real.
        val writtenGroups = written.map(w => (w.partition, w.fileId)).toSet
        val allVanished = chosen.map(s => (s.partition, s.fileId)).toSet -- writtenGroups
        val newerTouched: Set[(String, String)] =
          if (allVanished.isEmpty) Set.empty
          else table.timeline.completedData
            .filter(i => !baseSeen.contains(i.ts) && i.ts != ts)
            .flatMap(i => table.timeline.metadataOf(i).files
              .map(f => (f.partition, f.fileId)))
            .toSet
        val vanished = allVanished -- newerTouched
        val replacedMap = vanished.groupBy(_._1).map {
          case (p, gs) => p -> gs.map(_._2).toSeq
        }
        val totalRecords = written.map(_.records).sum
        val totalBytes = written.map(_.bytes).sum
        val meta = GraftCommitMetadata(
          instant = ts, action = GraftAction.Commit, operation = "compact",
          files = written,
          replacedFileIds = replacedMap,
          totalRecords = totalRecords,
          avgRecordSize = if (totalRecords > 0) math.max(1, totalBytes / totalRecords) else 0,
          schemaJson = lastSchemaJson)
        table.timeline.transitionToCompleted(
          GraftInstant(ts, GraftAction.Commit, GraftState.Inflight), meta)
        meta
      }
      // the commit is durable here — fire the hook OUTSIDE the lock, so a
      // slow callback (e.g. the RO-manifest refresh walking every
      // partition) never stretches the metadata-only critical section the
      // lock TTL was sized for
      fireCommitCallback(publishedMeta)
      // the executed plan's markers die with the completion
      table.timeline.deleteInstant(requested)
      table.storage.delete(staging, recursive = true)
      if (metricsOn) {
        // measured EXECUTION time, not now-minus-plan-instant: the plan's
        // ts is its schedule time and a drained crashed plan can be hours
        // older than this run. Debt gauges AFTER the plan markers die, so
        // this executed plan no longer counts as pending.
        graft.metrics.GraftMetrics.onCommit(tableName, publishedMeta,
          (System.nanoTime() - execT0) / 1000000)
        graft.metrics.GraftMetrics.setGauge(
          graft.metrics.GraftMetrics.name(tableName, "compact", "deltaFilesCompacted"),
          chosen.map(_.deltas.size.toLong).sum)
        emitCompactionDebt()
      }
      Some(ts)
    } catch {
      case e: graft.write.ConcurrentWriteConflictException =>
        // the plan lost its race permanently (the conflicting commit is
        // durable) — discard it; a re-schedule sees the new state
        table.timeline.deleteInstant(requested)
        table.storage.delete(new Path(table.storage.tempDir, ts), recursive = true)
        throw e
      case e: Throwable =>
        // keep the requested plan on the timeline for a retry; only the
        // inflight marker and staging output are swept. A LOST claim
        // (heartbeat could not keep the marker alive) cleans nothing:
        // the marker and staging dir may belong to a re-claiming runner.
        if (!claim.refreshFailed) {
          table.storage.delete(new Path(table.storage.metaDir,
            requested.copy(state = GraftState.Inflight).fileName))
          table.storage.delete(new Path(table.storage.tempDir, ts), recursive = true)
        }
        throw e
    } finally claim.close()
  }

  private def publishCompacted(
      staging: Path, ts: String,
      pinnedDataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Seq[WriteFileInfo] = {
    val fs = table.storage.fs
    val out = scala.collection.mutable.ArrayBuffer[WriteFileInfo]()
    val renames = scala.collection.mutable.ArrayBuffer[(Path, Path)]()
    val nameByPath = scala.collection.mutable.Map[String, String]()
    if (!fs.exists(staging)) return Seq.empty
    // listing first: the staged file count gates the driver-bloom fast
    // path (mirrors GraftWriteClient.publishStaged)
    val listed = scala.collection.mutable
      .ArrayBuffer[(String, String, org.apache.hadoop.fs.FileStatus)]()
    fs.listStatus(staging).filter(_.isDirectory).foreach { partDir =>
      val partition = GraftWriteClient.decodeStageValue(
        partDir.getPath.getName.stripPrefix(GraftWriteClient.StagePartCol + "="))
      fs.listStatus(partDir.getPath).filter(_.isDirectory).foreach { gfDir =>
        val fileId = GraftWriteClient.decodeStageValue(
          gfDir.getPath.getName.stripPrefix(GraftWriteClient.StageFileCol + "="))
        val parts = fs.listStatus(gfDir.getPath)
          .filter(s => s.isFile &&
            s.getPath.getName.endsWith(table.config.baseFileSuffix))
        require(parts.length <= 1, s"multi-file compaction group: ${gfDir.getPath}")
        parts.foreach(st => listed += ((partition, fileId, st)))
      }
    }
    val bloomExpected = if (wc.bloomIndexEnabled) wc.bloomExpectedEntries else 0L
    val collectBlooms = bloomExpected > 0 &&
      listed.size * GraftWriteClient.bloomBytesOf(bloomExpected, wc.bloomFpp) <=
        GraftWriteClient.DriverBloomCollectMaxBytes
    val staged = GraftWriteClient.stagedStatsAuto(spark, table.storage, staging,
      listed.map(_._3).toSeq,
      bloomExpected, wc.bloomFpp,
      wc.colStatsColumns.map(table.physicalNameOf),
      table.config.baseFileFormat, collectBlooms,
      // the staged files came out of scans pinned to this schema (column
      // order may differ between merge plans; parquet resolves by name)
      pinnedDataSchema.map(graft.GraftTable.fileSchemaOf))
    val counts = staged.counts
    try {
      listed.foreach { case (partition, fileId, st) =>
        val name = s"${fileId}_$ts${table.config.baseFileSuffix}"
        val stagedPath = st.getPath.toUri.getPath
        val stats = counts.getOrElse(
          stagedPath, GraftWriteClient.FileStats(0L, "", ""))
        renames += ((st.getPath, table.storage.dataFilePath(partition, name)))
        nameByPath(stagedPath) = name
        out += WriteFileInfo(partition, fileId, name, stats.records, st.getLen,
          isDelta = false, stats.minKey, stats.maxKey, stats.colStats, stats.colNulls)
      }
      // sidecar before the renames (its job may recompute from staging);
      // overwrite: a retry at the plan's fixed timestamp may find final
      // files from a crashed prior attempt — unreferenced by any commit
      GraftWriteClient.writeBloomSidecarMapped(
        spark, table.storage, ts, staged, nameByPath.toMap)
      GraftWriteClient.executeRenames(spark, table.storage, renames.toSeq, overwrite = true)
    } finally staged.done() // also on a listing/rename throw — no cache leak
    out.toSeq
  }

  private def mergeOrderCols(cols: Seq[String]) = {
    val pc = table.config.precombineField
      .filter(_ => table.config.payloadClass == "event_time")
      .filter(cols.contains)
    pc.map(f => col(f).desc_nulls_last).toSeq ++ Seq(
      col(MetaColumns.CommitTime).desc,
      col(MetaColumns.CommitSeqno).desc)
  }

  /** Newest commit schema — walks past metadata-only commits with no
    * schemaJson (same rule as GraftTable.storedDataSchema).
    */
  private def lastSchemaJson: String =
    table.storedDataSchema.map(_.json).getOrElse("")

  // =====================================================================
  // Clustering: sort-rewrite small file groups for locality, committed as
  // a replacecommit. (ref: SparkSortAndSizeExecutionStrategy.java:51-90)
  // =====================================================================

  /** Rewrite file groups smaller than `smallFileLimitBytes` into sorted,
    * right-sized new groups. `sortColumns` empty = record-key order.
    * `recentPartitions` limits the plan to the N latest partitions
    * (lexicographic partition-path order) — the reference's
    * recent-days clustering plan strategy
    * (ref: SparkRecentDaysClusteringPlanStrategy.java).
    */
  def cluster(
      sortColumns: Seq[String] = Seq.empty,
      recentPartitions: Option[Int] = None): Option[String] = {
    // same liveness rule as compact(): drain crashed/blocked plans first,
    // or their claimed groups would never re-cluster (stale plans
    // self-discard inside executeClustering)
    val retried = pendingClusteringPlans.flatMap(p => executeClustering(p.instant))
    scheduleClustering(sortColumns, recentPartitions).flatMap(executeClustering)
      .orElse(retried.lastOption)
  }

  /** Plan a clustering run and persist it as a `<ts>.clustering.requested`
    * instant without executing — the same request/execute split as
    * compaction (ref: the reference's requested replacecommit carrying
    * HoodieClusteringPlan). Returns the plan instant, or None when there
    * is nothing worth consolidating.
    */
  def scheduleClustering(
      sortColumns: Seq[String] = Seq.empty,
      recentPartitions: Option[Int] = None): Option[String] = {
    val seen = table.timeline.completedData.map(_.ts)
    val view = table.view
    val all = view.latestSlices(None)
    val claimed = pendingClusteringPlans
      .flatMap(_.slices.map(s => (s.partition, s.fileId))).toSet
    val inScope = recentPartitions match {
      case None => all
      case Some(n) =>
        val keep = all.map(_.partition).distinct
          .sorted(Ordering[String].reverse).take(n).toSet
        all.filter(s => keep(s.partition))
    }
    val candidates = inScope.filter(s =>
      s.deltas.isEmpty && s.base.exists(_.bytes < wc.smallFileLimitBytes) &&
        !claimed.contains((s.partition, s.fileId)))
    // clustering only pays off when it consolidates multiple groups
    val byPartition = candidates.groupBy(_.partition).filter(_._2.size > 1)
    if (byPartition.isEmpty) return None
    val chosen = byPartition.values.flatten.toSeq
    val ts = InstantTimeGenerator.next()
    table.timeline.createRequested(ts, GraftAction.Clustering,
      Json.write(ClusteringPlan(
        ts, seen.lastOption.getOrElse(""), sortColumns, chosen, baseSeen = seen)))
    Some(ts)
  }

  /** Scheduled-but-unexecuted clustering plans, oldest first. */
  def pendingClusteringPlans: Seq[ClusteringPlan] =
    table.timeline.pending
      .filter(i => i.action == GraftAction.Clustering &&
        i.state == GraftState.Requested)
      .sortBy(_.ts)
      .map(i => Json.readClusteringPlan(
        table.storage.readString(new Path(table.storage.metaDir, i.fileName))))

  /** Execute a scheduled clustering plan; completes as a replacecommit at
    * the plan's timestamp. ANY data commit that raced onto a chosen group
    * is fatal (the rewrite would shadow it) — the plan is discarded and
    * a re-schedule sees the new state; other failures keep the plan for
    * retry.
    */
  def executeClustering(planTs: String): Option[String] = {
    val execT0 = System.nanoTime()
    val requested = GraftInstant(planTs, GraftAction.Clustering, GraftState.Requested)
    val reqPath = new Path(table.storage.metaDir, requested.fileName)
    require(table.storage.exists(reqPath), s"no scheduled clustering $planTs")
    val plan = Json.readClusteringPlan(table.storage.readString(reqPath))
    val chosen = plan.slices
    if (chosen.isEmpty || planIsStale(chosen, deltasToo = true)) {
      table.timeline.deleteInstant(requested); return None
    }
    val baseSeen = planBaseSeen(plan.baseSeen, plan.baseTs)
    val ts = planTs
    val paths = chosen.flatMap(s => s.base.map(f =>
      table.resolveDataPath(s.partition, f)))
    // ONE schema snapshot for the scan and the publish-time stats read
    // (same pin discipline as executeCompaction)
    val pinnedSchema = table.storedDataSchema
    val df = table.readDataFiles(paths, pinnedSchema)
    val sortCols =
      if (plan.sortColumns.nonEmpty) plan.sortColumns.map(col)
      else Seq(col(MetaColumns.RecordKey))
    val claim = claimInflight(requested).getOrElse(return None)
    try {
      val avg = table.view.avgRecordSize(wc.defaultRecordSizeBytes)
      val staging = new Path(table.storage.tempDir, ts)
      // clustered files get NEW group ids at publish; the stored FileName
      // (from the source files) would be stale — null it so group-id
      // derivation (fileIdOfScan) parses the new physical name instead
      df.withColumn(MetaColumns.FileName, lit(""))
        .withColumn(GraftWriteClient.StagePartCol, col(MetaColumns.PartitionPath))
        .repartition(col(GraftWriteClient.StagePartCol))
        .sortWithinPartitions(sortCols: _*)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", math.max(1L, wc.targetFileSizeBytes / avg))
        .partitionBy(GraftWriteClient.StagePartCol)
        .format(table.config.baseFileFormat)
        .save(staging.toString)

      claim.ensureLive()
      val written = publishUngrouped(staging, ts, pinnedSchema)
      TableServices.prePublishHook()
      val publishedMeta = withCommitLock {
        // same plan-liveness re-check as executeCompaction: a concurrent
        // rollback/restore discards plans whose inputs it undid
        if (!table.storage.exists(reqPath))
          abortConflicted("cluster", ts, written,
            "a rollback/restore that discarded the plan")
        if (wc.occEnabled) {
          val touched = chosen.map(s => (s.partition, s.fileId)).toSet
          serviceConflict(baseSeen, ts, touched, olderOnly = false)
            .foreach(other => abortConflicted("cluster", ts, written, other))
        }
        val replaced = chosen.groupBy(_.partition).view
          .mapValues(_.map(_.fileId).distinct.toSeq).toMap
        val totalRecords = written.map(_.records).sum
        val totalBytes = written.map(_.bytes).sum
        val meta = GraftCommitMetadata(
          instant = ts, action = GraftAction.ReplaceCommit, operation = "cluster",
          files = written, replacedFileIds = replaced,
          totalRecords = totalRecords,
          avgRecordSize = if (totalRecords > 0) math.max(1, totalBytes / totalRecords) else 0,
          schemaJson = lastSchemaJson)
        table.timeline.transitionToCompleted(
          GraftInstant(ts, GraftAction.ReplaceCommit, GraftState.Inflight), meta)
        meta
      }
      if (metricsOn)
        graft.metrics.GraftMetrics.onCommit(tableName, publishedMeta,
          (System.nanoTime() - execT0) / 1000000)
      // durable commit; hook fires outside the lock (see executeCompaction)
      fireCommitCallback(publishedMeta)
      table.timeline.deleteInstant(requested)
      table.storage.delete(staging, recursive = true)
      Some(ts)
    } catch {
      case e: graft.write.ConcurrentWriteConflictException =>
        table.timeline.deleteInstant(requested)
        table.storage.delete(new Path(table.storage.tempDir, ts), recursive = true)
        throw e
      case e: Throwable =>
        // same lost-claim guard as executeCompaction: never sweep a
        // marker/staging dir a re-claiming runner may now own
        if (!claim.refreshFailed) {
          table.storage.delete(new Path(table.storage.metaDir,
            requested.copy(state = GraftState.Inflight).fileName))
          table.storage.delete(new Path(table.storage.tempDir, ts), recursive = true)
        }
        throw e
    } finally claim.close()
  }

  private def publishUngrouped(
      staging: Path, ts: String,
      pinnedDataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Seq[WriteFileInfo] = {
    val fs = table.storage.fs
    val out = scala.collection.mutable.ArrayBuffer[WriteFileInfo]()
    val renames = scala.collection.mutable.ArrayBuffer[(Path, Path)]()
    val nameByPath = scala.collection.mutable.Map[String, String]()
    var seq = 0
    if (!fs.exists(staging)) return Seq.empty
    // listing first: the staged file count gates the driver-bloom fast
    // path (mirrors GraftWriteClient.publishStaged)
    val listed = scala.collection.mutable
      .ArrayBuffer[(String, String, org.apache.hadoop.fs.FileStatus)]()
    fs.listStatus(staging).filter(_.isDirectory).foreach { partDir =>
      val partition = GraftWriteClient.decodeStageValue(
        partDir.getPath.getName.stripPrefix(GraftWriteClient.StagePartCol + "="))
      fs.listStatus(partDir.getPath)
        .filter(s => s.isFile &&
          s.getPath.getName.endsWith(table.config.baseFileSuffix))
        .sortBy(_.getPath.getName)
        .foreach { st =>
          val fileId = GraftWriteClient.newFileId(ts, seq); seq += 1
          listed += ((partition, fileId, st))
        }
    }
    val bloomExpected = if (wc.bloomIndexEnabled) wc.bloomExpectedEntries else 0L
    val collectBlooms = bloomExpected > 0 &&
      listed.size * GraftWriteClient.bloomBytesOf(bloomExpected, wc.bloomFpp) <=
        GraftWriteClient.DriverBloomCollectMaxBytes
    val staged = GraftWriteClient.stagedStatsAuto(spark, table.storage, staging,
      listed.map(_._3).toSeq,
      bloomExpected, wc.bloomFpp,
      wc.colStatsColumns.map(table.physicalNameOf),
      table.config.baseFileFormat, collectBlooms,
      pinnedDataSchema.map(graft.GraftTable.fileSchemaOf))
    val counts = staged.counts
    try {
      listed.foreach { case (partition, fileId, st) =>
        val name = s"${fileId}_$ts${table.config.baseFileSuffix}"
        val stagedPath = st.getPath.toUri.getPath
        val stats = counts.getOrElse(
          stagedPath, GraftWriteClient.FileStats(0L, "", ""))
        renames += ((st.getPath, table.storage.dataFilePath(partition, name)))
        nameByPath(stagedPath) = name
        out += WriteFileInfo(partition, fileId, name, stats.records, st.getLen,
          isDelta = false, stats.minKey, stats.maxKey, stats.colStats, stats.colNulls)
      }
      // sidecar before the renames (its job may recompute from staging);
      // overwrite: deterministic fileIds (plan ts + seq) make a retry hit
      // the same destinations a crashed prior attempt already moved
      GraftWriteClient.writeBloomSidecarMapped(
        spark, table.storage, ts, staged, nameByPath.toMap)
      GraftWriteClient.executeRenames(spark, table.storage, renames.toSeq, overwrite = true)
    } finally staged.done() // also on a listing/rename throw — no cache leak
    out.toSeq
  }

  // =====================================================================
  // Cleaning: delete file versions no longer needed by the last N commits.
  // (ref: CleanPlanner.java:123-405, policy KEEP_LATEST_COMMITS)
  // =====================================================================

  def clean(retainCommits: Int = 10): Option[String] = {
    // routine maintenance also reaps expired reliable-CDC chunk dirs, so
    // a one-off wide-band read can't leave orphans on the table forever
    graft.read.GraftReadClient.reapStaleCdcCheckpoints(table)
    reapStaleMetaTemp()
    commitClean(cleanCandidates(retainCommits), "clean")
  }

  /** Instant publishes stage their content under `.graft/.temp/` and move
    * it atomically into place (GraftStorage.createImmutable); a writer
    * that dies between stage and move leaves the staged file behind.
    * They are invisible to every reader (not parseable instant names),
    * so reaping is pure hygiene — an age guard keeps us clear of any
    * in-flight publish.
    */
  private def reapStaleMetaTemp(maxAgeMs: Long = 60 * 60 * 1000L): Unit = {
    val st = table.storage
    if (!st.exists(st.tempDir)) return
    val cutoff = System.currentTimeMillis() - maxAgeMs
    // only loose meta_* FILES: service data staging uses <ts>/ SUBDIRS of
    // the same temp dir and has its own lifecycle (publish + rollback)
    st.fs.listStatus(st.tempDir).foreach { f =>
      if (f.isFile && f.getModificationTime < cutoff) st.delete(f.getPath)
    }
  }

  private def cleanCandidates(retainCommits: Int): Seq[WriteFileInfo] = {
    // retaining ZERO commit views would make even the current state a
    // cleaning candidate (and indexed past the timeline end) — the
    // reference's cleaner has the same >= 1 floor
    require(retainCommits >= 1, s"clean must retain >= 1 commits, got $retainCommits")
    val tl = table.timeline
    val dataCommits = tl.completedData
    if (dataCommits.size <= retainCommits) return Seq.empty
    val earliestRetained = dataCommits(dataCommits.size - retainCommits).ts
    // never clean past a savepoint (ref: CleanPlanner savepointed files)
    val savepoints = tl.completed.filter(_.action == GraftAction.Savepoint).map(_.ts)
    val floor = (savepoints :+ earliestRetained).min

    // file groups invalidated by a replacecommit older than the floor are
    // permanently dead — no retained or savepointed view can resolve them
    // (the reference cleaner reclaims replaced groups the same way)
    val replacedDead: Set[(String, String)] = (for {
      i <- dataCommits if i.ts < floor
      meta = tl.metadataOf(i)
      (part, ids) <- meta.replacedFileIds
      id <- ids
    } yield (part, id)).toSet

    val deletable = scala.collection.mutable.ArrayBuffer[WriteFileInfo]()
    table.view.allFilesByGroup.foreach { case ((part, fileId), versions) =>
      if (replacedDead.contains((part, fileId))) {
        versions.foreach { case (_, f) => deletable += f }
      } else {
        val bases = versions.filter(!_._2.isDelta).sortBy(_._1)
        // a base file is deletable if a newer base version exists at ts <= floor
        val keepFrom = bases.takeWhile(_._1 < floor) match {
          case older if older.nonEmpty => older.last._1 // latest version still needed
          case _                       => ""
        }
        bases.foreach { case (bts, f) => if (bts < keepFrom) deletable += f }
        // deltas compacted into a retained base are obsolete
        versions.filter(_._2.isDelta).foreach { case (dts, f) =>
          if (dts <= keepFrom && keepFrom.nonEmpty) deletable += f
        }
      }
    }
    deletable.toSeq
  }

  /** KEEP_LATEST_FILE_VERSIONS cleaning: per active file group keep the
    * newest `retainVersions` base versions (each with the deltas layered
    * above it); replaced groups become fully reclaimable; savepointed
    * files and slices claimed by a pending service plan are never
    * deleted. (ref: CleanPlanner.getFilesToCleanKeepingLatestVersions)
    */
  def cleanVersions(retainVersions: Int = 3): Option[String] =
    commitClean(cleanVersionCandidates(retainVersions), "clean_versions")

  private def cleanVersionCandidates(retainVersions: Int): Seq[WriteFileInfo] = {
    require(retainVersions >= 1, "retainVersions must be >= 1")
    val tl = table.timeline
    // files any savepointed view still resolves — never deletable
    val pinned: Set[String] = tl.completed
      .filter(_.action == GraftAction.Savepoint).map(_.ts)
      .flatMap(spTs => table.view.latestSlices(Some(spTs)).flatMap(s =>
        (s.base.toSeq ++ s.deltas).map(f => s"${s.partition}/${f.fileName}")))
      .toSet
    val replacedDead: Set[(String, String)] = (for {
      i <- tl.completedData
      meta = tl.metadataOf(i)
      (part, ids) <- meta.replacedFileIds
      id <- ids
    } yield (part, id)).toSet
    val claimed = (pendingCompactionPlans.flatMap(_.slices) ++
      pendingClusteringPlans.flatMap(_.slices))
      .map(s => (s.partition, s.fileId)).toSet

    val deletable = scala.collection.mutable.ArrayBuffer[WriteFileInfo]()
    def free(f: WriteFileInfo): Boolean = !pinned(s"${f.partition}/${f.fileName}")
    table.view.allFilesByGroup.foreach { case ((part, fileId), versions) =>
      if (!claimed((part, fileId))) {
        if (replacedDead((part, fileId))) {
          versions.foreach { case (_, f) => if (free(f)) deletable += f }
        } else {
          val bases = versions.filter(!_._2.isDelta).sortBy(_._1)
          if (bases.size > retainVersions) {
            // oldest retained base: versions strictly below it die; its
            // own deltas (dts > cutoff) stay with their slice
            val cutoff = bases(bases.size - retainVersions)._1
            versions.foreach { case (ts, f) =>
              val obsolete = if (f.isDelta) ts <= cutoff else ts < cutoff
              if (obsolete && free(f)) deletable += f
            }
          }
        }
      }
    }
    deletable.toSeq
  }

  /** Persist the deletable list as a `<ts>.clean.requested` plan; inline
    * clean() executes it immediately, a separate runner can execute it
    * later (ref: BaseCleanPlanActionExecutor.requestClean — the
    * request/execute split that lets failed cleans resume from the frozen
    * plan). Files already claimed by an earlier pending plan are not
    * re-planned.
    */
  /** Exactly one crash-orphan sweep per clean run: executeClean reaps
    * itself (covering standalone runners); the no-plan path reaps here.
    */
  private def commitClean(
      deletable: Seq[WriteFileInfo], operation: String): Option[String] =
    scheduleCleanPlan(deletable, operation) match {
      case Some(ts) => executeClean(ts)
      case None     => reapUnfinishedCleanDeletes(); None
    }

  private def scheduleCleanPlan(
      deletable: Seq[WriteFileInfo], operation: String): Option[String] = {
    val planned = pendingCleanPlans.flatMap(_.files).toSet
    val files = deletable.map(f => s"${f.partition}/${f.fileName}")
      .filterNot(planned)
    if (files.isEmpty) return None
    val ts = InstantTimeGenerator.next()
    table.timeline.createRequested(ts, GraftAction.Clean,
      Json.write(CleanPlan(ts, operation, files)))
    Some(ts)
  }

  /** Plan-only variants of [[clean]] / [[cleanVersions]] — persist the
    * `<ts>.clean.requested` plan without deleting anything; a separate
    * [[executeClean]] (same or another TableServices instance) runs it.
    */
  def scheduleClean(retainCommits: Int = 10): Option[String] =
    scheduleCleanPlan(cleanCandidates(retainCommits), "clean")

  def scheduleCleanVersions(retainVersions: Int = 3): Option[String] =
    scheduleCleanPlan(cleanVersionCandidates(retainVersions), "clean_versions")

  /** Scheduled-but-unexecuted clean plans, oldest first. */
  def pendingCleanPlans: Seq[CleanPlan] =
    table.timeline.pending
      .filter(i => i.action == GraftAction.Clean && i.state == GraftState.Requested)
      .sortBy(_.ts)
      .map(i => Json.readCleanPlan(
        table.storage.readString(new Path(table.storage.metaDir, i.fileName))))

  /** Execute a scheduled clean plan: delete its files (idempotently — a
    * retry after a crash re-deletes what's left) and complete the instant
    * with the plan's file list so every view drops them.
    */
  def executeClean(planTs: String): Option[String] = {
    val execT0 = System.nanoTime()
    // standalone runners reach this without going through clean(): sweep
    // any earlier clean's crash-window orphans here too
    reapUnfinishedCleanDeletes()
    val tl = table.timeline
    val requested = GraftInstant(planTs, GraftAction.Clean, GraftState.Requested)
    val reqPath = new Path(table.storage.metaDir, requested.fileName)
    require(table.storage.exists(reqPath), s"no scheduled clean $planTs")
    val plan = Json.readCleanPlan(table.storage.readString(reqPath))
    val claim = claimInflight(requested).getOrElse(return None)
    try {
      TableServices.prePublishHook()
      // PUBLISH FIRST, under the commit lock — metadata-only, so the
      // lock-hold is constant in the number of files cleaned (a large
      // clean can neither stall every writer for its delete duration nor
      // outlive the lock TTL and get broken mid-delete). The liveness
      // re-check closes the rollback/restore race: a restore that
      // discarded this plan (under this same lock) removed reqPath, and
      // a stale plan must not publish deletions of files that are
      // current again.
      val published = withCommitLock {
        if (!table.storage.exists(reqPath)) None
        else {
          claim.ensureLive()
          tl.transitionToCompleted(claim.instant, GraftCommitMetadata(
            instant = planTs, action = GraftAction.Clean,
            operation = plan.operation,
            deletedFiles = plan.files))
          Some(planTs)
        }
      }
      // Physical deletes OUTSIDE the lock (ref: CleanActionExecutor runs
      // deletes with no table-level lock): once the clean commit is on
      // the timeline every view masks its deletedFiles and rollback's
      // plan-discard is moot for these versions, so deletion cannot race
      // anything. A crash in this window leaves unreferenced orphans on
      // disk; the deletes-done marker below bounds the sweep — cleans
      // without one are re-issued (idempotently) by the next clean run.
      published.foreach { _ =>
        TableServices.postCleanPublishHook()
        // small cleans delete driver-side; large ones fan out over
        // executors
        GraftWriteClient.executeDeletes(spark, table.storage,
          plan.files.map(table.storage.dataFilePathOf))
        markCleanDeletesDone(planTs)
        if (metricsOn)
          // ref: HoodieMetrics.updateCleanMetrics(duration, numFilesDeleted)
          graft.metrics.GraftMetrics.onClean(tableName,
            (System.nanoTime() - execT0) / 1000000, plan.files.size.toLong)
      }
      published
    } finally claim.close()
  }

  private def cleanDoneDir =
    new Path(table.storage.metaDir, ".clean_done")

  /** Record that a clean commit's physical deletes all completed, so
    * routine maintenance never re-issues them. Plain create — a marker
    * raced by a concurrent reaper is already what we wanted.
    */
  private def markCleanDeletesDone(ts: String): Unit =
    try {
      table.storage.fs.mkdirs(cleanDoneDir)
      table.storage.createImmutable(new Path(cleanDoneDir, ts), "")
    } catch { case _: java.io.IOException => () /* raced or exists */ }

  /** Crash-window hygiene for publish-then-delete cleans: a process that
    * died after publishing its clean commit but before (or mid-way
    * through) the physical deletes leaves files on disk that NO view
    * resolves — invisible to readers, pure storage leakage. Every
    * completed clean on the active timeline WITHOUT a deletes-done
    * marker gets its deletes re-issued (idempotent — missing files are
    * no-ops) and marked; markers whose instants left the active timeline
    * (archived) are swept. Bounded: the healthy path marks immediately,
    * so this is one small listing per clean run.
    */
  private def reapUnfinishedCleanDeletes(): Unit = {
    val cleans = table.timeline.completed.filter(_.action == GraftAction.Clean)
    val done: Set[String] =
      if (!table.storage.exists(cleanDoneDir)) Set.empty
      else table.storage.listNames(cleanDoneDir).toSet
    cleans.filterNot(i => done(i.ts)).foreach { i =>
      val files = table.timeline.metadataOf(i).deletedFiles
      if (files.nonEmpty)
        GraftWriteClient.executeDeletes(spark, table.storage,
          files.map(table.storage.dataFilePathOf))
      markCleanDeletesDone(i.ts)
    }
    val active = cleans.map(_.ts).toSet
    done.filterNot(active)
      .foreach(ts => table.storage.delete(new Path(cleanDoneDir, ts)))
  }

  // =====================================================================
  // Rollback / savepoint / restore
  // (ref: rollback/ action executors; AbstractHoodieWriteClient.java:504-627)
  // =====================================================================

  /** Discard pending compaction/clustering plans that reference any of
    * the `deleted` data files (`partition/fileName` form) — they can
    * never execute once their inputs are gone. The reference instead
    * refuses rollback while a compaction is pending; discarding is
    * equivalent and also releases the file groups the plan had claimed,
    * so scheduleCompaction can re-plan them against the post-rollback
    * state.
    */
  private def discardPlansReferencing(deleted: Set[String]): Unit = {
    def refs(ss: Seq[FileSlice]): Boolean =
      ss.exists(s => (s.base.toSeq ++ s.deltas)
        .exists(f => deleted.contains(s"${s.partition}/${f.fileName}")))
    (pendingCompactionPlans.filter(p => refs(p.slices))
        .map(p => GraftInstant(p.instant, GraftAction.Compaction, GraftState.Requested)) ++
      pendingClusteringPlans.filter(p => refs(p.slices))
        .map(p => GraftInstant(p.instant, GraftAction.Clustering, GraftState.Requested)))
      .foreach(table.timeline.deleteInstant) // sweeps all state files
  }

  /** Undo one instant: physically delete the files it added and remove it
    * from the timeline. Only the latest data instant (or a pending one)
    * can be rolled back.
    */
  def rollback(instantTs: String): String = {
    val t0 = System.nanoTime()
    val meta = rollbackLocked(instantTs)
    if (metricsOn)
      // ref: HoodieMetrics.updateRollbackMetrics(duration, numFilesDeleted)
      graft.metrics.GraftMetrics.onRollback(tableName,
        (System.nanoTime() - t0) / 1000000, meta.deletedFiles.size.toLong)
    // rollback moves the live base-file set exactly like a data commit —
    // fire the post-commit hook (AFTER the lock, same contract as
    // finishCommit) so e.g. the RO symlink manifest re-serves the
    // pre-rollback base files without waiting for a later commit to
    // touch those partitions
    fireCommitCallback(meta)
    meta.instant
  }

  private def rollbackLocked(instantTs: String): GraftCommitMetadata = withCommitLock {
    // under the commit lock so the plan-discard below can never
    // interleave with a racing service's [plan-liveness re-check +
    // publish] section — without it a mid-flight compaction could
    // publish a base folded from the deltas this rollback deletes
    val tl = table.timeline
    val target = tl.instants.filter(_.ts == instantTs)
    require(target.nonEmpty, s"unknown instant $instantTs")
    val completedData = tl.completedData
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    // partitions whose CONTENT this rollback changes beyond the deleted
    // files — a zero-file replace commit (delete_partition / TRUNCATE)
    // resurrects its replaced partitions with no deletedFiles entry, and
    // incremental consumers (exportIncrementalColumnar) scan rollback
    // metadata to learn what to refresh
    val resurrected = scala.collection.mutable.LinkedHashSet[String]()
    target.find(_.isCompleted) match {
      case Some(done) if GraftAction.DataActions.contains(done.action) =>
        require(completedData.lastOption.exists(_.ts == instantTs),
          s"can only roll back the latest commit, not $instantTs")
        val meta = tl.metadataOf(done)
        resurrected ++= meta.replacePartitions
        resurrected ++= meta.replacedFileIds.keys
        meta.files.foreach { f =>
          table.storage.delete(table.storage.dataFilePath(f.partition, f.fileName))
          deleted += s"${f.partition}/${f.fileName}"
        }
        // the commit's bloom sidecar dies with its files
        table.storage.delete(table.storage.bloomSidecar(instantTs), recursive = true)
        // pending service plans whose inputs just vanished are dead
        discardPlansReferencing(deleted.toSet)
        // pending CLEAN plans die wholesale: the undo changes which file
        // version is LATEST per touched group, so a plan computed before
        // it may now target files that are current again. Clean targets
        // OLD versions — never this commit's own files — so reference
        // matching cannot catch this; re-scheduling is cheap.
        tl.pending.filter(_.action == GraftAction.Clean)
          .foreach(tl.deleteInstant)
      case _ => // pending instant: wipe staging only
        table.storage.delete(
          new Path(table.storage.tempDir, instantTs), recursive = true)
    }
    target.foreach(tl.deleteInstant)
    val ts = InstantTimeGenerator.next()
    val i = tl.transitionToInflight(tl.createRequested(ts, GraftAction.Rollback))
    val meta = GraftCommitMetadata(
      instant = ts, action = GraftAction.Rollback, operation = "rollback",
      deletedFiles = deleted.toSeq,
      replacePartitions = resurrected.toSeq,
      extra = Map("rolled_back_instant" -> instantTs))
    tl.transitionToCompleted(i, meta)
    meta
  }

  /** Lazily roll back writes that began but never completed — the
    * crashed-writer cleanup the reference runs as heartbeat-expired
    * rollback (ref: HoodieHeartbeatClient.java +
    * BaseHoodieWriteClient rollbackFailedWrites, listing-based strategy
    * AbstractMarkerBasedRollbackStrategy.java). A pending data instant
    * older than `olderThanMillis` is dead: its staging directory, any
    * data files it already moved into the table (they carry its instant
    * in their names and are invisible to readers, who resolve files from
    * commit manifests only), and its timeline files are removed. The
    * orphan sweep is the ONLY listing-based path in the engine — an
    * explicit maintenance op, never on the read/write path. Returns the
    * instants rolled back.
    */
  def rollbackFailedWrites(olderThanMillis: Long = 10 * 60 * 1000L): Seq[String] = {
    val tl = table.timeline
    val fmt = new java.text.SimpleDateFormat("yyyyMMddHHmmssSSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    fmt.setLenient(true)
    val cutoff = System.currentTimeMillis() - olderThanMillis
    // an instant pending in both requested and inflight state shows up
    // once per state file — roll the instant back once
    val dead = tl.pending.distinctBy(_.ts).filter { i =>
      GraftAction.DataActions.contains(i.action) &&
        (try fmt.parse(i.ts.take(17)).getTime < cutoff
        catch { case _: java.text.ParseException => false })
    }
    if (dead.isEmpty) return Seq.empty
    val fs = table.storage.fs
    def dataFiles(dir: Path): Seq[Path] =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n == GraftStorage.MetaDirName || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) dataFiles(st.getPath)
        else Seq(st.getPath)
      }
    lazy val allFiles = dataFiles(table.storage.basePath)
    dead.map { i =>
      allFiles.filter(_.getName.contains(s"_${i.ts}."))
        .foreach(p => table.storage.delete(p))
      table.storage.delete(new Path(table.storage.tempDir, i.ts), recursive = true)
      table.storage.delete(table.storage.bloomSidecar(i.ts), recursive = true)
      tl.instants.filter(_.ts == i.ts).foreach(tl.deleteInstant)
      val ts = InstantTimeGenerator.next()
      val r = tl.transitionToInflight(tl.createRequested(ts, GraftAction.Rollback))
      tl.transitionToCompleted(r, GraftCommitMetadata(
        instant = ts, action = GraftAction.Rollback, operation = "rollback_failed",
        extra = Map("rolled_back_instant" -> i.ts)))
      i.ts
    }
  }

  /** Pin an instant against cleaning. (ref: SavepointActionExecutor.java) */
  def savepoint(instantTs: String): Unit = {
    val tl = table.timeline
    require(tl.completedData.exists(_.ts == instantTs), s"no completed commit $instantTs")
    // resolve the savepointed view NOW: throws if cleaning already removed
    // that state (an unreconstructible savepoint would otherwise wedge
    // every later clean's pinned-files computation)
    table.view.latestSlices(Some(instantTs))
    val i = tl.transitionToInflight(tl.createRequested(instantTs, GraftAction.Savepoint))
    tl.transitionToCompleted(i, GraftCommitMetadata(
      instant = instantTs, action = GraftAction.Savepoint, operation = "savepoint"))
  }

  /** Restore the table to a savepointed instant by rolling back every
    * newer commit, newest first. (ref: BaseRestoreActionExecutor.java)
    */
  def restore(instantTs: String): Unit = {
    val t0 = System.nanoTime()
    val tl = table.timeline
    // every commit above the target must still be on the active timeline
    // — archived commits cannot be rolled back, so a silent partial
    // restore would land on the archive boundary instead of the target
    val lastArchived = table.archiveBoundary
    require(lastArchived.forall(_ <= instantTs),
      s"cannot restore to $instantTs: commits up to ${lastArchived.getOrElse("")} " +
        "are archived and can no longer be rolled back")
    val undone = tl.completedData.filter(_.ts > instantTs).reverse
    undone.foreach(i => rollback(i.ts))
    val ts = InstantTimeGenerator.next()
    val i = tl.transitionToInflight(tl.createRequested(ts, GraftAction.Restore))
    tl.transitionToCompleted(i, GraftCommitMetadata(
      instant = ts, action = GraftAction.Restore, operation = "restore",
      extra = Map("restored_to" -> instantTs)))
    if (metricsOn)
      graft.metrics.GraftMetrics.onRestore(tableName,
        (System.nanoTime() - t0) / 1000000, undone.size.toLong)
  }

  // =====================================================================
  // Archiving: bound the active timeline; write a manifest checkpoint so
  // views stay O(active timeline).
  // (ref: HoodieTimelineArchiveLog.java:120-194)
  // =====================================================================

  def archive(minCommits: Int = 20, maxCommits: Int = 30): Option[String] = {
    val t0 = System.nanoTime()
    val tl = table.timeline
    // savepoints stay on the active timeline — archiving one would lose
    // the cleaner's savepoint floor protection
    val savepoints = tl.completed.filter(_.action == GraftAction.Savepoint).map(_.ts)
    val completed = tl.completed.filterNot(_.action == GraftAction.Savepoint)
    if (completed.size <= maxCommits) return None
    // never archive past the OLDEST savepoint: restore(sp) must be able
    // to roll back every commit above it, and rollback only works on the
    // active timeline (the reference equivalently keeps instants beyond
    // the earliest savepoint out of the archive candidates)
    val spFloor = savepoints.minOption
    val toArchive = completed.dropRight(minCommits)
      .filter(i => spFloor.forall(i.ts < _))
    if (toArchive.isEmpty) return None
    // A clean leaving the active timeline MUST have its physical deletes
    // done first: reapUnfinishedCleanDeletes only scans ACTIVE cleans, so
    // archiving a clean whose process crashed between publish and the
    // deletes (no deletes-done marker) would otherwise leak its planned
    // file versions on disk forever — invisible to every view, found by
    // no later sweep.
    if (toArchive.exists(_.action == GraftAction.Clean))
      reapUnfinishedCleanDeletes()

    // checkpoint the view AT THE ARCHIVE BOUNDARY before removing
    // instants (Delta-checkpoint pattern). The cap matters: files of
    // still-active commits must not enter the manifest, or a later
    // rollback of those commits would delete files the manifest still
    // references.
    val archiveTs = toArchive.last.ts
    val liveFiles = table.viewAt(Some(archiveTs)).latestSlices(None)
      .flatMap(s => s.base.toSeq ++ s.deltas)
    // Bootstrap source bases must outlive their commit on the active
    // timeline: adopted (externalPath) entries in the manifest need the
    // recorded base for hive-layout partition resurrection, keyed per
    // instant (`bootstrap.source.<ts>`). Carry prior manifests' entries
    // forward and add those of the instants being archived now.
    val srcKey = graft.write.GraftWriteClient.BootstrapSourceKey
    val priorBootstrap: Map[String, String] = table.archiveBoundary
      .map { b =>
        try graft.core.Json.readCommitMetadata(
          table.storage.readOverwritable(
            new Path(table.storage.archiveDir, s"$b.manifest")))
          .extra.filter(_._1.startsWith(srcKey + "."))
        catch { case _: Exception => Map.empty[String, String] }
      }
      .getOrElse(Map.empty)
    val newBootstrap: Map[String, String] = toArchive
      .flatMap(i => tl.metadataOf(i).extra.get(srcKey)
        .map(v => s"$srcKey.${i.ts}" -> v))
      .toMap
    val manifest = GraftCommitMetadata(
      instant = archiveTs, action = GraftAction.Commit, operation = "manifest",
      files = liveFiles,
      schemaJson = lastSchemaJson,
      extra = priorBootstrap ++ newBootstrap)
    if (!table.storage.fs.exists(table.storage.archiveDir))
      table.storage.fs.mkdirs(table.storage.archiveDir)
    // manifests are IMMUTABLE once published (expandedManifest memoizes
    // by name): a crashed-then-retried archive at the same boundary
    // KEEPS the prior attempt's manifest, never replaces its bytes — a
    // clean that ran between the attempts would otherwise change the
    // content under a name other processes may have cached. The older
    // content stays consistent because clean/rollback deletions are
    // applied to every view UNCAPPED (see viewAt).
    graft.core.ArchiveManifest.write(spark, table.storage, archiveTs, manifest)
    tl.archive(toArchive)
    if (metricsOn)
      graft.metrics.GraftMetrics.onArchive(tableName,
        (System.nanoTime() - t0) / 1000000, toArchive.size.toLong)
    Some(archiveTs)
  }
}

object TableServices {
  /** Test-only fault-injection seam: runs between a service's staging
    * work and its locked publish section, the exact window where a
    * concurrent rollback/restore can discard the plan mid-execution.
    * Deterministic interleaving for the specs; a no-op in production.
    */
  private[graft] var prePublishHook: () => Unit = () => ()

  /** Test-only seam: runs after a clean commit is PUBLISHED (lock
    * released) but before its physical deletes start — the window where
    * writers must not be blocked and a crash leaves unreferenced
    * orphans. Deterministic interleaving for the specs; no-op in
    * production.
    */
  private[graft] var postCleanPublishHook: () => Unit = () => ()
}
