package graft.write

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.GraftTable
import graft.core._

/** Write operations of the Graft engine: upsert / insert / bulk_insert /
  * delete / delete_partitions / insert_overwrite[_table], for both COW and
  * MOR tables.
  *
  * The end-to-end shape mirrors the reference write path
  * (ref: hudi-client/hudi-spark-client/.../SparkRDDWriteClient.java:149-255
  * and BaseSparkCommitActionExecutor.java:112-146): key/partition
  * extraction -> optional pre-combine -> index tag -> workload profile ->
  * bucket assignment (small-file bin-packing,
  * ref: UpsertPartitioner.java:101-296) -> per-file-group merge-write ->
  * atomic commit. Everything between the driver-side planning steps is a
  * single declarative DataFrame pipeline: one shuffle clustering rows by
  * (partition, fileGroup), a windowed latest-wins merge that Catalyst
  * runs without a second shuffle, and a partitioned parquet write.
  */
final class GraftWriteClient(val table: GraftTable, val wc: WriteConfig = WriteConfig()) {
  import GraftWriteClient._

  private val spark = table.spark
  private def cfg = table.config

  // fail a typo'd reporter at construction, not at first publish
  if (wc.metricsOn)
    graft.metrics.GraftMetrics.ensureReporter(
      wc.metricsReporter, wc.metricsReportPeriodSec)

  /** Per-commit metrics from the published metadata (ref:
    * AbstractHoodieWriteClient.java:221-222 → HoodieMetrics
    * .updateCommitMetrics). After the publish, outside any lock — pure
    * driver-side arithmetic over metadata already in hand, never a
    * failure source for a durable commit.
    */
  private def emitCommitMetrics(meta: GraftCommitMetadata): Unit =
    if (wc.metricsOn)
      graft.metrics.GraftMetrics.onCommit(cfg.tableName, meta)

  // ---- key generation (ref: hudi-client-common/.../keygen/*KeyGenerator;
  // pure Column expressions, no custom Expression needed) ----
  /** A null or empty record-key component fails the write row-side —
    * concat_ws would silently SKIP it and alias distinct records onto one
    * key (ref: KeyGenUtils.getRecordKey throws HoodieKeyException on
    * null/empty key parts).
    */
  /** Label the Spark jobs of a write phase (shows in the UI/event log —
    * a keyed write is ~8 sequential jobs and unlabeled they're opaque).
    */
  private def phase[T](name: String)(body: => T): T = {
    val sc = spark.sparkContext
    // save/restore: a caller-level description (e.g. the bench's
    // per-query label) must survive the phase, so jobs between phases
    // stay attributed to their query instead of going unlabeled
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("graft: " + name)
    try body finally sc.setJobDescription(prev)
  }

  private def keyExpr: Column = KeyGen.keyExpr(cfg)

  private def partExpr: Column = KeyGen.partExpr(cfg)

  /** Deterministic content-hash tiebreak so merges are reproducible even
    * when ordering values collide (monotonically_increasing_id is not
    * stable across plans, so it is never used for ordering). Columns are
    * hashed NATIVELY — this expression evaluates per row under every
    * merge window and pre-combine aggregate, and rendering each column
    * to a string first (decimal/date/timestamp formatting) multiplied
    * the per-row cost several-fold. Only map-bearing columns still cast
    * to string: Spark's xxhash64 rejects map inputs (undefined entry
    * order). Hash VALUES differ from the former string-cast form, but
    * the tiebreak only decides between rows whose key, ordering value
    * and commit all collide — where no declared semantics (and no
    * cross-engine oracle, which cannot evaluate xxhash64) depends on
    * which duplicate wins; determinism is what matters, and native
    * hashing is just as deterministic.
    */
  private def tiebreakExpr(dataFields: Seq[org.apache.spark.sql.types.StructField]): Column = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    xxhash64(dataFields.map { f =>
      if (hasMap(f.dataType)) col(f.name).cast("string") else col(f.name)
    }: _*)
  }

  /** Merge precedence for latest-wins row picking, highest first.
    * "overwrite_latest" = incoming always beats stored
    * (ref: OverwriteWithLatestAvroPayload.java:50-66); "event_time" =
    * larger precombine wins even if stored
    * (ref: DefaultHoodieRecordPayload.java:55-75).
    */
  /** `dataFields` carry the batch's resolved types so the tiebreak never
    * re-reads the stored schema (a timeline listing per call at
    * object-store scale).
    */
  private def mergeOrder(dataFields: Seq[org.apache.spark.sql.types.StructField]): Seq[Column] = {
    val pc = cfg.precombineField.filter(_ => cfg.payloadClass == "event_time")
    pc.map(f => col(f).desc_nulls_last).toSeq ++
      Seq(col(MetaColumns.CommitTime).desc, tiebreakExpr(dataFields).desc)
  }

  // =====================================================================
  // Public operations
  // =====================================================================

  /** Metadata-only bootstrap: adopt an existing dataset WITHOUT copying
    * or rewriting a single data byte. One distributed pass over the
    * source computes, per file, the record count, rendered-key range,
    * column stats and key bloom; each file becomes a file group whose
    * manifest entry points at the ORIGINAL path (`externalPath`). Reads
    * synthesize the meta columns inside the scan with the same keygen
    * expressions (GraftTable.readDataFiles) — one file per row, unlike
    * the reference's skeleton stitching — and the first upsert/compaction
    * /clustering that touches a group rewrites it into a normal internal
    * file; the source file is never deleted (its manifest path is
    * virtual, so cleaning the superseded version is a no-op on storage).
    * (ref: BootstrapMode.java:29-34 METADATA_ONLY,
    * SparkBootstrapCommitActionExecutor.java,
    * HoodieBootstrapRelation.scala:1-195 — re-expressed without skeleton
    * files.)
    *
    * Source layout requirements (checked): files are `baseFileFormat`,
    * partition values either live IN the files or come from hive-style
    * `field=value/` directories (later scans resurrect them via the
    * basePath option, with the base derived from the paths themselves),
    * and no file spans two partition values of the table's partitioning.
    * Key uniqueness is trusted, as in bulk_insert.
    */
  /** @param partitionKeep when set, adopt only source files whose
    *   partition path passes the predicate — the per-partition routing
    *   half of a selective bootstrap (see Bootstrap.selective; ref:
    *   BootstrapRegexModeSelector.java). Excluded partitions stay
    *   untouched for a FULL_RECORD pass. Applied to the collected
    *   per-file stats rows (planning metadata), never row data.
    */
  /** @param partitionKeep  driver-side partition filter; with it, every
    *                        source file must be single-partition.
    * @param partitionKeepExpr ROW-level adoption predicate (selective
    *                        bootstrap): a file is adopted iff ANY of its
    *                        rows matches, and only ADOPTED files must be
    *                        single-partition — a multi-partition file
    *                        whose rows all belong to the full-record
    *                        side no longer aborts the bootstrap.
    */
  def bootstrapMetadataOnly(
      sourceDir: String,
      partitionKeep: Option[String => Boolean] = None,
      partitionKeepExpr: Option[Column] = None): String = {
    require(table.timeline.completedData.isEmpty,
      "metadata-only bootstrap requires an empty table")
    val instant = begin(GraftAction.Commit)
    try {
      // partition inference ON: a hive-layout source surfaces its
      // directory-encoded values as columns here, and the recorded data
      // schema carries them so external scans re-derive them per file
      val src = spark.read
        .format(table.config.baseFileFormat).load(sourceDir)
      val srcSchema = src.schema
      MetaColumns.AllWithDeleted.foreach(m => require(!srcSchema.fieldNames.contains(m),
        s"source already carries meta column '$m' — is it a graft table?"))
      val keyed = src
        .withColumn(MetaColumns.RecordKey, keyExpr)
        .withColumn(ColPart, partExpr)
      val statFields = GraftWriteClient.resolveStatFields(srcSchema, wc.colStatsColumns)
      val baseAggs = Seq(
        count(lit(1)).as("_n"),
        min(col(MetaColumns.RecordKey)).as("_mn"),
        max(col(MetaColumns.RecordKey)).as("_mx"),
        min(col(ColPart)).as("_p0"),
        max(col(ColPart)).as("_p1"))
      val bloomAggs = GraftWriteClient.bloomAggsOf(
        if (wc.bloomIndexEnabled) wc.bloomExpectedEntries else 0L, wc.bloomFpp)
      // row-level adoption flags LAST so the positional stats decode below
      // is untouched; _keep = any row matches, _keep_all = every row does —
      // adoption is only sound when the two agree (see the require below)
      val keepAgg = partitionKeepExpr.toSeq.flatMap(e => Seq(
        max(when(e, lit(1)).otherwise(lit(0))).as("_keep"),
        min(when(e, lit(1)).otherwise(lit(0))).as("_keep_all")))
      val aggs = baseAggs ++ bloomAggs ++
        GraftWriteClient.statAggsOf(statFields) ++ keepAgg
      // the group id hashes input_file_name via the SAME expression later
      // scans use, so read-time group derivation needs no lookup table
      val aggDf = keyed
        .groupBy(input_file_name().as("_f"), KeyGen.externalFileIdExpr.as("_id"))
        .agg(aggs.head, aggs.tail: _*)
      // blooms stay executor-resident (see stagedFileStats): persist the
      // aggregate ONCE — the source is the full adopted dataset, which
      // must not be scanned a second time — collect only the small
      // columns, and write the sidecar straight from the cached frame
      // (file names are executor-derivable here: fileId + instant).
      val cachedAgg =
        if (bloomAggs.isEmpty) None
        else Some(aggDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // row layout of the collect: 0 = _f, 1 = _id (groupBy keys), then
      // the agg columns — `_bf` is never collected
      val statsStart = 2 + baseAggs.size
      val rows = cachedAgg.map(_.drop("_bf")).getOrElse(aggDf).collect()
      // source file sizes: one recursive listing
      val srcPath = new Path(sourceDir)
      val srcFs = srcPath.getFileSystem(table.storage.conf)
      val sizes = {
        val it = srcFs.listFiles(srcFs.makeQualified(srcPath), true)
        val m = scala.collection.mutable.Map[String, Long]()
        while (it.hasNext) { val st = it.next(); m(st.getPath.toUri.getPath) = st.getLen }
        m
      }
      try {
        // (file info, partition range, row-level keep flag); the
        // single-partition requirement applies only to files actually
        // ADOPTED — enforced after selection below
        val allFiles = rows.toSeq.map { r =>
          val path = GraftWriteClient.decodedPath(r.getString(0))
          val fileId = r.getString(1)
          val (p0, p1) = (r.getString(5), r.getString(6))
          val records = r.getLong(2)
          val (colStats, colNulls) =
            GraftWriteClient.decodeColStats(r, statsStart, statFields, records)
          val keepByExpr = partitionKeepExpr
            .map(_ => r.getInt(r.fieldIndex("_keep")) > 0)
          val keepAllRows = partitionKeepExpr
            .map(_ => r.getInt(r.fieldIndex("_keep_all")) > 0)
          (WriteFileInfo(
            partition = p0, fileId = fileId,
            fileName = fileId + "_" + instant.ts + table.config.baseFileSuffix,
            records = records, bytes = sizes.getOrElse(path, 0L), isDelta = false,
            minKey = Option(r.getString(3)).getOrElse(""),
            maxKey = Option(r.getString(4)).getOrElse(""),
            colStats = colStats, colNulls = colNulls,
            // full URI: the adopted file must resolve on the SOURCE's
            // filesystem (s3a://…, hdfs://…), not the session default
            externalPath = Some(GraftWriteClient.decodedFullPath(r.getString(0)))),
            (path, p0, p1), keepByExpr, keepAllRows)
        }
        val selected = (partitionKeepExpr, partitionKeep) match {
          case (Some(_), _)       => allFiles.filter(_._3.contains(true))
          case (None, Some(keep)) => allFiles.filter(t => keep(t._1.partition))
          case _                  => allFiles
        }
        // all-or-none enforcement: adoption is per-FILE, so a file where
        // only SOME rows match partitionKeepExpr must abort — adopting it
        // whole duplicates the non-matching rows once the FULL_RECORD
        // complement (filter on !expr) re-writes them, and skipping it
        // would LOSE the matching rows (they are on neither side). The
        // internal Bootstrap.selective caller derives the predicate from
        // the partition expression, so its single-partition adopted files
        // always pass; this closes the contract for public callers.
        if (partitionKeepExpr.isDefined)
          selected.foreach { case (_, (path, _, _), _, all) =>
            require(all.contains(true),
              s"source file $path mixes rows selected and not selected by " +
                "partitionKeepExpr — metadata-only adoption takes whole files " +
                "only; derive the predicate from the partition expression or " +
                "re-layout the source")
          }
        // adopted files must be single-partition (their manifest entry
        // carries ONE partition value); with the function-only selector
        // the check stays global — min/max alone cannot prove a spanning
        // non-selected file holds no selected rows
        val checkSpan =
          if (partitionKeepExpr.isDefined) selected else allFiles
        checkSpan.foreach { case (_, (path, p0, p1), _, _) =>
          require(p0 == p1,
            s"source file $path spans partitions '$p0'..'$p1' — metadata-only " +
              "bootstrap needs single-partition files (repartition the source " +
              "or use FULL_RECORD)")
        }
        val files = selected.map(_._1)
        require(files.nonEmpty,
          "metadata-only bootstrap adopted no source files" +
            (if (partitionKeep.isDefined || partitionKeepExpr.isDefined)
              " (partition selector matched none)" else ""))
        require(files.map(_.fileId).distinct.size == files.size,
          "file-id hash collision across source files (re-layout the source)")
        cachedAgg.foreach { c =>
          // sidecar only for ADOPTED files — excluded partitions belong
          // to the full-record pass, whose own write builds their blooms
          val frame =
            if (partitionKeep.isDefined || partitionKeepExpr.isDefined)
              c.filter(col("_id").isInCollection(files.map(_.fileId)))
            else c
          GraftWriteClient.writeBloomSidecar(table.storage, instant.ts,
            frame.select(
              concat(col("_id"),
                lit("_" + instant.ts + table.config.baseFileSuffix)).as("file_name"),
              col("_bf").as("bloom")),
            files.size)
        }
        finishCommit(instant, "bootstrap_metadata_only", files,
          replaced = Map.empty, dataSchema = srcSchema,
          // scans use the recorded base for hive partition resurrection —
          // derived per-path stripping would misfire on a flat source
          // living inside a `name=value`-named directory
          extraMeta = Map(GraftWriteClient.BootstrapSourceKey ->
            srcFs.makeQualified(srcPath).toString))
      } finally cachedAgg.foreach(_.unpersist(blocking = false))
    } catch {
      case e: Throwable => abort(instant); throw e
    }
    postWrite()
    instant.ts
  }

  /** Initial large load: sort + sized parquet files, no index lookup.
    * (ref: SparkRDDWriteClient.java:223-246, HoodieSparkSqlWriter
    * row-native path :325-360 — which converges to exactly this
    * DataFrame pipeline.)
    */
  def bulkInsert(df: DataFrame): String =
    writeNewFilesCommit(df, "bulk_insert", GraftAction.Commit, replaced = Map.empty)

  /** Upsert: updates routed to their existing file group, inserts packed
    * into small/new files. (ref: SparkRDDWriteClient.java:149-160)
    */
  def upsert(df: DataFrame): String =
    runKeyedWrite(df, "upsert", tag = true,
      dedupIncoming = wc.combineBeforeUpsert, deleteOp = false)

  /** Upsert of records the caller guarantees already deduplicated: the
    * pre-combine pass is skipped (the reference additionally carries
    * pre-resolved file locations on its records; our location tag is a
    * manifest-pruned join rather than per-record state, so it always
    * runs). (ref: SparkRDDWriteClient.java:162-170 upsertPreppedRecords)
    */
  def upsertPrepped(df: DataFrame): String =
    runKeyedWrite(df, "upsert_prepped", tag = true,
      dedupIncoming = false, deleteOp = false)

  /** Insert without update routing; still packs small files; duplicates
    * allowed. (ref: SparkRDDWriteClient.java:172-196)
    */
  def insert(df: DataFrame): String =
    runKeyedWrite(
      if (wc.insertDropDups) filterExists(df) else df,
      "insert", tag = false,
      dedupIncoming = wc.combineBeforeInsert, deleteOp = false)

  /** Delete by key: `df` needs the record-key (+ partition) columns.
    * (ref: SparkRDDWriteClient.java:248-253, SparkDeleteHelper.java —
    * delete is an upsert of empty payloads; ours is a merge that drops
    * tombstoned rows at rewrite.)
    *
    * Under the "event_time" payload a tombstone competes on the
    * precombine value like any other record: a delete batch WITHOUT the
    * precombine column carries a null ordering and loses to any stored
    * row that has one (the reference's DefaultHoodieRecordPayload rule);
    * include the precombine column in `df` to make the delete effective.
    */
  def delete(df: DataFrame): String =
    runKeyedWrite(df, "delete", tag = true, dedupIncoming = true, deleteOp = true)

  /** Mixed upsert+delete in ONE commit: rows where boolean column
    * `deleteMarker` is true are deleted, the rest upserted — the write
    * shape SQL MERGE needs (the reference folds per-row update/delete
    * decisions into one upsert the same way via ExpressionPayload,
    * ref: MergeIntoHoodieTableCommand.scala:216-280).
    */
  def mergeWrite(df: DataFrame, deleteMarker: String): String =
    runKeyedWrite(df, "merge", tag = true, dedupIncoming = wc.combineBeforeUpsert,
      deleteOp = false, deleteMarker = Some(deleteMarker))

  /** Replace all file groups of the partitions present in `df`.
    * (ref: SparkInsertOverwriteCommitActionExecutor.java)
    */
  def insertOverwrite(df: DataFrame): String =
    // the replaced-partition set is derived from the WRITTEN files (this
    // path writes every input row, so written partitions == input
    // partitions) — computing it up front would run a whole extra pass
    // over the input pipeline just for distinct partition values
    writeNewFilesCommit(df, "insert_overwrite", GraftAction.ReplaceCommit,
      replaced = Map.empty, replaceFromWritten = true)

  /** Replace every file group in the table.
    * (ref: SparkInsertOverwriteTableCommitActionExecutor.java)
    */
  def insertOverwriteTable(df: DataFrame): String = {
    val view = table.view
    val allParts = view.partitions.toSet
    // conflicts escalate to EVERY concurrent data commit (the operation
    // name carries the all-partitions semantics; replacePartitions here
    // records the snapshot's partitions for forensics only)
    writeNewFilesCommit(df, "insert_overwrite_table", GraftAction.ReplaceCommit,
      replaced = view.groupsInPartitions(allParts),
      replacePartitions = allParts.toSeq.sorted)
  }

  /** Drop whole partitions via a replace-commit — no data rewrite.
    * (ref: SparkDeletePartitionCommitActionExecutor.java)
    */
  def deletePartitions(partitions: Seq[String]): String = {
    val instant = begin(GraftAction.ReplaceCommit)
    val replaced = table.view.groupsInPartitions(partitions.toSet)
    // [conflict check + publish] under the SAME lock seam as
    // finishCommit: a partition-replacing commit racing a keyed write
    // is exactly the escalated-conflict case the lock exists for, so
    // leaving it outside the lock would reopen the check→publish window
    // for the most dangerous operation.
    val lock = LockProvider.forTable(wc.lockProvider, table.storage, wc.lockTtlMs, wc.lockJdbcUrl)
    if (!lock.tryLock(wc.lockTimeoutMs)) {
      table.timeline.deleteInstant(instant)
      throw new LockAcquireException(
        s"delete_partition ${instant.ts} could not acquire the " +
          s"'${wc.lockProvider}' commit lock within ${wc.lockTimeoutMs} ms; " +
          "nothing was published — retry")
    }
    val publishedMeta = try {
      if (wc.occEnabled) {
        // .toSeq first — a Map-to-tuples flatMap would collapse to one id
        // per partition (see conflictingInstant)
        val touched = replaced.toSeq.flatMap { case (p, ids) => ids.map((p, _)) }.toSet
        conflictingInstant(occBaseSeen, instant.ts, touched,
            myReplaceParts = partitions.toSet).foreach { other =>
          table.timeline.deleteInstant(instant)
          throw new ConcurrentWriteConflictException(
            s"delete_partition ${instant.ts} conflicts with $other; retry")
        }
      }
      val meta = GraftCommitMetadata(
        instant = instant.ts, action = instant.action, operation = "delete_partition",
        replacedFileIds = replaced, replacePartitions = partitions.sorted,
        extra = wc.commitExtra,
        // metadata-only commit: carry the schema forward so the table
        // never reads as schemaless
        schemaJson = table.storedDataSchema.map(_.json).getOrElse(""))
      table.timeline.transitionToCompleted(
        instant.copy(state = GraftState.Inflight), meta)
      meta
    } finally lock.unlock()
    // callback + metrics AFTER the lock (the finishCommit contract): a
    // slow hook — e.g. the RO-manifest refresh over every dropped
    // partition — must never stretch the metadata-only critical section
    emitCommitMetrics(publishedMeta)
    fireCommitCallback(publishedMeta)
    instant.ts
  }

  /** Keep only records whose key is NOT already in the table.
    * (ref: SparkRDDWriteClient.java:131-138 filterExists)
    */
  def filterExists(df: DataFrame): DataFrame = {
    val withKeys = df
      .withColumn(ColKey, keyExpr)
      .withColumn(ColPart, partExpr)
    // pruning is sound for the anti-join too: a pruned file cannot
    // contain any incoming key, so it can never produce a match
    val (bounds, nIncoming, _) = incomingStats(withKeys)
    val idx = keyIndex(Some(withKeys), Some(bounds), nIncoming = nIncoming)
    withKeys.join(idx, Seq(ColKey, ColPart), "left_anti")
      .drop(ColKey, ColPart)
  }

  // =====================================================================
  // Keyed write engine (upsert / insert / delete)
  // =====================================================================

  private def runKeyedWrite(
      df: DataFrame,
      operation: String,
      tag: Boolean,
      dedupIncoming: Boolean,
      deleteOp: Boolean,
      deleteMarker: Option[String] = None): String = {

    // stash the per-row delete flag under a reserved name so schema
    // alignment never mistakes it for a data column
    val dfNoMeta = dropIncomingMeta(df)
    val df0 = deleteMarker match {
      case Some(m) =>
        dfNoMeta.withColumn(ColDeleteFlag, coalesce(col(m).cast("boolean"), lit(false))).drop(m)
      case None => dfNoMeta
    }
    val aligned = alignSchema(df0, table.storedDataSchema)
    val dataSchema = org.apache.spark.sql.types.StructType(
      aligned.schema.filterNot(_.name == ColDeleteFlag))
    val dataCols = dataSchema.fieldNames.toSeq
    val instant = begin(if (table.isMor) GraftAction.DeltaCommit else GraftAction.Commit)
    try {
      val prepared0 = withMetaColumns(aligned, instant.ts, deleteOp)
      val prepared1 =
        if (deleteMarker.isDefined)
          prepared0.withColumn(MetaColumns.IsDeleted, col(ColDeleteFlag)).drop(ColDeleteFlag)
        else prepared0
      val prepared = prepared1

      // Tagged writes consume the batch several times — the stats pass,
      // the (optional) bloom probe and the tag join — so cache it for the
      // write's duration: the source pipeline runs once and every later
      // consumption is a block read. When dedupIncoming is on (the normal
      // upsert/delete shape) the cache additionally sits AFTER the
      // pre-combine shuffle: post-shuffle the batch is partitioned at
      // cluster parallelism, so downstream maps never serialize on the
      // source's input-split count (a single-file batch otherwise runs
      // every pass on one task), the cached set is the smaller deduped
      // one, and the stats count below is the EXACT distinct-key count.
      // With dedupIncoming=false (prepped writes, deduped by caller
      // contract) the cached frame is the raw prepared batch — still one
      // source pass, but pre-shuffle, and the stats count is a raw-row
      // upper bound for the bloom density gate. MEMORY_AND_DISK keeps
      // big batches spill-safe; unpersisted in the finally below.
      // Untagged inserts consume the batch once — caching would be pure
      // overhead there.
      val deduped0 =
        if (dedupIncoming) dedupByKey(prepared, dataSchema.fields.toSeq)
        else prepared
      val deduped =
        if (tag) deduped0.persist(StorageLevel.MEMORY_AND_DISK)
        else deduped0

      // ---- index tag: partition-scoped key join, range-pruned to the
      // files whose commit-recorded key range can intersect the batch
      // (ref: SparkHoodieSimpleIndex.java:55-134 for the join,
      // SparkHoodieBloomIndex.java:110-140 for the range prune).
      // Global mode joins on the key alone and routes partition moves
      // (ref: SparkHoodieGlobalSimpleIndex.java). ----
      // the bloom probe AND the bounds stats run over the CACHED deduped
      // frame: dedup keeps at least one row per (partition, key), so the
      // distinct key set and the per-partition [min,max] are identical to
      // the raw batch's — and the stats action doubles as the cache
      // materialization. The count becomes the exact distinct-key count
      // (previously a raw-row upper bound), which only sharpens the bloom
      // density gate.
      var invertedMatches: Option[Array[org.apache.spark.sql.catalyst.InternalRow]] = None
      var statsPartCounts: Map[String, Long] = Map.empty
      var statsTotal = 0L
      val tagged0 =
        if (tag && wc.globalIndex) tagGlobal(deduped, deduped, deleteOp)
        else if (tag) {
          val (bounds, nIncoming, partCounts) =
            phase("incoming-stats")(incomingStats(deduped))
          statsPartCounts = partCounts
          statsTotal = nIncoming
          val (df, m) = phase("tag-index")(tagByIndex(deduped, bounds, nIncoming))
          invertedMatches = m
          df
        } else deduped.withColumn(ColTargetFile, lit(null).cast("string"))
      // The workload profile is DRIVER ARITHMETIC when the inverted tag
      // join ran over a provably one-row-per-key batch: the matched
      // (key, partition) → fileGroup pairs are already on the driver and
      // incoming-stats carries the per-partition distinct-key counts, so
      // the former tag+profile action (a full pass over the tagged join)
      // contributes nothing the driver does not already hold.
      val driverProfile = invertedMatches.isDefined && dedupIncoming
      // deletes for keys that don't exist are no-ops
      val tagged1 =
        if (deleteOp) tagged0.filter(col(ColTargetFile).isNotNull) else tagged0
      // the persist existed for the profile action + write double
      // consumption; with the driver profile the ONLY consumer is the
      // write plan (whose branches recompute the cheap broadcast join
      // from the cached deduped batch), so skip it there
      val tagged =
        if (driverProfile) tagged1
        else tagged1.persist(StorageLevel.MEMORY_AND_DISK)

      try {
        // ---- workload profile (driver-side when the inverted tag join
        // already holds the matches; otherwise one action; ref:
        // BaseSparkCommitActionExecutor.java:148-180 countByKey) ----
        // matches rows are (ColKey, ColPart, ColTargetFile)
        val (insertCounts, updateGroups, updateCounts, incomingRecords) =
          invertedMatches match {
            case Some(m) if dedupIncoming =>
              val uc = m.groupBy(r => (r.getString(1), r.getString(2)))
                .view.mapValues(_.length.toLong).toMap
              val matchedPerPart = m.groupBy(_.getString(1))
                .view.mapValues(_.length.toLong).toMap
              // partitions whose every key matched contribute no insert
              // entry — same shape the profile action produced
              val ic =
                if (deleteOp) Map.empty[String, Long]
                else statsPartCounts.flatMap { case (p, n) =>
                  val ins = n - matchedPerPart.getOrElse(p, 0L)
                  if (ins > 0) Some(p -> ins) else None
                }
              val inc = if (deleteOp) m.length.toLong else statsTotal
              (ic, uc.keySet, uc, inc)
            case _ =>
              val profile = phase("tag+profile")(
                tagged.groupBy(ColPart, ColTargetFile).count().collect())
              val ic = profile
                .filter(_.isNullAt(1))
                .map(r => r.getString(0) -> r.getLong(2)).toMap
              val uc = profile.filterNot(_.isNullAt(1))
                .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
              (ic, uc.keySet, uc, profile.map(_.getLong(2)).sum)
          }

        val view = table.view
        val avgSize = view.avgRecordSize(wc.defaultRecordSizeBytes)
        val slices = view.latestSlices(None)
        val sliceByGroup = slices.map(s => (s.partition, s.fileId) -> s).toMap

        // ---- insert bucket assignment: fill small files first, then new
        // groups (ref: UpsertPartitioner.java:101-296) ----
        // COW packs small base files; MOR routes small inserts into DELTA
        // files of existing under-filled groups (ref:
        // SparkUpsertDeltaCommitPartitioner.java) — both avoid a sea of
        // tiny file groups from trickle inserts
        val packSmall = !deleteOp
        val ranges = assignInsertRanges(insertCounts, slices, avgSize, packSmall, instant.ts)
        val assigned = assignInserts(tagged, ranges)

        // groups whose base file must be rewritten (COW) = tagged updates
        // + small files receiving inserts
        val smallFileGroups = ranges.filter(_.existing).map(r => (r.partition, r.fileId)).toSet
        val rewriteGroups =
          if (table.isMor) Set.empty[(String, String)]
          else updateGroups ++ smallFileGroups

        def readOld(groups: Set[(String, String)]): Option[DataFrame] = {
          val paths = groups.toSeq.flatMap { g =>
            sliceByGroup.get(g).flatMap(_.base)
              .map(f => table.resolveDataPath(g._1, f))
          }
          if (paths.isEmpty) None
          else Some(
            table.readDataFiles(paths)
              .withColumn(ColKey, col(MetaColumns.RecordKey))
              .withColumn(ColPart, col(MetaColumns.PartitionPath))
              .withColumn(ColTargetFile, fileIdOfScan))
        }

        // ---- split the rewrite set: an UPDATE-ONLY group whose base file
        // cannot be split across scan tasks, with a total incoming slice
        // under the broadcast budget, merges WITHOUT shuffling its old
        // rows — broadcast-hash left join straight from the base-file
        // scan to the rewritten file; only incoming records cross the
        // network (the reference's MergeHandle streams the old file
        // inside the writing task the same way,
        // ref: HoodieMergeHandle.java:280-310). Groups receiving inserts
        // (their output mixes rows from two sources) and oversized files
        // fall back to the clustered-shuffle merge. ----
        val baseBytes: Map[(String, String), Long] = rewriteGroups.toSeq
          .flatMap(g => sliceByGroup.get(g).flatMap(_.base).map(f => g -> f.bytes))
          .toMap
        // The "cannot be split across scan tasks" bound is Spark's
        // EFFECTIVE maxSplitBytes, not maxPartitionBytes alone: with
        // high parallelism and few bytes, bytesPerCore shrinks the split
        // size and a base file under maxPartitionBytes still fans out
        // over several tasks — each task then stages its own part-file
        // and publishStaged's one-file-per-group invariant aborts the
        // commit. Replicate FilePartition.maxSplitBytes over the
        // candidate scan's own file set; removing an oversized candidate
        // only shrinks the split further, so iterate to a fixpoint.
        val maxScanSplit = spark.sessionState.conf.filesMaxPartitionBytes
        val openCost = spark.sessionState.conf.filesOpenCostInBytes
        val minPartNum = spark.sessionState.conf.filesMinPartitionNum
          .orElse(Option(spark.conf.get("spark.sql.leafNodeDefaultParallelism", null))
            .map(_.toInt))
          .getOrElse(spark.sparkContext.defaultParallelism).max(1)
        def effectiveSplit(cands: Set[(String, String)]): Long = {
          val totalBytes = cands.toSeq.map(g => baseBytes.getOrElse(g, 0L) + openCost).sum
          math.min(maxScanSplit, math.max(openCost, totalBytes / minPartNum))
        }
        // broadcastWinner needs ONE incoming row per key: only batches
        // deduped by pre-combine (or deduped-by-contract prepped /
        // all-tombstone delete batches, where duplicate fan-out is
        // filtered) may take the windowless broadcast path
        val singleRowPerKey =
          dedupIncoming || deleteOp || operation == "upsert_prepped"
        var bcastCandidates =
          if (table.isMor || operation == "insert" || !singleRowPerKey)
            Set.empty[(String, String)]
          else rewriteGroups.filter(g =>
            !smallFileGroups.contains(g) && baseBytes.contains(g))
        var splitStable = false
        while (!splitStable) {
          val split = effectiveSplit(bcastCandidates)
          val next = bcastCandidates.filter(g => baseBytes(g) <= split)
          splitStable = next == bcastCandidates
          bcastCandidates = next
        }
        val bcastRows = bcastCandidates.toSeq.map(updateCounts.getOrElse(_, 0L)).sum
        val bcastGroups =
          if (bcastCandidates.nonEmpty && bcastRows * avgSize <= wc.mergeBroadcastMaxBytes)
            bcastCandidates
          else Set.empty[(String, String)]
        val shuffleGroups = rewriteGroups -- bcastGroups

        val fullCols = (MetaColumns.All :+ MetaColumns.IsDeleted) ++ dataCols
        val bcastIds = bcastGroups.map(_._2)
        val incS =
          if (bcastIds.isEmpty) assigned
          else assigned.filter(!col(ColTargetFile).isInCollection(bcastIds))
        val incB =
          if (bcastIds.isEmpty) None
          else Some(assigned.filter(col(ColTargetFile).isInCollection(bcastIds)))

        // shuffle path: cluster by (partition, fileGroup); the latest-wins
        // window then needs no second shuffle (HashPartitioning(p,g)
        // satisfies ClusteredDistribution(p,g,key))
        val unioned = readOld(shuffleGroups) match {
          // allowMissingColumns: evolution-added columns absent from old
          // base files surface as typed nulls
          case Some(old) => incS.unionByName(old, allowMissingColumns = true)
          case None      => incS
        }
        val clustered = unioned.repartition(col(ColPart), col(ColTargetFile))
        // the latest-wins window is a no-op when the frame provably holds
        // one row per key already — no old rows unioned in (MOR routes
        // updates to deltas; COW with empty shuffle set) and the incoming
        // batch was pre-combined — so skip its sort entirely
        val singleVersion = dedupIncoming && shuffleGroups.isEmpty
        val merged =
          if (operation == "insert" || singleVersion) clustered
          else MergeKernel.collapseVersions(clustered,
            Seq(col(ColPart), col(ColTargetFile), col(ColKey)),
            mergeOrder(dataSchema.fields.toSeq), cfg.payloadClass, ColRank,
            precombine = cfg.precombineField)
        val surviving =
          if (table.isMor) merged // tombstones live in deltas until compaction
          else merged.filter(!col(MetaColumns.IsDeleted))

        // broadcast path: old rows stay on their scan tasks end-to-end
        val mergedB: Option[DataFrame] = for {
          old <- readOld(bcastGroups)
          inc <- incB
        } yield broadcastMerge(old, inc, fullCols)
          .filter(!col(MetaColumns.IsDeleted))

        // MOR: updates AND small-packed inserts become delta files of
        // their group, remaining inserts open new base groups; COW:
        // everything is a new base file version.
        val deltaGroups: Set[String] =
          if (table.isMor) updateGroups.map(_._2) ++ smallFileGroups.map(_._2)
          else Set.empty

        // the shuffle-path stage is PROVABLY empty when every rewrite
        // group went broadcast and the batch has no inserts (incS filters
        // to targets outside bcastIds; updates' targets are exactly
        // rewriteGroups) — skip the write action outright instead of
        // paying a full plan + empty job for zero rows (the common
        // update-only commit on a compacted COW table)
        val shuffleStageEmpty = bcastGroups.nonEmpty &&
          shuffleGroups.isEmpty && insertCounts.valuesIterator.forall(_ == 0L)
        if (!shuffleStageEmpty)
          phase("stage-merge")(
            stageGrouped(surviving, dataCols, instant.ts, deltaGroups, overwrite = true))
        mergedB.foreach(df => phase("stage-merge-broadcast")(
          stageGrouped(df, dataCols, instant.ts, deltaGroups,
            overwrite = shuffleStageEmpty)))
        val written = phase("publish+stats")(publishStaged(
          stagingDir(instant.ts), instant.ts, groupedByFile = true, deltaGroups,
          Some(graft.GraftTable.fileSchemaOf(dataSchema))))
        // A rewritten COW group where every row was tombstoned produces no
        // replacement file; record it as replaced so the old base version
        // is hidden from readers (the reference always emits a new file
        // slice per touched group — without this the delete silently
        // resurrects).
        val writtenGroups = written.map(w => (w.partition, w.fileId)).toSet
        val vanished = rewriteGroups -- writtenGroups
        val replacedMap = vanished.groupBy(_._1).map {
          case (p, gs) => p -> gs.map(_._2).toSeq
        }
        // incoming row count falls out of the workload profile for free;
        // recorded so `stats` can report write amplification per commit
        // (ref: hudi-cli StatsCommand write-amp = written / upserted)
        finishCommit(instant, operation, written, replaced = replacedMap, dataSchema,
          extraMeta = Map(GraftWriteClient.IncomingRecordsKey ->
            incomingRecords.toString))
      } finally {
        if (!driverProfile) tagged.unpersist()
        if (tag) deduped.unpersist()
      }
    } catch {
      case e: Throwable => abort(instant); throw e
    }
    postWrite()
    instant.ts
  }

  // =====================================================================
  // New-file writes (bulk_insert / insert_overwrite*)
  // =====================================================================

  private def writeNewFilesCommit(
      df: DataFrame,
      operation: String,
      action: String,
      replaced: Map[String, Seq[String]],
      replacePartitions: Seq[String] = Seq.empty,
      replaceFromWritten: Boolean = false): String = {
    val aligned = alignSchema(dropIncomingMeta(df), table.storedDataSchema)
    val dataSchema = aligned.schema
    val instant = begin(action)
    try {
      val prepared = withMetaColumns(aligned, instant.ts, deleteOp = false)
      val avgSize = table.view.avgRecordSize(wc.defaultRecordSizeBytes)
      val recordsPerFile = math.max(1L, wc.targetFileSizeBytes / avgSize)
      // SIZE-DERIVED sort parallelism (unless the caller pinned one): a
      // constant task count is wrong at both ends — a tiny batch ranged
      // into defaultParallelism partitions writes that many near-empty
      // files (and pays the RangePartitioner SAMPLING pass that a single
      // partition skips outright), while a huge batch limited to the core
      // count sorts multi-GB per task and spills. Catalyst's size
      // estimate over target-file-size approximates the OUTPUT FILE
      // COUNT, which is the right task granularity for a layout write;
      // maxRecordsPerFile still enforces per-file sizing exactly, so the
      // estimate only steers parallelism, never file contents. Unknown
      // estimates (non-file sources report defaultSizeInBytes) fall back
      // to defaultParallelism; the cap bounds the shuffle block count of
      // one bulk load (guide §2.2) — chunk mega-loads above it.
      val n = if (wc.parallelism > 0) wc.parallelism else {
        val est = prepared.queryExecution.optimizedPlan.stats.sizeInBytes
        val unknown = est <= 0 || est >= BigInt(Long.MaxValue) / 4
        if (unknown) spark.sparkContext.defaultParallelism
        else {
          val cap = BigInt(math.max(spark.sparkContext.defaultParallelism, 4096))
          val bySize = (est + wc.targetFileSizeBytes - 1) / wc.targetFileSizeBytes
          bySize.min(cap).max(1).toInt
        }
      }

      // The global sort's RangePartitioner samples its input with an
      // extra pass before the shuffle pass. Deliberately NOT cached:
      // measured at sf0.1 (r18), persisting the prepared batch to make
      // the sampler's pass double as a materialization was a net LOSS
      // (~1 s/load) — the deserialized block write costs more than
      // re-running the columnar scan, and at cluster scale the gap only
      // widens. The two-pass shape is the price of a total-order layout.
      // (ref: bulk-insert sort modes, BulkInsertSortMode.java:24-29 and
      // GlobalSortPartitionerWithRows / PartitionSortPartitionerWithRows)
      val sorted = wc.bulkInsertSortMode match {
        case "global" =>
          prepared.repartitionByRange(n, col(ColPart), col(ColKey))
            .sortWithinPartitions(col(ColPart), col(ColKey))
        case "partition" =>
          prepared.repartition(n, col(ColPart)).sortWithinPartitions(col(ColKey))
        case _ => prepared
      }
      val written = phase("bulk-write")(
        writeUngrouped(sorted, dataSchema.fieldNames.toSeq, instant.ts, recordsPerFile))
      val (replacedEff, replacePartsEff) =
        if (replaceFromWritten) {
          val parts = written.map(_.partition).toSet
          (table.view.groupsInPartitions(parts), parts.toSeq.sorted)
        } else (replaced, replacePartitions)
      finishCommit(instant, operation, written, replacedEff, dataSchema,
        replacePartitions = replacePartsEff)
    } catch {
      case e: Throwable => abort(instant); throw e
    }
    postWrite()
    instant.ts
  }

  // =====================================================================
  // Shared plumbing
  // =====================================================================

  private def begin(action: String): GraftInstant = {
    // OCC baseline: the SET of data commits visible before this write
    // starts — anything completed beyond it is checked at publish. A
    // max-ts watermark is NOT enough: instant ts is the BEGIN time, so a
    // slow writer's commit can complete out of ts order and slot BELOW a
    // faster writer's already-completed instant — `ts > base` never sees
    // it and its file-group rewrite is silently shadowed (lost update;
    // found by the concurrent two-writer model walk, seed 2027, where a
    // no-op delete outran a racing upsert that began 4 ms earlier).
    occBaseSeen = table.timeline.completedData.map(_.ts).toSet
    val ts = InstantTimeGenerator.next()
    val req = table.timeline.createRequested(ts, action)
    table.timeline.transitionToInflight(req)
  }

  /** Completed data instants visible when the current write began. */
  @volatile private var occBaseSeen: Set[String] = Set.empty

  /** First concurrently-completed instant that conflicts with this
    * write, if any. The base rule is the reference's: two writes
    * conflict iff they wrote or replaced the same file group
    * (ref: SimpleConcurrentFileWritesConflictResolutionStrategy.java:44-115,
    * TransactionManager.java:49-69; our atomic primitive is the
    * create-if-absent completed-instant file). `baseSeen` is the begin
    * snapshot: a candidate is any completed instant OUTSIDE it,
    * regardless of how its ts orders against ours (completion order and
    * ts order genuinely diverge under concurrency).
    *
    * Partition-REPLACING operations (delete_partition /
    * insert_overwrite[_table]) escalate to PARTITION-level conflicts in
    * both directions: group intersection cannot see a NEW file group
    * born concurrently inside the replaced partition (the racer's
    * insert intersects no replaced group, in either commit order), so
    * without escalation an acknowledged partition delete and an
    * acknowledged insert into it could both survive with the insert's
    * rows outliving the "later" delete — not serializable. `myReplaceParts`
    * is this write's declared target-partition set (empty for normal
    * writes); the other side's declaration rides in the commit metadata
    * (`replacePartitions`, with insert_overwrite_table conflicting with
    * every concurrent data commit).
    */
  private[graft] def conflictingInstant(
      baseSeen: Set[String],
      myTs: String,
      touched: Set[(String, String)],
      myReplaceParts: Set[String] = Set.empty,
      myReplaceAll: Boolean = false,
      myLayeringGroups: Set[(String, String)] = Set.empty): Option[String] =
    table.timeline.completedData
      .filter(i => !baseSeen.contains(i.ts) && i.ts != myTs)
      .find { i =>
        val meta = table.timeline.metadataOf(i)
        // .toSeq before the flatMap: flatMapping a Map with a function
        // that returns key/value tuples REBUILDS A MAP, silently keeping
        // only the LAST fileId per partition — which made this check
        // ignore every replaced group but one and let a racing writer
        // commit into a clustered-away file group (lost update; found by
        // the concurrent two-writer model walk, seed 239)
        val theirReplaced =
          meta.replacedFileIds.toSeq.flatMap { case (p, ids) => ids.map((p, _)) }.toSet
        val theirs = meta.files.map(f => (f.partition, f.fileId)).toSet ++ theirReplaced
        val theirParts = theirs.map(_._1)
        val myParts = touched.map(_._1) ++ myReplaceParts
        // A compaction that completed BELOW our instant does not conflict
        // with our pure delta appends: our delta (ts > compaction ts)
        // layers above the freshly compacted base and stays fully visible
        // — this is what makes async compaction race-free against live
        // MOR ingestion (ref: SimpleConcurrentFileWritesConflictResolution
        // Strategy.java resolveConflict — a COMPACTION_ACTION racer below
        // an ingestion commit is not a conflict). The exemption is
        // LAYERING-ONLY: groups where we wrote a base file (MOR small-file
        // bin-pack, COW rewrites) would shadow the compacted base and its
        // folded deltas, and groups the compaction VANISHED (all-tombstone
        // replacedFileIds) would swallow our delta — both still conflict.
        // The opposite ts order (compaction ts above ours) would drop our
        // delta from every slice (deltas live only above their base) and
        // always conflicts.
        val myBlocking =
          if (meta.operation == "compact" && i.ts < myTs)
            touched -- (myLayeringGroups -- theirReplaced)
          else touched
        (theirs & myBlocking).nonEmpty ||
          meta.replacePartitions.exists(myParts.contains) ||
          (meta.operation == "insert_overwrite_table" && myParts.nonEmpty) ||
          (myReplaceParts & theirParts).nonEmpty ||
          (myReplaceAll && theirParts.nonEmpty)
      }
      .map(_.ts)

  private def abort(instant: GraftInstant): Unit = {
    table.timeline.deleteInstant(instant)
    table.storage.delete(stagingDir(instant.ts), recursive = true)
  }

  private def commit(instant: GraftInstant, meta: GraftCommitMetadata): Unit = {
    table.timeline.transitionToCompleted(
      instant.copy(state = GraftState.Inflight), meta)
    emitCommitMetrics(meta)
    fireCommitCallback(meta)
  }

  /** The commit is durable when this runs — callback failures must not
    * unwind it (ref: HoodieWriteCommitCallback fire-after-commit
    * contract). Locked paths (finishCommit) call it AFTER releasing the
    * commit lock: a slow hook (e.g. the RO-manifest refresh) must never
    * stretch the metadata-only critical section the lock TTL is sized
    * for.
    */
  private def fireCommitCallback(meta: GraftCommitMetadata): Unit =
    wc.commitCallback.foreach { cb =>
      try cb(table.basePath, meta)
      catch { case e: Exception =>
        System.err.println(s"[graft] commit callback failed for ${meta.instant}: $e")
      }
    }

  private def finishCommit(
      instant: GraftInstant,
      operation: String,
      written: Seq[WriteFileInfo],
      replaced: Map[String, Seq[String]],
      dataSchema: org.apache.spark.sql.types.StructType,
      extraMeta: Map[String, String] = Map.empty,
      replacePartitions: Seq[String] = Seq.empty): Unit = {
    // the [conflict check + publish] critical section runs under the
    // configured lock provider (ref: TransactionManager.java:49-69 —
    // beginTransaction / resolve conflicts / commit / endTransaction).
    // The default NoOp provider keeps the create-if-absent protocol as
    // the only cross-writer coordination; "file" serializes the section
    // across every writer sharing the table's filesystem. Data was
    // already staged BEFORE this point — only metadata work happens
    // under the lock.
    val lock = LockProvider.forTable(wc.lockProvider, table.storage, wc.lockTtlMs, wc.lockJdbcUrl)
    if (!lock.tryLock(wc.lockTimeoutMs)) {
      // fail LOUDLY without publishing: a write that cannot enter the
      // critical section must never double-commit. Staged files were
      // already moved to their data paths — remove them; the caller's
      // abort cleans the pending instant + staging dir
      written.foreach(f =>
        table.storage.delete(table.storage.dataFilePath(f.partition, f.fileName)))
      throw new LockAcquireException(
        s"write ${instant.ts} could not acquire the '${wc.lockProvider}' " +
          s"commit lock within ${wc.lockTimeoutMs} ms; nothing was published — retry")
    }
    val publishedMeta = try {
      if (wc.occEnabled) {
        // .toSeq first — a Map-to-tuples flatMap would collapse to one id
        // per partition (see conflictingInstant)
        val replacedSet =
          replaced.toSeq.flatMap { case (p, ids) => ids.map((p, _)) }.toSet
        val touched = written.map(f => (f.partition, f.fileId)).toSet ++ replacedSet
        // groups we touched with ONLY delta files (and did not replace)
        // layer safely above a concurrently compacted base
        val layering = written.groupBy(f => (f.partition, f.fileId))
          .collect { case (g, fs) if fs.forall(_.isDelta) => g }
          .toSet -- replacedSet
        conflictingInstant(occBaseSeen, instant.ts, touched,
            myReplaceParts = replacePartitions.toSet,
            myReplaceAll = operation == "insert_overwrite_table",
            myLayeringGroups = layering).foreach { other =>
          // the loser cleans its already-published files and aborts; they
          // were never referenced by any commit, so readers never saw them
          written.foreach(f =>
            table.storage.delete(table.storage.dataFilePath(f.partition, f.fileName)))
          throw new ConcurrentWriteConflictException(
            s"write ${instant.ts} conflicts with concurrently committed $other " +
              "on overlapping file groups; retry the write")
        }
      }
      val totalRecords = written.map(_.records).sum
      val totalBytes = written.map(_.bytes).sum
      val avg = if (totalRecords > 0) math.max(1L, totalBytes / totalRecords) else 0L
      val meta = GraftCommitMetadata(
        instant = instant.ts,
        action = instant.action,
        operation = operation,
        files = written,
        replacedFileIds = replaced,
        replacePartitions = replacePartitions,
        totalRecords = totalRecords,
        avgRecordSize = avg,
        schemaJson = dataSchema.json,
        extra = wc.commitExtra ++ extraMeta)
      table.timeline.transitionToCompleted(
        instant.copy(state = GraftState.Inflight), meta)
      meta
    } finally lock.unlock()
    emitCommitMetrics(publishedMeta)
    fireCommitCallback(publishedMeta)
    table.storage.delete(stagingDir(instant.ts), recursive = true)
  }

  /** Inline table services after a successful commit. */
  private def postWrite(): Unit = {
    if (table.isMor && wc.inlineCompactDeltaCommits > 0) {
      val tl = table.timeline
      // the counter resets at the last COMPACTION specifically: any
      // Commit-action instant (a bulk_insert on a MOR table also
      // publishes one) would otherwise reset it without folding any
      // deltas, deferring compaction indefinitely under interleaved
      // bulk loads (metadataOf is memoized — no extra reads)
      val lastCompaction = tl.completedData
        .filter(i => i.action == GraftAction.Commit &&
          tl.metadataOf(i).operation == "compact")
        .lastOption.map(_.ts).getOrElse("")
      val deltasSince = tl.completedData
        .count(i => i.action == GraftAction.DeltaCommit && i.ts > lastCompaction)
      if (deltasSince >= wc.inlineCompactDeltaCommits) {
        new graft.services.TableServices(table, wc).compact()
      }
    }
    if (wc.inlineClusterCommits > 0) {
      val tl = table.timeline
      val lastReplace = tl.completedData
        .filter(_.action == GraftAction.ReplaceCommit)
        .lastOption.map(_.ts).getOrElse("")
      val commitsSince = tl.completedData.count(_.ts > lastReplace)
      if (commitsSince >= wc.inlineClusterCommits) {
        new graft.services.TableServices(table, wc).cluster()
      }
    }
    if (wc.inlineClean) {
      new graft.services.TableServices(table, wc).clean(wc.cleanRetainCommits)
    }
  }

  /** Append new (nullable) columns to the table schema without rewriting
    * any data: a zero-file commit carrying the evolved schema. Old files
    * surface the new columns as typed nulls on read; subsequent writes
    * align to the evolved schema (ref: AlterHoodieTableAddColumnsCommand
    * — the SQL ALTER TABLE surface over write-side evolution).
    */
  def evolveSchema(newFields: Seq[org.apache.spark.sql.types.StructField]): String = {
    val current = table.storedDataSchema.getOrElse(
      sys.error("cannot ALTER a table with no commits — write data first"))
    // a new column may collide with a physical name (files still carry
    // it) or a logical name (users still see it) — both are taken
    val taken = current.fieldNames.toSet ++
      current.fieldNames.map(table.logicalNameOf)
    val dup = newFields.map(_.name).filter(taken.contains)
    require(dup.isEmpty, s"column(s) already exist: ${dup.mkString(", ")}")
    val evolved = org.apache.spark.sql.types.StructType(
      current.fields ++ newFields.map(_.copy(nullable = true)))
    val instant = begin(
      if (table.isMor) GraftAction.DeltaCommit else GraftAction.Commit)
    commit(instant, GraftCommitMetadata(
      instant = instant.ts, action = instant.action,
      operation = "alter_add_columns", schemaJson = evolved.json))
    instant.ts
  }

  /** Rename a column without rewriting any file: files keep their
    * PHYSICAL column name forever; the table config's rename map turns
    * it into the new logical name at the read boundary and back at the
    * write boundary (simplified Delta column-mapping "name" mode; the
    * reference rewrites the Avro schema instead —
    * ref: AlterHoodieTableChangeColumnCommand.scala). Key, partition and
    * precombine columns are rejected: their values are baked into record
    * keys and partition paths. A zero-file commit records the rename on
    * the timeline.
    */
  def renameColumn(oldName: String, newName: String): String = {
    val stored = table.storedDataSchema.getOrElse(
      sys.error("cannot ALTER a table with no commits — write data first"))
    val tcfg = table.config
    val logicalNames = stored.fieldNames.map(table.logicalNameOf).toSeq
    require(logicalNames.exists(_.equalsIgnoreCase(oldName)),
      s"no such column: $oldName")
    require(!logicalNames.exists(_.equalsIgnoreCase(newName)) &&
      !stored.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column already exists: $newName")
    val protectedCols = (tcfg.recordKeyFields ++ tcfg.partitionSourceFields ++
      tcfg.precombineField.toSeq).map(_.toLowerCase).toSet
    require(!protectedCols.contains(oldName.toLowerCase),
      s"cannot rename key/partition/precombine column '$oldName'")
    val phys = stored.fieldNames
      .find(f => table.logicalNameOf(f).equalsIgnoreCase(oldName)).get
    val renames =
      if (phys == newName) tcfg.columnRenames - phys
      else tcfg.columnRenames + (phys -> newName)
    // Timeline first, config second: the timeline is the source of truth
    // for DDL ordering, so a failure between the two steps leaves a
    // commit without an applied rename (harmless; re-run the ALTER) —
    // never a live rename that no commit records.
    val instant = begin(
      if (table.isMor) GraftAction.DeltaCommit else GraftAction.Commit)
    commit(instant, GraftCommitMetadata(
      instant = instant.ts, action = instant.action,
      operation = "alter_rename_column", schemaJson = stored.json,
      extra = Map("renamed_from" -> oldName, "renamed_to" -> newName)))
    table.updateConfig(tcfg.copy(columnRenames = renames))
    instant.ts
  }

  /** Widen a column's type without rewriting any file: a zero-file
    * commit carries the widened schema, and every read already pins
    * `spark.read.schema(stored)`, which Spark's parquet readers resolve
    * against narrower footers (int→long, float→double, int→decimal …).
    * Only lossless widenings (`Cast.canUpCast`) are accepted; key and
    * partition columns are rejected because their STRING rendering is
    * baked into record keys and partition paths (int 5 widened to
    * decimal renders "5.0" — a silent key change).
    * (ref: AlterHoodieTableChangeColumnCommand.scala's Avro
    * compatibility check, re-expressed over Catalyst Cast rules)
    */
  def changeColumnType(name: String, newType: org.apache.spark.sql.types.DataType): String = {
    val stored = table.storedDataSchema.getOrElse(
      sys.error("cannot ALTER a table with no commits — write data first"))
    val tcfg = table.config
    val phys = stored.fieldNames
      .find(f => table.logicalNameOf(f).equalsIgnoreCase(name))
      .getOrElse(sys.error(s"no such column: $name"))
    val protectedCols =
      (tcfg.recordKeyFields ++ tcfg.partitionSourceFields).map(_.toLowerCase).toSet
    require(!protectedCols.contains(name.toLowerCase),
      s"cannot change type of key/partition column '$name'")
    val cur = stored(phys).dataType
    require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(cur, newType),
      s"cannot change column '$name' from $cur to $newType: only lossless " +
        "widening conversions are supported")
    val evolved = org.apache.spark.sql.types.StructType(stored.fields.map(f =>
      if (f.name == phys) f.copy(dataType = newType) else f))
    val instant = begin(
      if (table.isMor) GraftAction.DeltaCommit else GraftAction.Commit)
    commit(instant, GraftCommitMetadata(
      instant = instant.ts, action = instant.action,
      operation = "alter_change_column", schemaJson = evolved.json))
    instant.ts
  }

  /** Strip graft meta columns from an incoming frame: the canonical ETL
    * "read incremental from A (meta fields included), write into B"
    * would otherwise carry `_graft_*` names into schema alignment, where
    * they collide with the writer's own injected meta columns and fail
    * the staged write with duplicate columns. The writer re-derives
    * every meta value itself, so incoming ones are never meaningful
    * (the reference writer equivalently drops hoodie meta fields).
    */
  private def dropIncomingMeta(df: DataFrame): DataFrame =
    df.drop(MetaColumns.AllWithDeleted: _*)

  /** Project `df` onto the stored schema order with stored TYPES, null-
    * filling missing columns (schema evolution: new columns appended;
    * delete batches may carry keys only). Typed casts are what keep MOR
    * delta/tombstone files from acquiring untyped void columns — the
    * reference equivalently carries the writer schema per commit and
    * validates compatibility (hoodie.avro.schema.validate,
    * HoodieWriteConfig.java:130-133).
    */
  private def alignSchema(df0: DataFrame, stored: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    stored match {
      case None => df0
      case Some(schema) =>
        // incoming frames use logical column names; files store physical
        val df = table.delogicalize(df0)
        // CASE-INSENSITIVE matching, like Spark's own resolution: an
        // upstream SELECT that changed a column's casing must land in
        // the stored column, not null-fill it and fork a same-name
        // sibling (which the parquet write then rejects as a duplicate)
        df.schema.fields.groupBy(_.name.toLowerCase).foreach { case (_, fs) =>
          require(fs.length == 1,
            s"ambiguous incoming columns differing only in case: " +
              fs.map(_.name).mkString(", "))
        }
        val existing = df.schema.fields
          .map(f => f.name.toLowerCase -> f).toMap
        val newCols = df.columns.toSeq.filterNot(c =>
          schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        // reject incompatible type changes instead of silently null-ing
        // values through a lossy cast (the reference validates writer
        // schema compatibility the same way —
        // hoodie.avro.schema.validate, HoodieWriteConfig.java:130-133);
        // only identity and lossless widening casts are accepted
        schema.fields.foreach { f =>
          existing.get(f.name.toLowerCase).foreach { in =>
            require(org.apache.spark.sql.types.DataType
              .equalsIgnoreCaseAndNullability(in.dataType, f.dataType) ||
              org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(in.dataType, f.dataType),
              s"incompatible type for column '${f.name}': incoming ${in.dataType} " +
                s"cannot be safely written into stored ${f.dataType}")
          }
        }
        df.select(
          (schema.fields.toSeq.map { f =>
            existing.get(f.name.toLowerCase) match {
              case Some(in) => col(in.name).cast(f.dataType).as(f.name)
              case None     => lit(null).cast(f.dataType).as(f.name)
            }
          } ++ newCols.map(col)): _*)
    }

  /** Inject the 5 meta columns + tombstone flag.
    * (ref: HoodieRecord.java:37-45 meta fields; _hoodie_is_deleted
    * convention from HoodieTestDataGenerator.java:96)
    */
  private def withMetaColumns(df: DataFrame, instantTs: String, deleteOp: Boolean): DataFrame = {
    // ONE select, not 8 chained withColumns: every withColumn re-analyzes
    // the whole plan, and this projection is built for every keyed write
    // — same output columns in the same order (key/partition expressions
    // inlined twice collapse in optimization exactly as the withColumn
    // chain did)
    val k = keyExpr
    val p = partExpr
    df.select(df.columns.map(col).toSeq ++ Seq(
      k.as(ColKey),
      p.as(ColPart),
      lit(instantTs).as(MetaColumns.CommitTime),
      // lpad, not format_string("%019d", …): identical output for the
      // non-negative id, without a java.util.Formatter per row
      concat(lit(instantTs + "_"),
        lpad(monotonically_increasing_id().cast("string"), 19, "0"))
        .as(MetaColumns.CommitSeqno),
      k.as(MetaColumns.RecordKey),
      p.as(MetaColumns.PartitionPath),
      lit("").as(MetaColumns.FileName),
      lit(deleteOp).as(MetaColumns.IsDeleted)): _*)
  }

  /** Pre-combine duplicate incoming keys, keeping the max ordering value.
    * Under a global index keys are table-unique, so the dedup window drops
    * the partition from its key (two rows for one key in different
    * partitions are duplicates, not distinct records).
    * (ref: SparkWriteHelper.java:50-66 reduceByKey(preCombine))
    */
  private def dedupByKey(
      df: DataFrame,
      dataFields: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    // Hash aggregate, not a window: partial (map-side) max_by combines
    // duplicates BEFORE the shuffle — the reference's reduceByKey shape —
    // and no sort runs at all. The ordering struct mirrors
    // `precombine desc_nulls_last, tiebreak desc`: a leading isNotNull
    // flag makes any non-null precombine beat null (struct comparison is
    // field-lexicographic, false < true), the tiebreak column is never
    // null, so max_by's null-loses corner never decides.
    val partKeys =
      if (wc.globalIndex) Seq(ColKey) else Seq(ColPart, ColKey)
    val ordCol = struct(
      (cfg.precombineField.toSeq.flatMap(f =>
        Seq(col(f).isNotNull, col(f))) :+ tiebreakExpr(dataFields)): _*)
    val others = df.columns.filterNot(partKeys.contains).toSeq
    df.groupBy(partKeys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), ordCol).as("_g_row"))
      .select(partKeys.map(col) ++ others.map(c => col(s"_g_row.$c").as(c)): _*)
  }

  /** Global index tagging: join incoming rows against the key index on
    * the record key ALONE; the index supplies the partition the key
    * currently lives in. A matched key whose incoming partition differs
    * becomes a MOVE — a tombstone targeted at the old file group plus an
    * untargeted insert in the new partition — so exactly one copy of the
    * record survives table-wide
    * (ref: SparkHoodieGlobalSimpleIndex.java +
    * hoodie.simple.index.update.partition.path=true semantics).
    * Global deletes need no partition columns at all: the tombstone is
    * routed to wherever the key lives
    * (ref: GlobalAvroDeleteKeyGenerator.java).
    */
  private def tagGlobal(
      deduped: DataFrame, probe: DataFrame, deleteOp: Boolean): DataFrame = {
    // bounds/count from the CACHED deduped frame, like the non-global
    // branch: dedup never changes the key min/max, and the stats action
    // doubles as the cache materialization (post-shuffle partitioning,
    // exact distinct-key count for the bloom density gate)
    val (gBounds, nIncoming) = globalBounds(probe)
    val idx = keyIndex(Some(probe), Some(gBounds), global = true,
      nIncoming = nIncoming)
      .withColumnRenamed(ColPart, ColIdxPart)
    val j = deduped.join(idx, Seq(ColKey), "left")
    val samePart = col(ColIdxPart).isNull || col(ColIdxPart) === col(ColPart)
    if (deleteOp) {
      // every current location of the key gets a tombstone (the join
      // fans a multi-located key out to one delete per location)
      j.withColumn(ColPart, coalesce(col(ColIdxPart), col(ColPart)))
        .withColumn(MetaColumns.PartitionPath, col(ColPart))
        .drop(ColIdxPart)
    } else {
      // A key can hold SEVERAL current locations: insert_overwrite
      // bypasses the index, so it may leave same-key siblings in other
      // partitions (ref: SparkInsertOverwriteCommitActionExecutor never
      // tags). The join fans such a key out once per location — exactly
      // ONE location may carry the live row (preferring the incoming
      // row's own partition so no-move stays no-move), every other
      // location gets only a tombstone; emitting the live row per
      // location would materialize duplicates across file groups.
      // The join's HashPartitioning(key) satisfies the window's
      // clustering, so ranking adds no shuffle.
      val locRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col(ColKey))
        .orderBy((col(ColIdxPart) === col(ColPart)).desc,
          col(ColIdxPart).asc, col(ColTargetFile).asc)
      // dense_rank, not row_number: the batch is deduped per key by
      // contract, but if a caller ever violates that, ranking LOCATIONS
      // keeps every copy of the key's live row together at the primary
      // location (merge resolves them by ordering) instead of turning
      // one copy into a tombstone there
      val ranked = j.withColumn(ColRank, dense_rank().over(locRank))
      val primary = ranked.filter(col(ColRank) === 1).drop(ColRank)
      val extras = ranked.filter(col(ColRank) > 1).drop(ColRank)
      val stay = primary.filter(samePart).drop(ColIdxPart)
      val moved = primary.filter(!samePart)
      def tombAtIdx(df: DataFrame) = df
        .withColumn(ColPart, col(ColIdxPart))
        .withColumn(MetaColumns.PartitionPath, col(ColPart))
        .withColumn(MetaColumns.IsDeleted, lit(true))
        .drop(ColIdxPart)
      val ins = moved
        .withColumn(ColTargetFile, lit(null).cast("string"))
        .drop(ColIdxPart)
      stay.unionByName(tombAtIdx(moved)).unionByName(ins)
        .unionByName(tombAtIdx(extras))
    }
  }

  /** Single table-wide key range + row count of the batch (global-index
    * prune and bloom density gate).
    */
  private def globalBounds(df: DataFrame): (Map[String, (String, String)], Long) = {
    val r = df.agg(min(ColKey), max(ColKey), count(lit(1))).head
    if (r.isNullAt(0)) (Map.empty, 0L)
    else (Map(GlobalBoundKey -> (r.getString(0), r.getString(1))), r.getLong(2))
  }

  /** Per-partition [min, max] record-key bounds of the incoming batch
    * plus its total and per-partition row counts — one small aggregate
    * (replaces the former touched-partitions distinct), feeding the index
    * range prune, the bloom-probe density gate and the driver-side
    * workload profile.
    */
  private def incomingStats(
      df: DataFrame): (Map[String, (String, String)], Long, Map[String, Long]) = {
    val rows = df.groupBy(ColPart)
      .agg(min(ColKey).as("_mn"), max(ColKey).as("_mx"), count(lit(1)).as("_c"))
      .collect()
    (rows.map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap,
      rows.map(_.getLong(3)).sum,
      rows.map(r => r.getString(0) -> r.getLong(3)).toMap)
  }

  /** Latest-slice files that may contain keys of the incoming batch: a
    * file is skipped when its commit-recorded [minKey, maxKey] cannot
    * intersect the batch's per-partition key range — so at scale the tag
    * scan reads only the files an incoming key could actually live in,
    * not every file of every touched partition (ref:
    * SparkHoodieBloomIndex.java:110-140 range pruning +
    * KeyRangeLookupTree.java). Files from commits predating key-range
    * stats (empty min/max) are always candidates.
    */
  private[graft] def indexCandidatePaths(
      bounds: Map[String, (String, String)],
      global: Boolean = false): Seq[String] =
    indexCandidateFiles(bounds, global).map(_.path)

  private[graft] def indexCandidateFiles(
      bounds: Map[String, (String, String)],
      global: Boolean): Seq[CandidateFile] =
    table.view.latestSlices(None)
      .filter(s => global || bounds.contains(s.partition))
      .flatMap { s =>
        val boundOpt =
          if (global) bounds.get(GlobalBoundKey) else bounds.get(s.partition)
        boundOpt match {
          case None => Seq.empty
          case Some((inMin, inMax)) =>
            (s.base.toSeq ++ s.deltas)
              .filter(f => f.minKey.isEmpty || f.maxKey.isEmpty ||
                (utf8Lte(f.minKey, inMax) && utf8Lte(inMin, f.maxKey)))
              .map(f => CandidateFile(s.partition, f.fileName,
                table.resolveDataPath(s.partition, f),
                f.records))
        }
      }

  /** Second prune stage after the range prune: drop candidate files whose
    * key bloom proves they contain NO incoming key. This is the prune
    * that survives uniformly-distributed keys, where every file's
    * [min,max] spans the whole key space and range pruning keeps
    * everything (ref: SparkHoodieBloomIndex.java:110-140 + the
    * bucketized bloom-check step :230-283). Probing is a distributed
    * narrow job over the incoming (partition, key) projection against
    * broadcast blooms; files from commits without sidecars are always
    * scanned, so the prune is sound by construction.
    */
  private[graft] def bloomPruneCandidates(
      probe: DataFrame,
      cands: Seq[CandidateFile],
      global: Boolean,
      incomingRows: Long = 0L): Seq[CandidateFile] = {
    if (!wc.bloomIndexEnabled || cands.isEmpty) return cands
    // density gate: n uniformly-spread keys over F candidate files hit
    // ~F·(1-e^(-n/F)) of them, so once n is a small multiple of F nearly
    // every file is touched and probing is pure overhead. Blooms pay in
    // the trickle-update regime (n ≲ F), which is exactly where rewriting
    // amplification hurts most at scale.
    if (incomingRows > 2L * cands.size) return cands
    val bloomMap = loadBlooms(spark, table.storage, cands.map(_.fileName))
    if (bloomMap.isEmpty) return cands
    // second valve on the exact candidate subset (loadBlooms already
    // gates on total sidecar size before reading anything)
    if (bloomMap.valuesIterator.map(_.length.toLong).sum >
      GraftWriteClient.MaxBloomLoadBytes) return cands
    val (withB, withoutB) = cands.partition(c => bloomMap.contains(c.fileName))
    val byPart: Map[String, Seq[(String, Array[Byte])]] = withB
      .groupBy(c => if (global) "" else c.partition)
      .view.mapValues(_.map(c => c.fileName -> bloomMap(c.fileName))).toMap
    val bc = spark.sparkContext.broadcast(byPart)
    import spark.implicits._
    val partKey = if (global) lit("") else col(ColPart)
    val hits = probe.select(partKey.as("p"), col(ColKey).as("k"))
      .as[(String, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.Map[
          String, org.apache.spark.util.sketch.BloomFilter]()
        def bloomOf(name: String, bytes: Array[Byte]) =
          cache.getOrElseUpdate(name,
            org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(bytes)))
        it.flatMap { case (p, k) =>
          bc.value.getOrElse(p, Seq.empty).iterator
            .filter { case (n, b) => bloomOf(n, b).mightContainString(k) }
            .map(_._1)
        }
      }.distinct().collect().toSet
    withoutB ++ withB.filter(c => hits(c.fileName))
  }

  /** Key -> file-group index: project 2 meta columns + the physical file
    * from the range-pruned candidate files. A pure columnar scan of 2
    * columns (parquet column pruning does the heavy lifting).
    * (ref: SparkHoodieSimpleIndex.java:109-118)
    */
  private def keyIndex(
      probe: Option[DataFrame],
      bounds: Option[Map[String, (String, String)]],
      global: Boolean = false,
      nIncoming: Long = 0L,
      dedupKeys: Boolean = true): DataFrame = {
    val paths = bounds match {
      case Some(b) =>
        val cands = indexCandidateFiles(b, global)
        probe.map(bloomPruneCandidates(_, cands, global, nIncoming))
          .getOrElse(cands).map(_.path)
      case None =>
        table.view.latestSlices(None).flatMap { s =>
          (s.base.toSeq ++ s.deltas).map(f => table.resolveDataPath(s.partition, f))
        }
    }
    if (paths.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(
          StructField(ColKey, StringType),
          StructField(ColPart, StringType),
          StructField(ColTargetFile, StringType))))
    } else {
      val scan = table.readDataFiles(paths)
        .select(
          col(MetaColumns.RecordKey).as(ColKey),
          col(MetaColumns.PartitionPath).as(ColPart),
          fileIdOfScan.as(ColTargetFile))
      // dedupKeys=false hands the RAW scan to callers that dedupe later
      // (the inverted tag join dedupes its collected matches driver-side)
      // — skipping the exchange a table-sized dropDuplicates would cost
      if (dedupKeys) scan.dropDuplicates(ColKey, ColPart) else scan
    }
  }

  /** Tag join: attach each incoming row's current file group from the key
    * index. The plain shuffle join exchanges BOTH sides by (key,
    * partition) — at 100 TB the index side is a table-sized exchange per
    * write. When the batch's distinct-key count (exact, post-dedup) fits
    * the broadcast budget, invert it: the index scan STREAMS through a
    * broadcast semi-join against the incoming keys, the surviving matches
    * (≤ batch keys × per-key file residency, i.e. batch-sized) are
    * collected, deduped driver-side — same arbitrary pick-one-per-key
    * contract as the shuffle path's dropDuplicates — and come back as a
    * LocalRelation broadcast into the left join. Neither side ever
    * shuffles, and the cached batch keeps its dedup partitioning for
    * everything that follows.
    *
    * Returns the tagged frame plus, on the inverted path, the deduped
    * matches (rows of (key, partition, fileGroup)) — the caller derives
    * the whole workload profile from them without another action.
    */
  private def tagByIndex(
      deduped: DataFrame,
      bounds: Map[String, (String, String)],
      nIncoming: Long): (DataFrame,
      Option[Array[org.apache.spark.sql.catalyst.InternalRow]]) = {
    val keys = Seq(ColKey, ColPart)
    val budget = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (budget <= 0 ||
        nIncoming * GraftWriteClient.TagBroadcastBytesPerKey > budget) {
      val idx = keyIndex(Some(deduped), Some(bounds), nIncoming = nIncoming)
      (deduped.join(idx, keys, "left"), None)
    } else {
      val idxRaw = keyIndex(Some(deduped), Some(bounds),
        nIncoming = nIncoming, dedupKeys = false)
      // internal-row collect: skips the external-Row conversion on the
      // way out AND the toCatalyst re-conversion inside createDataFrame
      val (matched, mAttrs) = org.apache.spark.sql.graft.Shims.collectInternal(
        idxRaw.join(broadcast(deduped.select(keys.map(col): _*)), keys, "left_semi"))
      if (matched.isEmpty)
        return (deduped.withColumn(ColTargetFile, lit(null).cast("string")),
          Some(Array.empty))
      val seen = new scala.collection.mutable.HashSet[(String, String)]
      val localRows = matched.filter(r => seen.add((r.getString(0), r.getString(1))))
      val local = org.apache.spark.sql.graft.Shims.localDf(spark, mAttrs, localRows)
      (deduped.join(broadcast(local), keys, "left"), Some(localRows))
    }
  }

  import GraftWriteClient.InsertRange

  /** Driver-side bin-packing plan: per partition, fill small files up to
    * target size, then open new file groups. Bucket shares are expressed
    * as fractions of the partition's insert count, so executors can route
    * rows by key hash without any total ordering.
    * (ref: UpsertPartitioner.assignInserts, UpsertPartitioner.java:157-296)
    */
  private def assignInsertRanges(
      insertCounts: Map[String, Long],
      slices: Seq[graft.core.FileSlice],
      avgSize: Long,
      packSmall: Boolean,
      instantTs: String): Seq[InsertRange] = {
    val recordsPerFile = math.max(1L, wc.targetFileSizeBytes / avgSize)
    var groupSeq = 0
    insertCounts.toSeq.flatMap { case (part, n) =>
      var remaining = n
      var assignedSoFar = 0L
      val out = scala.collection.mutable.ArrayBuffer[InsertRange]()
      def add(take: Long, fileId: String, existing: Boolean): Unit = {
        out += InsertRange(part,
          assignedSoFar.toDouble / n, (assignedSoFar + take).toDouble / n,
          fileId, existing)
        assignedSoFar += take; remaining -= take
      }
      if (packSmall) {
        // slice size counts deltas too: a MOR group with a small base but
        // heavy delta debt is NOT a packing target (ref: the delta-commit
        // partitioner picks the smallest file SLICE)
        def sliceBytes(s: graft.core.FileSlice): Long =
          s.base.map(_.bytes).getOrElse(0L) + s.deltas.map(_.bytes).sum
        val small = slices
          .filter(s => s.partition == part && s.base.isDefined &&
            (table.isMor || s.deltas.isEmpty) &&
            sliceBytes(s) < wc.smallFileLimitBytes)
          .sortBy(sliceBytes)
        small.foreach { s =>
          if (remaining > 0) {
            val cap = math.max(0L,
              (wc.targetFileSizeBytes - sliceBytes(s)) / avgSize)
            val take = math.min(cap, remaining)
            if (take > 0) add(take, s.fileId, existing = true)
          }
        }
      }
      while (remaining > 0) {
        val take = math.min(recordsPerFile, remaining)
        add(take, newFileId(instantTs, groupSeq), existing = false)
        groupSeq += 1
      }
      // float-safety: the last bucket must cover hash fraction 1.0 - eps
      if (out.nonEmpty) out(out.length - 1) = out.last.copy(hi = 1.000001)
      out
    }
  }

  /** Map each insert row to its target file group: a uniform [0,1) hash
    * of the record key, range-joined (broadcast) against the driver plan's
    * per-bucket fraction ranges. Fully parallel — no per-partition total
    * order, no single-task window; bucket fill matches the plan in
    * expectation, which is all sizing needs (the reference routes insert
    * buckets by key-hash weight the same way,
    * ref: UpsertPartitioner.java:157-247 getPartition).
    */
  private def assignInserts(tagged: DataFrame, ranges: Seq[InsertRange]): DataFrame = {
    if (ranges.isEmpty) return tagged.filter(col(ColTargetFile).isNotNull)
    import spark.implicits._
    val rangesDf = ranges.toDF()
    val inserts = tagged.filter(col(ColTargetFile).isNull).drop(ColTargetFile)
    val HashMod = 1L << 40
    val hashFrac = pmod(xxhash64(col(ColKey)), lit(HashMod)).cast("double") / HashMod.toDouble
    val withH = inserts.withColumn(ColHashFrac, hashFrac)
    val assignedInserts = withH
      .join(broadcast(rangesDf),
        withH(ColPart) === rangesDf("partition") &&
          col(ColHashFrac) >= rangesDf("lo") && col(ColHashFrac) < rangesDf("hi"),
        "inner")
      .withColumn(ColTargetFile, rangesDf("fileId"))
      .drop("partition", "lo", "hi", "fileId", "existing", ColHashFrac)
    val updates = tagged.filter(col(ColTargetFile).isNotNull)
    updates.unionByName(assignedInserts.select(updates.columns.map(col).toSeq: _*))
  }

  /** Merge incoming update rows into the old rows of their file groups
    * via a broadcast-hash LEFT join keyed (partition, fileGroup, key):
    * the old side streams from its parquet scan with no shuffle, and the
    * per-column winner expression reproduces the latest-wins window
    * semantics exactly — incoming beats stored for "overwrite_latest";
    * "event_time" keeps the stored row when its precombine value is
    * strictly larger (nulls rank last, ties go to the newer commit).
    * Precondition (guaranteed by the caller's group split): every key of
    * a merged group has exactly one old row, and at most one incoming row
    * after pre-combine.
    */
  private def broadcastMerge(
      old: DataFrame, inc: DataFrame, fullCols: Seq[String]): DataFrame =
    MergeKernel.broadcastWinner(
      old, inc, Seq(ColKey, ColPart, ColTargetFile), fullCols,
      cfg.payloadClass, cfg.precombineField)

  // ---- physical write: staging dir + distributed publish renames ----

  private def stagingDir(instantTs: String): Path =
    new Path(table.storage.tempDir, instantTs)

  /** Stage rows that carry an assigned file group: one parquet file per
    * (partition, fileId). Rows arrive either clustered by these columns
    * (shuffle path) or scan-aligned one-group-per-task (broadcast path),
    * so the partitioned write produces exactly one file per group —
    * publishStaged enforces that invariant.
    */
  private def stageGrouped(
      df: DataFrame,
      dataCols: Seq[String],
      instantTs: String,
      deltaGroups: Set[String],
      overwrite: Boolean): Unit = {
    val staging = stagingDir(instantTs)
    val fileCols = MetaColumns.All :+ MetaColumns.IsDeleted
    val suffixCol =
      if (deltaGroups.isEmpty) lit(table.config.baseFileSuffix)
      else when(col(ColTargetFile).isin(deltaGroups.toSeq: _*),
        lit(table.config.deltaFileSuffix))
        .otherwise(lit(table.config.baseFileSuffix))
    val out = df
      .withColumn(MetaColumns.FileName,
        concat(col(ColTargetFile), lit("_" + instantTs), suffixCol))
      .withColumn(StagePartCol, col(ColPart))
      .withColumn(StageFileCol, col(ColTargetFile))
      .select((fileCols ++ dataCols ++ Seq(StagePartCol, StageFileCol)).map(col): _*)
    // SortedMergeHandle: in-task sort, no shuffle — each staged file
    // comes out key-ordered
    val sorted =
      if (wc.sortedWrite)
        out.sortWithinPartitions(
          col(StagePartCol), col(StageFileCol), col(MetaColumns.RecordKey))
      else out
    sorted.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .partitionBy(StagePartCol, StageFileCol)
      .format(table.config.baseFileFormat)
      .save(staging.toString)
  }

  /** Write rows without a pre-assigned group (bulk loads): each staged
    * part-file becomes a brand-new file group, sized by maxRecordsPerFile.
    */
  private def writeUngrouped(
      df: DataFrame,
      dataCols: Seq[String],
      instantTs: String,
      recordsPerFile: Long): Seq[WriteFileInfo] = {
    val staging = stagingDir(instantTs)
    val fileCols = MetaColumns.All :+ MetaColumns.IsDeleted
    val out = df.withColumn(StagePartCol, col(ColPart))
      .select((fileCols ++ dataCols ++ Seq(StagePartCol)).map(col): _*)
    out.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", recordsPerFile)
      .partitionBy(StagePartCol)
      .format(table.config.baseFileFormat)
      .save(staging.toString)
    publishStaged(staging, instantTs, groupedByFile = false, Set.empty,
      Some(org.apache.spark.sql.types.StructType(
        out.schema.filterNot(_.name == StagePartCol))))
  }

  /** Move staged files into the table layout with their final
    * `{fileId}_{instant}[.delta].parquet` names and collect stats.
    * The rename PLAN is computed on the driver; execution fans out to
    * executors above a small threshold (object-store rename = copy, so a
    * 1500-file commit published serially would serialize the whole write
    * behind the driver — ref: the reference finalizes write stats
    * executor-side for the same reason). Record counts come from ONE
    * distributed job over the staging dir.
    */
  private def publishStaged(
      staging: Path,
      instantTs: String,
      groupedByFile: Boolean,
      deltaGroups: Set[String],
      stagedFileSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Seq[WriteFileInfo] = {
    val fs = table.storage.fs
    if (!fs.exists(staging)) return Seq.empty
    // LISTING FIRST (pure FS metadata): the staged file count gates
    // whether the commit's blooms may ride the stats collect to the
    // driver (one action, sidecar written driver-side) or must stay
    // executor-resident (persisted frame + distributed sidecar write)
    val listed = scala.collection.mutable
      .ArrayBuffer[(String, String, org.apache.hadoop.fs.FileStatus)]()
    var newGroupSeq = 0
    fs.listStatus(staging).filter(_.isDirectory).foreach { partDir =>
      val partition = decodeStageValue(
        partDir.getPath.getName.stripPrefix(StagePartCol + "="))
      val leafDirs =
        if (groupedByFile) fs.listStatus(partDir.getPath).filter(_.isDirectory).toSeq
        else Seq(partDir)
      leafDirs.foreach { leaf =>
        val fileId =
          if (groupedByFile)
            decodeStageValue(leaf.getPath.getName.stripPrefix(StageFileCol + "="))
          else null
        val parts = fs.listStatus(leaf.getPath)
          .filter(s => s.isFile &&
            s.getPath.getName.endsWith(table.config.baseFileSuffix))
          .sortBy(_.getPath.getName)
        if (groupedByFile) require(parts.length <= 1,
          s"unexpected multi-file group in staging: ${leaf.getPath} (${parts.length})")
        parts.foreach { st =>
          val id = if (fileId != null) fileId
          else {
            val fid = newFileId(instantTs, newGroupSeq) // bulk path: fresh group
            newGroupSeq += 1
            fid
          }
          listed += ((partition, id, st))
        }
      }
    }
    val bloomExpected = if (wc.bloomIndexEnabled) wc.bloomExpectedEntries else 0L
    val collectBlooms = bloomExpected > 0 &&
      listed.size * bloomBytesOf(bloomExpected, wc.bloomFpp) <=
        DriverBloomCollectMaxBytes
    // Small-commit fast path: the whole stats pass (records, key range,
    // blooms, column stats) runs DRIVER-SIDE in one projected
    // parquet-hadoop read — zero Spark actions per publish for trickle
    // commits; past the byte gate (or on any decode surprise) the
    // distributed job runs as before.
    val staged = phase("staged-stats")(stagedStatsAuto(
      spark, table.storage, staging, listed.map(_._3).toSeq,
      bloomExpected, wc.bloomFpp,
      // staged files carry physical names; accept logical config too
      wc.colStatsColumns.map(table.physicalNameOf),
      table.config.baseFileFormat, collectBlooms, stagedFileSchema))
    val counts = staged.counts
    val out = scala.collection.mutable.ArrayBuffer[WriteFileInfo]()
    val renames = scala.collection.mutable.ArrayBuffer[(Path, Path)]()
    val nameByPath = scala.collection.mutable.Map[String, String]()

    try {
      listed.foreach { case (partition, id, st) =>
        val isDelta = deltaGroups.contains(id)
        val name = id + "_" + instantTs +
          (if (isDelta) table.config.deltaFileSuffix else table.config.baseFileSuffix)
        val stagedPath = st.getPath.toUri.getPath
        val stats = counts.getOrElse(stagedPath, FileStats(0L, "", ""))
        renames += ((st.getPath, table.storage.dataFilePath(partition, name)))
        nameByPath(stagedPath) = name
        out += WriteFileInfo(partition, id, name, stats.records, st.getLen, isDelta,
          stats.minKey, stats.maxKey, stats.colStats, stats.colNulls)
      }
      // sidecar first: its job may recompute from the staged files, which
      // the renames below move away
      phase("bloom-sidecar")(
        writeBloomSidecarMapped(spark, table.storage, instantTs, staged, nameByPath.toMap))
      phase("publish-renames")(
        executeRenames(spark, table.storage, renames.toSeq))
    } finally staged.done() // also on a listing/rename throw — no cache leak
    out.toSeq
  }
}

/** Thrown when the OCC publish check finds an overlapping concurrent
  * commit; the write was rolled back and can be retried.
  */
final class ConcurrentWriteConflictException(msg: String)
  extends RuntimeException(msg)

object GraftWriteClient {
  /** One insert-assignment bucket: rows whose key-hash fraction falls in
    * [lo, hi) of `partition` go to file group `fileId`; `existing` =
    * small-file append target.
    */
  final case class InsertRange(
      partition: String, lo: Double, hi: Double, fileId: String, existing: Boolean)

  /** One index-scan candidate after range pruning. */
  final case class CandidateFile(
      partition: String, fileName: String, path: String, records: Long = 0L)

  // transient planning columns (never persisted)
  val ColKey = "_g_key"
  val ColPart = "_g_part"
  val ColIdxPart = "_g_idx_part"
  /** Synthetic bounds-map key carrying the table-wide range (global index). */
  val GlobalBoundKey = "\u0000global"
  val ColTargetFile = "_g_target_file"
  /** Commit-metadata extra key: incoming row count of a keyed write,
    * recorded for write-amplification stats.
    */
  val IncomingRecordsKey = "incoming.records"
  val ColRank = "_g_rank"
  val ColHashFrac = "_g_hash_frac"

  /** Estimated broadcast bytes per incoming (key, partition) pair for the
    * inverted tag join's budget gate: an UnsafeRow with two string fields
    * (8 B null bits + 2×8 B offset/size words + the UTF-8 bytes) plus
    * hash-relation overhead. Deliberately round and conservative — past
    * the budget the tag join falls back to the shuffle plan, which is
    * exactly right for batches that large.
    */
  val TagBroadcastBytesPerKey = 64L
  val ColDeleteFlag = "_g_delete_flag"
  val StagePartCol = "_gp"
  val StageFileCol = "_gf"
  // per-table data-file suffixes live on GraftTableConfig
  // (baseFileSuffix / deltaFileSuffix) — the format is a table property

  /** fileId = basename up to the first '_' (fileIds contain no '_'). */
  def fileIdOfInputFile: Column =
    // substring arithmetic, not a regexp: this runs per ROW in every
    // index/merge scan, and `{fileId}_{instant}{suffix}` basenames (fileId
    // never contains '_') make "text before the first '_' of the
    // basename" exactly the `([^/_]+)_[^/]*$` capture at a fraction of
    // the per-row cost
    substring_index(substring_index(input_file_name(), "/", -1), "_", 1)

  /** File-group id of a SCANNED row, total over internal AND
    * metadata-only-bootstrapped files. Internal files encode the group in
    * their file name, which `input_file_name()` surfaces; external
    * (bootstrap-source) files keep their original names, so their scans
    * synthesize a correct `_graft_file_name` instead (GraftTable
    * .readDataFiles) and the stored column wins when non-empty.
    * Bulk-inserted internal files store "" (their final name is assigned
    * at publish) and fall through to the input-file parse; clustering
    * nulls the column on rewrite for the same reason.
    */
  def fileIdOfScan: Column =
    when(col(MetaColumns.FileName).isNotNull && col(MetaColumns.FileName) =!= "",
      substring_index(col(MetaColumns.FileName), "_", 1))
      .otherwise(fileIdOfInputFile)

  def newFileId(instantTs: String, seq: Int): String =
    f"$instantTs-$seq%05d"

  /** Commit-metadata extra key: the qualified source directory of a
    * metadata-only bootstrap (scans use it as the hive `basePath`).
    */
  val BootstrapSourceKey = "bootstrap.source"

  /** Per-file write statistics: record count, record-key range, and
    * per-column min/max for the configured stats columns. Key blooms are
    * deliberately NOT here — they are the one per-file artifact too big
    * to round-trip through the driver, so they travel separately as the
    * executor-resident frame in [[StagedStats]].
    */
  final case class FileStats(
      records: Long, minKey: String, maxKey: String,
      colStats: Map[String, Seq[String]] = Map.empty,
      colNulls: Map[String, Long] = Map.empty)

  /** Result of the staged-stats job: small per-file stats collected to
    * the driver, plus the serialized key blooms in one of two homes —
    * `driverBlooms` (small commits: collected in the SAME job as the
    * stats, sidecar written driver-side, zero extra Spark actions) or a
    * persisted `(_path, bloom)` frame on the executors (large commits:
    * the bytes never visit the driver). Call [[StagedStats.done]] after
    * the sidecar is written.
    */
  final case class StagedStats(
      counts: Map[String, FileStats],
      blooms: Option[org.apache.spark.sql.DataFrame],
      driverBlooms: Map[String, Array[Byte]] = Map.empty) {
    def done(): Unit = blooms.foreach(_.unpersist(blocking = false))
  }

  /** Stats columns resolved case-insensitively against a physical schema;
    * unsupported types are skipped silently. Shared by the staged-stats
    * job and metadata-only bootstrap so both aggregate the SAME fields in
    * the SAME order — their row decoding is positional.
    */
  private[graft] def resolveStatFields(
      schema: org.apache.spark.sql.types.StructType,
      statsColumns: Seq[String]): Seq[org.apache.spark.sql.types.StructField] =
    statsColumns
      .flatMap(c => schema.find(_.name.equalsIgnoreCase(c)))
      .filter(f => graft.core.ColumnStats.supported(f.dataType))
      .distinctBy(_.name)

  /** Per stats column: min, max (rendered to string), non-null count —
    * exactly 3 aggregate columns per field, the contract
    * [[decodeColStats]] decodes by position.
    */
  private[graft] def statAggsOf(
      statFields: Seq[org.apache.spark.sql.types.StructField]): Seq[Column] =
    statFields.flatMap(f =>
      graft.core.ColumnStats.statExprs(f) :+ count(col(f.name)))

  /** The `_bf` key-bloom aggregate column (empty when sizing is off). */
  private[graft] def bloomAggsOf(expected: Long, fpp: Double): Seq[Column] =
    if (expected <= 0) Seq.empty
    else Seq(udaf(new KeyBloomAggregator(expected, fpp),
      org.apache.spark.sql.Encoders.STRING)
      .apply(col(MetaColumns.RecordKey)).as("_bf"))

  /** Decode the per-column stats of one collected aggregate row. The row
    * must hold [[statAggsOf]]'s 3 columns per field starting at
    * `statsStart` (the bloom column is never collected). Returns
    * (colStats, colNulls).
    */
  private[graft] def decodeColStats(
      r: org.apache.spark.sql.Row,
      statsStart: Int,
      statFields: Seq[org.apache.spark.sql.types.StructField],
      records: Long): (Map[String, Seq[String]], Map[String, Long]) = {
    val colStats = statFields.zipWithIndex.flatMap { case (f, i) =>
      val mn = r.getString(statsStart + 3 * i)
      val mx = r.getString(statsStart + 3 * i + 1)
      if (mn == null || mx == null) None else Some(f.name -> Seq(mn, mx))
    }.toMap
    val colNulls = statFields.zipWithIndex.map { case (f, i) =>
      f.name -> (records - r.getLong(statsStart + 3 * i + 2))
    }.toMap
    (colStats, colNulls)
  }

  /** Distributed per-file key-bloom builder (merge-combinable, so it runs
    * as one agg expression inside the staged-stats job). Spark's public
    * sketch BloomFilter is the same family the reference persists in
    * parquet footers (ref: HoodieDynamicBoundedBloomFilter).
    */
  final class KeyBloomAggregator(expected: Long, fpp: Double)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    import org.apache.spark.util.sketch.BloomFilter
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, k: String): BloomFilter = {
      b.putString(k); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      a.mergeInPlace(b)
    override def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder =
      org.apache.spark.sql.Encoders.javaSerialization(classOf[BloomFilter])
    override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  /** Write the per-commit bloom sidecar from an executor-resident
    * `(file_name, bloom)` frame — the bloom bytes never visit the driver
    * or a task binary. ~512 blooms per output file: one part for the
    * common small commit, a few parallel writers for a huge bulk load.
    */
  def writeBloomSidecar(
      storage: graft.core.GraftStorage,
      instantTs: String,
      sidecar: org.apache.spark.sql.DataFrame,
      approxFiles: Int): Unit =
    sidecar.coalesce(math.max(1, approxFiles / 512))
      .write.mode(SaveMode.Overwrite)
      // uncompressed + no dictionary ON PURPOSE: loadBlooms gates its
      // driver-side collect on the sidecar's on-disk size, which is only
      // an upper bound if underfilled (zeros-heavy) blooms can't shrink
      // on disk; blooms also recompress poorly when well-filled anyway
      .option("compression", "uncompressed")
      .option("parquet.enable.dictionary", "false")
      .parquet(storage.bloomSidecar(instantTs).toString)

  /** Publish-side sidecar write: map each staged path to its final file
    * name (broadcast — the name map is per-commit small) and write the
    * sidecar straight from the staged-stats frame. Runs BEFORE the
    * publish renames so a cache-evicted partition can still recompute
    * from the staged files; an aborted commit's sidecar is swept by
    * rollback with the rest of the instant. Small commits whose blooms
    * were collected inline (StagedStats.driverBlooms) write the sidecar
    * parquet DRIVER-SIDE — zero Spark actions, the per-commit sidecar of
    * a trickle write costs one file create instead of a job + planning.
    */
  def writeBloomSidecarMapped(
      spark: org.apache.spark.sql.SparkSession,
      storage: graft.core.GraftStorage,
      instantTs: String,
      stats: StagedStats,
      nameByPath: Map[String, String]): Unit =
    if (stats.driverBlooms.nonEmpty) {
      val entries = nameByPath.toSeq.sortBy(_._2).flatMap { case (p, name) =>
        stats.driverBlooms.get(p).map(name -> _)
      }
      if (entries.nonEmpty)
        writeBloomSidecarDriver(storage, instantTs, entries)
    } else stats.blooms.foreach { b =>
      if (nameByPath.nonEmpty) {
        val nm = spark.createDataFrame(nameByPath.toSeq).toDF("_path", "file_name")
        writeBloomSidecar(storage, instantTs,
          b.join(broadcast(nm), "_path").select(col("file_name"), col("bloom")),
          nameByPath.size)
      }
    }

  /** Driver-side sidecar write (parquet via parquet-hadoop's example
    * writer — same layout/read path as the distributed form: columns
    * (file_name, bloom), uncompressed, no dictionary). For the common
    * small commit this replaces a Spark job (broadcast join + coalesce +
    * parquet write) with one sequential file create.
    */
  def writeBloomSidecarDriver(
      storage: graft.core.GraftStorage,
      instantTs: String,
      entries: Seq[(String, Array[Byte])]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      "message spark_schema { optional binary file_name (UTF8); " +
        "optional binary bloom; }")
    val conf = new org.apache.hadoop.conf.Configuration(storage.conf)
    GroupWriteSupport.setSchema(schema, conf)
    val dir = storage.bloomSidecar(instantTs)
    if (!storage.fs.exists(dir)) storage.fs.mkdirs(dir)
    val file = new Path(dir, "part-00000.parquet")
    if (storage.fs.exists(file)) storage.fs.delete(file, false)
    val writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED)
      .withDictionaryEncoding(false)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try entries.foreach { case (name, bytes) =>
      val g = factory.newGroup()
      g.add("file_name", name)
      g.add("bloom", org.apache.parquet.io.api.Binary.fromConstantByteArray(bytes))
      writer.write(g)
    } finally writer.close()
  }

  /** Serialized size of one key bloom at the given sizing — the
    * publish-path gate deciding whether a commit's blooms may be
    * collected to the driver (files × this ≤ [[DriverBloomCollectMaxBytes]]).
    */
  def bloomBytesOf(expected: Long, fpp: Double): Long = {
    // spark's sketch sizing: optimal bits = -n ln(p) / (ln 2)^2, rounded
    // up to a multiple of 64; + 16 = the 12-byte stream header (version,
    // numHashFunctions, word count) rounded up with 4 bytes of slack —
    // deliberately ≥ the true size so the driver-collect gate errs
    // conservative
    val bits = math.ceil(
      -expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = (bits + 63) / 64
    words * 8 + 16
  }

  /** Ceiling on bloom bytes collected to the DRIVER at publish time
    * (small-commit fast path); past it the bytes stay executor-resident
    * and the sidecar is written distributed.
    */
  val DriverBloomCollectMaxBytes: Long = 32L * 1024 * 1024

  /** Ceiling on bloom bytes loaded to the driver for a probe. Past this
    * the broadcast costs more than the scans it might save, so callers
    * fall back to scanning every candidate (always sound).
    */
  val MaxBloomLoadBytes: Long = 256L * 1024 * 1024

  /** Blooms of the given files, keyed by file name, loaded from the
    * sidecars of the instants the file names encode. Files from commits
    * predating bloom sidecars simply have no entry (and are always
    * scanned). Returns empty WITHOUT reading when the sidecars' on-disk
    * size exceeds [[MaxBloomLoadBytes]] — the cap must trip before the
    * driver-side collect, not after it. Sidecars are written
    * uncompressed (see writeBloomSidecar) precisely so the on-disk size
    * bounds the collected bytes; the post-load valve in
    * bloomPruneCandidates remains as the backstop for sidecars written
    * by older versions with compression on.
    */
  def loadBlooms(
      spark: org.apache.spark.sql.SparkSession,
      storage: graft.core.GraftStorage,
      fileNames: Seq[String],
      maxBytes: Long = MaxBloomLoadBytes): Map[String, Array[Byte]] = {
    val instants = fileNames
      .map(graft.core.FileSystemView.instantOfFileName).distinct
    val sidecarDirs = instants.map(storage.bloomSidecar).filter(storage.exists)
    if (sidecarDirs.isEmpty) return Map.empty
    val sidecarBytes = sidecarDirs
      .map(d => storage.fs.getContentSummary(d).getLength).sum
    if (sidecarBytes > maxBytes) return Map.empty
    val wanted = fileNames.toSet
    // Driver-side parquet read: the result is collected to the driver
    // either way (that is what a bloom probe IS), and the size gate above
    // already bounds the bytes — so read the row groups directly instead
    // of launching a Spark job (scan + collect + its planning) per probe.
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    sidecarDirs.foreach { dir =>
      storage.fs.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          val reader = ParquetReader
            .builder(new GroupReadSupport(), st.getPath)
            .withConf(storage.conf)
            .build()
          try {
            var g = reader.read()
            while (g != null) {
              val name = g.getString("file_name", 0)
              if (wanted(name))
                out(name) = g.getBinary("bloom", 0).getBytes
              g = reader.read()
            }
          } finally reader.close()
        }
    }
    out.toMap
  }

  /** a <= b under unsigned UTF-8 byte order — the ordering Spark's
    * UTF8String min/max used to produce the stored key ranges.
    * (Java String.compareTo diverges on supplementary characters, which
    * would make the prune unsound for non-BMP keys.)
    */
  def utf8Lte(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  /** Per-staged-file stats in ONE distributed job (map-side combined
    * groupBy on input_file_name), keyed by decoded scheme-less path.
    * Replaces serial driver-side parquet footer reads on the commit
    * path; the key range feeds the range-pruned index. input_file_name
    * returns URL-encoded URIs (space = %20 …) while FileStatus paths are
    * literal, so keys are URI-decoded before lookup. An empty staging
    * dir (every row of the write was dropped, e.g. a fully-tombstoned
    * compaction) has no footers to infer a schema from — that is a
    * legitimate empty write, not an error.
    */
  def stagedFileStats(
      spark: org.apache.spark.sql.SparkSession,
      staging: Path,
      bloomExpected: Long = 0L,
      bloomFpp: Double = 0.01,
      statsColumns: Seq[String] = Seq.empty,
      format: String = "parquet",
      collectBlooms: Boolean = false,
      fileSchema: Option[org.apache.spark.sql.types.StructType] = None): StagedStats =
    try {
      // recursiveFileLookup: the stats job keys by file PATH, never by the
      // staging partition columns — skip partition inference entirely. An
      // all-null stage value (unpartitioned table → __HIVE_DEFAULT_
      // PARTITION__) would otherwise infer `_gp: void`, which the ORC
      // reader rejects in its read schema.
      // fileSchema: the writer KNOWS the staged files' schema (it just
      // wrote them) — pinning it skips the footer-sampling inference pass
      // on every publish.
      val reader0 = spark.read.format(format)
        .option("recursiveFileLookup", "true")
      val df = fileSchema.map(reader0.schema).getOrElse(reader0)
        .load(staging.toString)
      val statFields = resolveStatFields(df.schema, statsColumns)
      val base = Seq(
        count(lit(1)).as("_n"),
        min(col(MetaColumns.RecordKey)).as("_mn"),
        max(col(MetaColumns.RecordKey)).as("_mx"))
      val bloomAggs = bloomAggsOf(bloomExpected, bloomFpp)
      val aggs = base ++ bloomAggs ++ statAggsOf(statFields)
      val agg = df.groupBy(input_file_name().as("_f"))
        .agg(aggs.head, aggs.tail: _*)
      // Bloom home, decided by the CALLER from the staged file count
      // (collectBlooms): small commits collect the bloom bytes in the
      // SAME action as the stats — no persist, no second job, the
      // sidecar is then written driver-side. Large commits keep the
      // bytes executor-resident in a persisted frame — a 1500-file bulk
      // insert at cluster scale must not funnel files × bloomKB through
      // driver memory and back out inside a LocalTableScan task binary.
      val inlineBlooms = bloomAggs.nonEmpty && collectBlooms
      val cached =
        if (bloomAggs.isEmpty || inlineBlooms) None
        else Some(agg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // row layout of the collect: 0 = the groupBy key (_f), then the
      // base aggs, then (only when collected inline) `_bf`, then the
      // stat aggs
      val bloomAt = if (inlineBlooms) Some(1 + base.size) else None
      val statsStart = 1 + base.size + (if (inlineBlooms) 1 else 0)
      val driverBlooms = scala.collection.mutable.Map[String, Array[Byte]]()
      val counts = try cached.map(_.drop("_bf")).getOrElse(agg)
        .collect()
        .map { r =>
          val records = r.getLong(1)
          val (colStats, colNulls) = decodeColStats(r, statsStart, statFields, records)
          val path = decodedPath(r.getString(0))
          bloomAt.foreach(i => driverBlooms(path) = r.getAs[Array[Byte]](i))
          path ->
            FileStats(records, Option(r.getString(2)).getOrElse(""),
              Option(r.getString(3)).getOrElse(""), colStats, colNulls)
        }
        .toMap
      catch { case e: Throwable =>
        // a failed collect must not leak the cached aggregate
        cached.foreach(_.unpersist(blocking = false)); throw e
      }
      val blooms = cached.map { c =>
        val dec = udf((s: String) => decodedPath(s))
        c.select(dec(col("_f")).as("_path"), col("_bf").as("bloom"))
      }
      StagedStats(counts, blooms, driverBlooms.toMap)
    } catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
          e.getMessage.contains("Unable to infer schema") =>
        StagedStats(Map.empty, None)
    }

  /** Ceiling on TOTAL staged bytes for the driver-side stats fast path:
    * below it one sequential pass over the staged parquet (key column +
    * stats columns, projected) beats a Spark job + its planning; above
    * it the distributed stats job decodes in parallel and wins. Sized so
    * the driver pass stays well under the job's fixed overhead.
    */
  val DriverStatsMaxBytes: Long = 16L * 1024 * 1024

  /** Stats-path dispatcher shared by every publish site: the driver-side
    * fast path when the staging is parquet with a known schema, the
    * blooms (if any) are driver-budgeted anyway, and the TOTAL staged
    * bytes fit [[DriverStatsMaxBytes]]; the distributed job otherwise —
    * and as the fallback for any driver-side decode surprise.
    */
  def stagedStatsAuto(
      spark: org.apache.spark.sql.SparkSession,
      storage: graft.core.GraftStorage,
      staging: Path,
      listedFiles: Seq[org.apache.hadoop.fs.FileStatus],
      bloomExpected: Long,
      bloomFpp: Double,
      statsColumns: Seq[String],
      format: String,
      collectBlooms: Boolean,
      fileSchema: Option[org.apache.spark.sql.types.StructType]): StagedStats = {
    val driverOk = format == "parquet" && fileSchema.isDefined &&
      (bloomExpected <= 0 || collectBlooms) &&
      listedFiles.map(_.getLen).sum <= DriverStatsMaxBytes
    (if (driverOk)
      stagedFileStatsDriver(storage, listedFiles, bloomExpected, bloomFpp,
        statsColumns, fileSchema.get)
    else None).getOrElse(
      stagedFileStats(spark, staging, bloomExpected, bloomFpp,
        statsColumns, format, collectBlooms, fileSchema))
  }

  /** Driver-side staged-stats (the small-commit mirror of
    * [[stagedFileStats]]): reads each staged parquet file once with a
    * projected schema (record key + stats columns) through
    * parquet-hadoop, computing records, the UTF-8 min/max key, per-file
    * key blooms, and the per-column min/max + null counts. Orderings
    * match the distributed job's aggregate semantics (UTF-8 bytes for
    * strings, numeric order elsewhere), and renderings parse back to the
    * SAME typed values in ColumnStats.compare (the prune re-types every
    * stored string, so value-equality is the contract, not
    * byte-equality). Returns None — caller falls back to the distributed
    * job — on any surprise: non-parquet staging, unsupported physical
    * type (e.g. INT96 timestamps), or a read error.
    */
  def stagedFileStatsDriver(
      storage: graft.core.GraftStorage,
      files: Seq[org.apache.hadoop.fs.FileStatus],
      bloomExpected: Long,
      bloomFpp: Double,
      statsColumns: Seq[String],
      fileSchema: org.apache.spark.sql.types.StructType): Option[StagedStats] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType, Type}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.spark.sql.types._

    val statFields = resolveStatFields(fileSchema, statsColumns)
    // one comparator + renderer per stats column; reject types whose
    // parquet encoding we don't decode exactly
    def decOf(p: PrimitiveType): Option[Int] =
      Option(p.getLogicalTypeAnnotation).collect {
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => d.getScale
      }
    final case class ColState(
        name: String, var mn: Any, var mx: Any, var nulls: Long,
        cmp: (Any, Any) => Int, render: Any => String)
    val counts = scala.collection.mutable.Map[String, FileStats]()
    val blooms = scala.collection.mutable.Map[String, Array[Byte]]()
    val makeBlooms = bloomExpected > 0

    files.foreach { st =>
      val inFile = HadoopInputFile.fromStatus(st, storage.conf)
      val footerReader = ParquetFileReader.open(inFile)
      val schema: MessageType =
        try footerReader.getFooter.getFileMetaData.getSchema
        finally footerReader.close()
      def fieldOf(n: String): Option[Type] =
        if (schema.containsField(n)) Some(schema.getType(Seq(n): _*)) else None
      val keyField = fieldOf(MetaColumns.RecordKey)
        .getOrElse(return None)
      val wantedStat = statFields.flatMap(f => fieldOf(f.name).map(f -> _))
      if (wantedStat.size != statFields.size) return None
      // every projected field must be a primitive we decode exactly
      val all = (keyField +: wantedStat.map(_._2))
      if (all.exists(t => !t.isPrimitive)) return None
      if (all.map(_.asPrimitiveType().getPrimitiveTypeName)
        .contains(INT96)) return None
      // a timestamp stats column renders as unix MICROS — any other
      // stored unit (millis/nanos via config) must take the Spark job
      val tsUnitOk = wantedStat.forall { case (f, t) =>
        f.dataType != TimestampType ||
          (Option(t.asPrimitiveType().getLogicalTypeAnnotation).exists {
            case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
            case _ => false
          })
      }
      if (!tsUnitOk) return None

      val cols = wantedStat.map { case (f, t) =>
        val p = t.asPrimitiveType()
        val cmp: (Any, Any) => Int = f.dataType match {
          case StringType => (a, b) =>
            graft.core.ColumnStats.utf8Cmp(a.asInstanceOf[String], b.asInstanceOf[String])
          case BooleanType => (a, b) =>
            java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
          case _: DecimalType => (a, b) =>
            a.asInstanceOf[java.math.BigDecimal]
              .compareTo(b.asInstanceOf[java.math.BigDecimal])
          case FloatType => (a, b) =>
            java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
          case DoubleType => (a, b) =>
            java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
          case ByteType | ShortType | IntegerType | DateType => (a, b) =>
            java.lang.Integer.compare(
              a.asInstanceOf[Number].intValue(), b.asInstanceOf[Number].intValue())
          case LongType | TimestampType => (a, b) =>
            java.lang.Long.compare(
              a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
          case _ => return None
        }
        val render: Any => String = f.dataType match {
          // stored micros, like the distributed job's unix_micros render
          case TimestampType => v => v.asInstanceOf[Number].longValue().toString
          // LocalDate.toString round-trips through the prune's
          // LocalDate.parse for every representable year
          case DateType => v => java.time.LocalDate
            .ofEpochDay(v.asInstanceOf[Number].intValue().toLong).toString
          case _ => v => v.toString
        }
        ((f, p), ColState(f.name, null, null, 0L, cmp, render))
      }

      val projected = new MessageType(schema.getName,
        (keyField +: wantedStat.map(_._2)).map(_.asInstanceOf[Type]).toArray: _*)
      val conf = new org.apache.hadoop.conf.Configuration(storage.conf)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
      val bloom =
        if (makeBlooms) org.apache.spark.util.sketch.BloomFilter.create(bloomExpected, bloomFpp)
        else null
      var records = 0L
      var mnKey: String = null
      var mxKey: String = null
      cols.foreach { case (_, s) => s.mn = null; s.mx = null; s.nulls = 0L }
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new GroupReadSupport(), st.getPath).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          records += 1
          if (g.getFieldRepetitionCount(MetaColumns.RecordKey) == 1) {
            val k = g.getString(MetaColumns.RecordKey, 0)
            if (mnKey == null || !utf8Lte(mnKey, k)) mnKey = k
            if (mxKey == null || !utf8Lte(k, mxKey)) mxKey = k
            if (makeBlooms) bloom.putString(k)
          }
          cols.foreach { case ((f, p), s) =>
            if (g.getFieldRepetitionCount(f.name) == 0) s.nulls += 1
            else {
              val raw: Any = p.getPrimitiveTypeName match {
                case BINARY | FIXED_LEN_BYTE_ARRAY =>
                  if (f.dataType == StringType) g.getString(f.name, 0)
                  else g.getBinary(f.name, 0)
                case INT32   => g.getInteger(f.name, 0)
                case INT64   => g.getLong(f.name, 0)
                case FLOAT   => g.getFloat(f.name, 0)
                case DOUBLE  => g.getDouble(f.name, 0)
                case BOOLEAN => g.getBoolean(f.name, 0)
                case _       => return None
              }
              val v = f.dataType match {
                case _: DecimalType => raw match {
                  case l: Long => java.math.BigDecimal.valueOf(l, decOf(p).getOrElse(0))
                  case i: Int  => java.math.BigDecimal.valueOf(i.toLong, decOf(p).getOrElse(0))
                  case b: org.apache.parquet.io.api.Binary =>
                    new java.math.BigDecimal(
                      new java.math.BigInteger(b.getBytes), decOf(p).getOrElse(0))
                  case other => other
                }
                case _ => raw
              }
              if (s.mn == null || s.cmp(v, s.mn) < 0) s.mn = v
              if (s.mx == null || s.cmp(v, s.mx) > 0) s.mx = v
            }
          }
          g = reader.read()
        }
      } finally reader.close()
      val colStats = cols.flatMap { case (_, s) =>
        if (s.mn == null || s.mx == null) None
        else Some(s.name -> Seq(s.render(s.mn), s.render(s.mx)))
      }.toMap
      val colNulls = cols.map { case (_, s) => s.name -> s.nulls }.toMap
      val path = st.getPath.toUri.getPath
      counts(path) = FileStats(records,
        Option(mnKey).getOrElse(""), Option(mxKey).getOrElse(""), colStats, colNulls)
      if (makeBlooms) {
        val out = new java.io.ByteArrayOutputStream()
        bloom.writeTo(out)
        blooms(path) = out.toByteArray
      }
    }
    Some(StagedStats(counts.toMap, None, blooms.toMap))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Publish renames below this count run as a driver loop (job-launch
    * overhead beats parallelism for small commits).
    */
  val ParallelRenameThreshold = 32

  /** Execute a batch of publish renames: driver loop for small commits,
    * one distributed job for large ones — on object stores rename is a
    * copy, and a 1500-file commit must not serialize it behind the
    * driver. Any failed rename fails the job and therefore the commit
    * (the instant is still inflight at this point, so a partial publish
    * is invisible to readers and cleaned by rollback).
    */
  /** `overwrite` tolerates an existing destination by deleting it first —
    * ONLY for service publishes retrying at a fixed plan timestamp, where
    * a leftover `${fileId}_${planTs}.parquet` from a crashed prior
    * attempt is referenced by no commit (the plan completes only after
    * every rename). Data-commit publishes keep the strict mode: an
    * existing destination there is a real invariant violation.
    */
  def executeRenames(
      spark: org.apache.spark.sql.SparkSession,
      storage: graft.core.GraftStorage,
      pairs: Seq[(Path, Path)],
      overwrite: Boolean = false): Unit = {
    if (pairs.isEmpty) return
    if (pairs.size <= ParallelRenameThreshold) {
      pairs.foreach { case (src, dst) =>
        if (overwrite && storage.exists(dst)) storage.delete(dst)
        require(storage.rename(src, dst), s"rename failed: $src -> $dst")
      }
    } else {
      val conf = new graft.core.SerializableHadoopConf(storage.fs.getConf)
      val strs = pairs.map { case (s, d) => (s.toString, d.toString) }
      val slices = math.min(strs.size, spark.sparkContext.defaultParallelism)
      spark.sparkContext.parallelize(strs, slices).foreach { case (s, d) =>
        val src = new Path(s)
        val dst = new Path(d)
        val fs = dst.getFileSystem(conf.value)
        val parent = dst.getParent
        if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
        if (overwrite && fs.exists(dst)) fs.delete(dst, false)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename failed: $s -> $d")
      }
    }
  }

  /** Delete files driver-side below [[ParallelRenameThreshold]], fanned
    * out over executors above it — a large clean (thousands of obsolete
    * versions) must not serialize on driver round-trips to object
    * storage, mirroring [[executeRenames]].
    */
  def executeDeletes(
      spark: org.apache.spark.sql.SparkSession,
      storage: graft.core.GraftStorage,
      paths: Seq[Path]): Unit = {
    if (paths.isEmpty) return
    if (paths.size <= ParallelRenameThreshold) {
      paths.foreach(p => storage.delete(p))
    } else {
      val conf = new graft.core.SerializableHadoopConf(storage.fs.getConf)
      val strs = paths.map(_.toString)
      val slices = math.min(strs.size, spark.sparkContext.defaultParallelism)
      spark.sparkContext.parallelize(strs, slices).foreach { s =>
        val p = new Path(s)
        p.getFileSystem(conf.value).delete(p, false)
      }
    }
  }

  /** Scheme-less, percent-decoded path for cross-keying input_file_name
    * output with FileStatus paths.
    */
  def decodedPath(s: String): String =
    try new java.net.URI(s).getPath
    catch { case _: Exception => new Path(s).toUri.getPath }

  /** Decoded path INCLUDING scheme and authority — the form stored as an
    * external (bootstrap) path. An adopted file must resolve on the
    * SOURCE's filesystem (s3a://bucket/…, hdfs://nn/…), not the session
    * default; [[decodedPath]] would strip the scheme and silently
    * re-anchor every read on the default FS.
    */
  def decodedFullPath(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getScheme == null) u.getPath else new Path(u).toString
    } catch { case _: Exception => s }

  /** Undo Spark's partition-dir escaping (%xx; no '+'-for-space). */
  def decodeStageValue(v: String): String =
    if (v == "__HIVE_DEFAULT_PARTITION__") ""
    else java.net.URLDecoder.decode(v.replace("+", "%2B"), "UTF-8")
}
