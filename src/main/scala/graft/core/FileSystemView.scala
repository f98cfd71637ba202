package graft.core

/** A file slice: one base file (+ MOR delta files committed after it) of a
  * file group. (ref: hudi-common/.../model/FileSlice.java:1-147)
  */
final case class FileSlice(
    partition: String,
    fileId: String,
    base: Option[WriteFileInfo],
    deltas: Seq[WriteFileInfo]) {
  def baseInstant: Option[String] = base.map(instantOf)
  private def instantOf(f: WriteFileInfo): String =
    FileSystemView.instantOfFileName(f.fileName)
}

/** Derives latest/as-of file slices for every file group purely from the
  * commit-metadata manifest carried on the timeline — readers never list
  * the data directories. This replaces the reference's
  * AbstractTableFileSystemView (file-listing based,
  * hudi-common/.../view/AbstractTableFileSystemView.java:1-1118) and its
  * metadata-table/timeline-server mitigations with the manifest pattern:
  * O(completed instants) driver work, independent of file count growth
  * within a commit, and broadcast-friendly.
  *
  * @param instantsWithMeta completed DATA instants (ascending) + metadata
  * @param physicallyDeleted `partition/fileName` entries removed from
  *        storage by clean/rollback/restore instants. Deletion is
  *        physical and absolute, so these are filtered from EVERY view —
  *        including as-of views older than the deleting instant (a
  *        cleaned version can never be served again) and the archive
  *        manifest checkpoint (which must not reference deleted files).
  * @param cleanDeleted the CLEAN-deleted subset of `physicallyDeleted`.
  *        Cleans destroy reconstructible past states, so an as-of read
  *        whose true slice was cleaned fails loudly instead of silently
  *        serving the surviving older/none version. Rollback/restore
  *        deletions erase undone history — every surviving state is
  *        already correct without them — and never trip the guard.
  */
final class FileSystemView(
    instantsWithMeta: Seq[(GraftInstant, GraftCommitMetadata)],
    physicallyDeleted: Set[String] = Set.empty,
    cleanDeleted: Set[String] = Set.empty) {

  /** Clean-deleted file instants per (partition, fileId), for the as-of
    * guard (file names carry their commit instant).
    */
  private lazy val cleanDeletedByGroup: Map[(String, String), Seq[String]] =
    cleanDeleted.toSeq
      .map { pf =>
        val slash = pf.lastIndexOf('/')
        val name = pf.substring(slash + 1)
        ((pf.substring(0, math.max(slash, 0)), name.takeWhile(_ != '_')),
          FileSystemView.instantOfFileName(name))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  /** Latest file slice per live file group as of `asOf` (inclusive).
    * Replace-commits (insert_overwrite / delete_partition / clustering)
    * hide the file groups they replaced from that instant onward.
    */
  def latestSlices(asOf: Option[String] = None): Seq[FileSlice] =
    latestSlices(asOf, None)

  /** Partition-scoped variant: resolve slices for `partitions` only.
    * Every per-commit consumer (the RO-manifest post-commit hook, a
    * replace-commit's group lookup) must use this — at the 100 TB shape
    * (~1M live groups) the view holds a million manifest entries, and
    * hash-grouping all of them to answer a one-partition question turns
    * an O(churn) refresh back into O(table) CPU per firing. Replacement
    * and deletion state is keyed by partition too, so the pruned pass is
    * exact, a plain skip of rows the caller never looks at.
    */
  def latestSlices(
      asOf: Option[String],
      partitions: Option[Set[String]]): Seq[FileSlice] = {
    val visible = asOf match {
      case Some(ts) => instantsWithMeta.filter(_._1.ts <= ts)
      case None     => instantsWithMeta
    }
    def wanted(p: String): Boolean = partitions.forall(_.contains(p))
    // (partition, fileId) -> replaced-at instant
    val replacedAt = scala.collection.mutable.Map[(String, String), String]()
    visible.foreach { case (i, meta) =>
      meta.replacedFileIds.foreach { case (part, ids) =>
        if (wanted(part)) ids.foreach(id => replacedAt((part, id)) = i.ts)
      }
    }
    val deleted: Set[String] =
      visible.flatMap(_._2.deletedFiles).toSet ++ physicallyDeleted

    val byGroup = scala.collection.mutable
      .LinkedHashMap[(String, String), scala.collection.mutable.ArrayBuffer[(String, WriteFileInfo)]]()
    visible.foreach { case (i, meta) =>
      meta.files.foreach { f =>
        if (wanted(f.partition) &&
            !deleted.contains(s"${f.partition}/${f.fileName}")) {
          byGroup.getOrElseUpdate(
            (f.partition, f.fileId),
            scala.collection.mutable.ArrayBuffer.empty) += ((i.ts, f))
        }
      }
    }

    // As-of guard: a cleaned file version that is (a) within the as-of
    // window and (b) newer than the best surviving base for its group
    // means the TRUE state at that instant is gone — fail loudly instead
    // of silently serving an older version (or no version at all, when
    // every file of the group at/below the instant was cleaned). Groups
    // replaced at/below the instant are legitimately invisible and never
    // trip the guard; byGroup here already holds only instants <= asOf.
    for (ts <- asOf if cleanDeleted.nonEmpty)
      cleanDeletedByGroup.foreach { case (g, dts) =>
        val harmful = dts.filter(_ <= ts)
        if (harmful.nonEmpty && wanted(g._1) && !replacedAt.contains(g)) {
          val liveBase = byGroup.get(g)
            .map(_.filter(!_._2.isDelta).map(_._1))
            .filter(_.nonEmpty).map(_.max).getOrElse("")
          require(!harmful.exists(_ > liveBase),
            s"state of file group ${g._1}/${g._2} as of $ts was cleaned " +
              "away and is no longer reconstructible")
        }
      }

    byGroup.iterator.flatMap { case ((part, fileId), files) =>
      val liveUntil = replacedAt.get((part, fileId))
      // A group written at/after its replacement instant is a NEW group
      // reusing the id (not supported — ids are unique), so simply drop
      // all files once replaced.
      val live = liveUntil match {
        case Some(_) => Seq.empty[(String, WriteFileInfo)]
        case None    => files.toSeq
      }
      if (live.isEmpty) None
      else {
        val bases = live.filter(!_._2.isDelta)
        val latestBase = if (bases.isEmpty) None else Some(bases.maxBy(_._1))
        val baseTs = latestBase.map(_._1).getOrElse("")
        val deltas = live
          .filter { case (ts, f) => f.isDelta && ts > baseTs }
          .sortBy(_._1)
          .map(_._2)
        Some(FileSlice(part, fileId, latestBase.map(_._2), deltas))
      }
    }.toSeq
  }

  /** All file versions of every group (for cleaning). */
  def allFilesByGroup: Map[(String, String), Seq[(String, WriteFileInfo)]] = {
    val byGroup = scala.collection.mutable
      .LinkedHashMap[(String, String), scala.collection.mutable.ArrayBuffer[(String, WriteFileInfo)]]()
    val deleted: Set[String] =
      instantsWithMeta.flatMap(_._2.deletedFiles).toSet ++ physicallyDeleted
    instantsWithMeta.foreach { case (i, meta) =>
      meta.files.foreach { f =>
        if (!deleted.contains(s"${f.partition}/${f.fileName}"))
          byGroup.getOrElseUpdate(
            (f.partition, f.fileId),
            scala.collection.mutable.ArrayBuffer.empty) += ((i.ts, f))
      }
    }
    byGroup.view.mapValues(_.toSeq).toMap
  }

  def partitions: Seq[String] =
    latestSlices(None).map(_.partition).distinct

  /** Live file groups in the given partitions (for replace-commits). */
  def groupsInPartitions(parts: Set[String]): Map[String, Seq[String]] =
    latestSlices(None, Some(parts))
      .groupBy(_.partition)
      .view
      .mapValues(_.map(_.fileId).distinct)
      .toMap

  /** Average record size observed over recent commits, for insert
    * bin-packing. (ref: UpsertPartitioner.java:160-165 — estimate from
    * previous commit stats, fall back to a default.)
    */
  def avgRecordSize(default: Long = 1024L): Long = {
    val recent = instantsWithMeta.reverseIterator
      .map(_._2)
      .find(m => m.totalRecords > 0 && m.avgRecordSize > 0)
    recent.map(_.avgRecordSize).getOrElse(default)
  }
}

object FileSystemView {
  /** Data file names are `{fileId}_{instant}.parquet` or
    * `{fileId}_{instant}.delta.parquet`; fileId contains no '_'.
    */
  def instantOfFileName(name: String): String = {
    val core = name.substring(name.indexOf('_') + 1)
    core.substring(0, core.indexOf('.'))
  }
}
