package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Core metadata model for the Graft table format.
  *
  * Mirrors the semantics of the reference's timeline/commit protocol
  * (ref: hudi-common/src/main/java/org/apache/hudi/common/table/timeline/
  * HoodieTimeline.java:46-84, HoodieInstant.java:35-63) re-expressed as
  * plain Scala case classes serialized to JSON with json4s (shipped with
  * Spark). The completed-instant file content IS the commit metadata; the
  * file-system view is derived entirely from these (a Delta-style
  * manifest approach — no recursive storage listing, which is the scaling
  * bottleneck the reference mitigates with its metadata table).
  */
object GraftAction {
  val Commit = "commit"               // COW write
  val DeltaCommit = "deltacommit"     // MOR write (delta files)
  val ReplaceCommit = "replacecommit" // insert_overwrite / delete_partition / clustering
  val Clean = "clean"
  val Rollback = "rollback"
  val Savepoint = "savepoint"
  val Restore = "restore"
  /** A scheduled-but-not-yet-executed compaction plan. Only ever exists in
    * requested/inflight state — execution completes as a [[Commit]], the
    * same state machine as the reference's compaction instants
    * (ref: HoodieTimeline.java COMPACTION_ACTION → COMMIT_ACTION on
    * completion, ScheduleCompactionActionExecutor).
    */
  val Compaction = "compaction"
  /** A scheduled-but-not-yet-executed clustering plan; execution
    * completes as a [[ReplaceCommit]] (ref: the reference's requested
    * replacecommit carrying HoodieClusteringPlan,
    * SparkRecentDaysClusteringPlanStrategy + ClusteringPlanActionExecutor).
    */
  val Clustering = "clustering"
  /** Actions that add/replace data files and participate in views. */
  val DataActions: Set[String] = Set(Commit, DeltaCommit, ReplaceCommit)
  /** Every valid instant action (file-name validation). */
  val All: Set[String] =
    Set(Commit, DeltaCommit, ReplaceCommit, Clean, Rollback, Savepoint, Restore,
      Compaction, Clustering)
}

object GraftState {
  val Requested = "requested"
  val Inflight = "inflight"
  val Completed = "completed"
}

/** One timeline instant: (timestamp, action, state).
  * File name on storage: `<ts>.<action>[.requested|.inflight]`.
  */
final case class GraftInstant(ts: String, action: String, state: String) {
  def isCompleted: Boolean = state == GraftState.Completed
  def fileName: String = state match {
    case GraftState.Completed => s"$ts.$action"
    case s                    => s"$ts.$action.$s"
  }
}

object GraftInstant {
  /** Parse `<ts>.<action>[.<state>]` file names; None for foreign files.
    * The ts segment must be all digits and the action a known one, so
    * foreign meta files (`table_config.json`, `.temp`, …) are never
    * mistaken for completed instants.
    */
  def fromFileName(name: String): Option[GraftInstant] = {
    // limit -1: split must NOT drop trailing empty segments, or a
    // foreign file named like "123.commit." (3 segments, last empty)
    // would collapse to 2 and parse as a completed instant
    val parts = name.split("\\.", -1)
    def valid(ts: String, action: String): Boolean =
      ts.nonEmpty && ts.forall(_.isDigit) && GraftAction.All.contains(action)
    parts.length match {
      case 2 if valid(parts(0), parts(1)) =>
        Some(GraftInstant(parts(0), parts(1), GraftState.Completed))
      case 3 if valid(parts(0), parts(1)) &&
        (parts(2) == GraftState.Requested || parts(2) == GraftState.Inflight) =>
        Some(GraftInstant(parts(0), parts(1), parts(2)))
      case _ => None
    }
  }
}

/** One data file written by a commit.
  * @param partition relative partition path ("" for non-partitioned)
  * @param fileId    stable file-group id (all versions of a group share it)
  * @param fileName  physical file name within the partition dir
  * @param isDelta   true for MOR delta ("log") files
  * @param minKey/maxKey record-key range of the file ("" when unknown —
  *                  files from older commits), used by the range-pruned
  *                  key index (ref: the BLOOM index's min/max key-range
  *                  pruning step, SparkHoodieBloomIndex.java:110-140 +
  *                  KeyRangeLookupTree.java)
  * @param colStats  physical column name -> Seq(min, max) rendered through
  *                  [[ColumnStats]], for data-skipping at read time (the
  *                  manifest-resident form of the reference's column-stats
  *                  metadata index). Only columns listed in
  *                  WriteConfig.colStatsColumns carry entries; an all-null
  *                  column has none.
  * @param colNulls  physical column name -> null count, for the same
  *                  stats columns (all-null columns DO carry an entry
  *                  here) — prunes IS NULL / IS NOT NULL and value
  *                  filters against all-null files.
  */
final case class WriteFileInfo(
    partition: String,
    fileId: String,
    fileName: String,
    records: Long,
    bytes: Long,
    isDelta: Boolean,
    minKey: String = "",
    maxKey: String = "",
    colStats: Map[String, Seq[String]] = Map.empty,
    colNulls: Map[String, Long] = Map.empty,
    /** Metadata-only bootstrap: absolute path of the ORIGINAL source file
      * this entry references. The table never wrote (and never deletes)
      * the file; `fileName` is a virtual `{fileId}_{instant}{suffix}`
      * name that keys the manifest/sidecars/timeline like any other file
      * but exists nowhere on disk. None for every file the table wrote.
      */
    externalPath: Option[String] = None)

/** Commit metadata persisted as the content of a completed instant file.
  * (ref: hudi-common/.../model/HoodieCommitMetadata.java — ours also
  * carries the full file manifest so readers never list storage.)
  *
  * @param replacedFileIds partition -> file-group ids invalidated by this
  *                        replacecommit (empty for commit/deltacommit)
  * @param replacePartitions the TARGET partitions of a partition-REPLACING
  *                        operation (delete_partition / insert_overwrite
  *                        [_table]) — declared explicitly because the
  *                        replaced-groups map cannot express "this whole
  *                        partition", only the groups that existed in the
  *                        writer's begin snapshot: a concurrent writer's
  *                        NEW file group in the same partition intersects
  *                        no replaced group, and an empty target partition
  *                        replaces nothing at all, yet both races must
  *                        conflict for partition-replace to serialize.
  *                        Empty for every other operation, including
  *                        clustering (content-preserving, group-level
  *                        conflicts suffice). Older commit files without
  *                        the field decode as empty (json4s default)
  * @param extra           free-form (streaming checkpoints, op params)
  */
final case class GraftCommitMetadata(
    instant: String,
    action: String,
    operation: String,
    files: Seq[WriteFileInfo] = Seq.empty,
    replacedFileIds: Map[String, Seq[String]] = Map.empty,
    replacePartitions: Seq[String] = Seq.empty,
    deletedFiles: Seq[String] = Seq.empty, // "partition/fileName" removed by clean/rollback
    totalRecords: Long = 0L,
    avgRecordSize: Long = 0L,
    schemaJson: String = "",
    extra: Map[String, String] = Map.empty)

/** A persisted compaction plan — the content of a
  * `<ts>.compaction.requested` instant file. Freezes the chosen file
  * slices and the OCC snapshot floor at schedule time so a separate
  * process (or a later run) can execute the merge exactly as planned
  * (ref: HoodieCompactionPlan.avsc + ScheduleCompactionActionExecutor;
  * the request/execute split that lets a long compaction be handed to a
  * second runner).
  */
final case class CompactionPlan(
    instant: String,
    baseTs: String, // OCC floor: last completed data instant at schedule time
    slices: Seq[FileSlice],
    /** Completed data instants visible at schedule time. The precise OCC
      * snapshot: commits complete out of ts order, so a conflict
      * candidate is anything outside this set, not anything above
      * `baseTs` (kept for legacy plans without it).
      */
    baseSeen: Seq[String] = Seq.empty)

/** A persisted clustering plan — the content of a
  * `<ts>.clustering.requested` instant file; same request/execute split
  * as [[CompactionPlan]] (ref: HoodieClusteringPlan.avsc).
  */
final case class ClusteringPlan(
    instant: String,
    baseTs: String,
    sortColumns: Seq[String],
    slices: Seq[FileSlice],
    /** Completed data instants visible at schedule time (see
      * [[CompactionPlan.baseSeen]]). */
    baseSeen: Seq[String] = Seq.empty)

/** A persisted clean plan — the content of a `<ts>.clean.requested`
  * instant file: the frozen list of obsolete `partition/fileName` data
  * files. Execution deletes them idempotently (a retry over a crashed
  * half-deleted attempt just removes what's left), so a failed clean
  * resumes from the plan instead of re-planning against a moved table
  * (ref: HoodieCleanerPlan.avsc + BaseCleanPlanActionExecutor.requestClean).
  */
final case class CleanPlan(
    instant: String,
    operation: String, // "clean" | "clean_versions"
    files: Seq[String])

/** Table-level config stored at `<base>/.graft/table_config.json`.
  * (ref: hudi-common/.../table/HoodieTableConfig.java)
  */
final case class GraftTableConfig(
    tableName: String,
    tableType: String,                    // "cow" | "mor"
    recordKeyFields: Seq[String],
    /** Partition fields; an entry may carry a per-field type suffix
      * `name:timestamp` (format the field through
      * [[partitionTimestampFormat]]) or `name:simple` (raw value, the
      * default) — the composite mixed-type partitioning of the
      * reference's CustomAvroKeyGenerator (`field1:simple,field2:timestamp`).
      */
    partitionFields: Seq[String] = Seq.empty,
    precombineField: Option[String] = None,
    payloadClass: String = "overwrite_latest",
    /** When set (single partition field), the partition path is the field
      * formatted through this date pattern instead of its raw value —
      * epoch seconds and timestamp/date columns both work. The most
      * common real-world partitioning (daily/monthly buckets from an
      * event time; ref: TimestampBasedAvroKeyGenerator.java). With
      * several partition fields the format applies to the `:timestamp`
      * suffixed ones.
      */
    partitionTimestampFormat: Option[String] = None,
    /** Base data-file format: "parquet" (default) or "orc" — the
      * reference's table-level base file format choice (ref:
      * hudi-common/.../model/HoodieFileFormat.java + HoodieOrcWriter.java,
      * HoodieOrcConfig.java; Spark's own ORC source does the IO here).
      * Graft applies ONE format to every data file of the table, MOR
      * delta files included — the reference similarly fixes its log
      * format (Avro) regardless of the base format choice.
      */
    baseFileFormat: String = "parquet",
    /** Column renames as physical name (what parquet files and the stored
      * schema carry, forever) → current logical name (what users see).
      * ALTER TABLE RENAME COLUMN only updates this map — no file is ever
      * rewritten, and files written before AND after the rename stay
      * byte-compatible (they all use the physical name). The simplified
      * form of Delta's column-mapping "name" mode; the reference instead
      * rewrites the Avro schema in place
      * (ref: AlterHoodieTableChangeColumnCommand.scala).
      */
    columnRenames: Map[String, String] = Map.empty) {

  /** Partition fields with any `:type` suffix stripped — the DATA columns
    * partitioning derives from (what exporters/readers reference).
    */
  def partitionSourceFields: Seq[String] =
    partitionFields.map(_.takeWhile(_ != ':'))

  /** Suffix of base data files (`.parquet` / `.orc`). */
  def baseFileSuffix: String = "." + baseFileFormat

  /** Suffix of MOR delta files (`.delta.parquet` / `.delta.orc`). */
  def deltaFileSuffix: String = ".delta." + baseFileFormat
}

object GraftTableType {
  val Cow = "cow"
  val Mor = "mor"
}

/** Meta columns injected into every stored record.
  * (ref: hudi-common/.../model/HoodieRecord.java:37-45)
  */
object MetaColumns {
  val CommitTime = "_graft_commit_time"
  val CommitSeqno = "_graft_commit_seqno"
  val RecordKey = "_graft_record_key"
  val PartitionPath = "_graft_partition_path"
  val FileName = "_graft_file_name"
  /** Tombstone flag (ref: the `_hoodie_is_deleted` soft-delete convention,
    * HoodieTestDataGenerator.java:96). */
  val IsDeleted = "_graft_is_deleted"
  val All: Seq[String] = Seq(CommitTime, CommitSeqno, RecordKey, PartitionPath, FileName)
  val AllWithDeleted: Seq[String] = All :+ IsDeleted
}

object Json {
  implicit val formats: Formats = DefaultFormats

  def write[A <: AnyRef](a: A): String = Serialization.writePretty(a)

  def readCommitMetadata(s: String): GraftCommitMetadata =
    JsonMethods.parse(s).extract[GraftCommitMetadata]

  def readTableConfig(s: String): GraftTableConfig =
    JsonMethods.parse(s).extract[GraftTableConfig]

  def readCompactionPlan(s: String): CompactionPlan =
    JsonMethods.parse(s).extract[CompactionPlan]

  def readClusteringPlan(s: String): ClusteringPlan =
    JsonMethods.parse(s).extract[ClusteringPlan]

  def readCleanPlan(s: String): CleanPlan =
    JsonMethods.parse(s).extract[CleanPlan]
}
