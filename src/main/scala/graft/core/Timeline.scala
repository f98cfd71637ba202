package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Storage abstraction + active timeline.
  *
  * All state lives under `<basePath>/.graft/`:
  *   - `table_config.json`
  *   - `<ts>.<action>[.requested|.inflight]` instant files
  *   - `archived/` (archived instants)
  *   - `.temp/<ts>/` staging dirs for in-flight writes
  *
  * Uses the Hadoop FileSystem API so the same code path runs on
  * file://, hdfs://, s3a:// — at cluster scale the driver performs
  * O(files-written-per-commit) renames at commit time, identical in
  * shape to the reference's commit protocol
  * (ref: hudi-common/.../timeline/HoodieActiveTimeline.java).
  *
  * Atomicity: completion is a single create-if-absent write of the
  * completed instant file (single-writer assumption, documented; the
  * reference's default is the same optimistic single-writer mode).
  */
final class GraftStorage(val basePath: Path, val conf: Configuration) {
  val fs: FileSystem = basePath.getFileSystem(conf)
  val metaDir: Path = new Path(basePath, GraftStorage.MetaDirName)
  val archiveDir: Path = new Path(metaDir, "archived")
  val tempDir: Path = new Path(metaDir, ".temp")
  /** Per-commit key-bloom sidecars: `blooms/<instant>` parquet dirs. */
  val bloomsDir: Path = new Path(metaDir, "blooms")

  def bloomSidecar(instantTs: String): Path = new Path(bloomsDir, instantTs)

  def exists(p: Path): Boolean = fs.exists(p)

  def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write `content` to a private temp file and return its path. The
    * temp dir lives inside `.graft/` so a rename into the meta dir is a
    * same-filesystem (and on HDFS same-volume) metadata operation.
    */
  private def stageContent(content: String): Path = {
    if (!fs.exists(tempDir)) fs.mkdirs(tempDir)
    val tmp = new Path(tempDir, "meta_" + java.util.UUID.randomUUID.toString)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  /** Whether this filesystem supports mtime refresh (several object-store
    * connectors throw on setTimes) — probed by actually bumping `p`'s
    * mtime once, so the heartbeat path is validated at claim time, not
    * discovered dead mid-execution.
    */
  private[graft] def probeSetTimes(p: Path): Boolean =
    try {
      val before = fs.getFileStatus(p).getModificationTime
      fs.setTimes(p, math.max(System.currentTimeMillis(), before + 1), -1)
      // some connectors no-op setTimes without throwing: require the
      // mtime to have actually advanced, or heartbeats would silently
      // refresh nothing and every long execution would be crash-judged
      // at the TTL (coarse-granularity stores that truncate the bump
      // conservatively fall back to the rewrite path)
      fs.getFileStatus(p).getModificationTime > before
    } catch { case _: Exception => false }

  /** One heartbeat of a claim marker: verify ownership (the marker still
    * carries `token`), then refresh its mtime — setTimes when supported,
    * else an in-place rewrite of the same token (bumps mtime on every
    * store; the breaker's stable-mtime double-read yields to either
    * form, and the path stays present throughout).
    * Returns FALSE only when the claim is lost: the marker exists with a
    * foreign token (a breaker judged us crashed and re-claimed) or it
    * persists but cannot be refreshed (it WILL be crash-judged after the
    * TTL). A missing marker is benign — the execution completed and
    * cleaned it up.
    */
  private[graft] def refreshMarker(p: Path, token: String, canSetTimes: Boolean): Boolean =
    try {
      if (readString(p) != token) false
      else {
        if (canSetTimes) fs.setTimes(p, System.currentTimeMillis(), -1)
        else {
          // NOT the staged overwrite(): its no-FileContext tier deletes
          // the marker before renaming the staged copy in, and in that
          // window a concurrent claimer reads the missing marker as
          // "owner finished" and steals a healthy claim with zero TTL
          // wait (the failed swap then strands a `.new` orphan that
          // listNames resurrects as a phantom instant). An in-place
          // truncating rewrite keeps the path present throughout;
          // transiently partial content is harmless because breakers
          // only read content AFTER judging the mtime stale, and every
          // beat keeps it fresh.
          val out = fs.create(p, true)
          try out.write(token.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
        true
      }
    } catch {
      case _: Exception =>
        !(try exists(p) catch { case _: Exception => true })
    }

  /** Create-if-absent write, atomic in BOTH senses: creation fails if
    * the path already exists (the timeline's OCC backstop), and the path
    * becomes visible only with its FULL content. A plain
    * `create(p, false)` + write publishes an EMPTY file first — a
    * concurrent reader listing `.graft/` can observe a completed-instant
    * file before its commit metadata lands and fail parsing it (caught
    * by the two-writer model walk). So: stage to `.temp/`, then one
    * atomic move — a hard link on the `file` scheme (fails with EEXIST),
    * a namenode-atomic rename on HDFS-like schemes (false if dst
    * exists).
    */
  def createImmutable(p: Path, content: String): Unit = {
    val tmp = stageContent(content)
    try {
      if (fs.getScheme == "file")
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
      // the exists() probe is NOT redundant with the rename result:
      // Hadoop's rename contract is loose and some connectors overwrite
      // an existing destination instead of returning false — on those
      // stores the probe is the only create-if-absent defense (it
      // narrows rather than closes the window; HDFS-like stores give
      // the real guarantee via rename-returns-false)
      else if (fs.exists(p) || !fs.rename(tmp, p))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
    } finally fs.delete(tmp, false)
  }

  /** Overwrite with the same full-content visibility guarantee: readers
    * see either the old content or the new, never a truncated file —
    * and a crash mid-overwrite can never LOSE the target (the only
    * overwritten files are the table config and the archive manifest;
    * losing the config makes the table unloadable). Three tiers:
    *  - `file`: posix ATOMIC_MOVE.
    *  - FileContext Rename.OVERWRITE: a single namenode op on
    *    HDFS-like stores — atomic, no missing-file window.
    *  - stores without an AbstractFileSystem binding: publish a durable
    *    `.new` sibling FIRST, then delete + rename. A crash between the
    *    delete and the final rename leaves `.new` as the surviving
    *    copy; [[listNames]] completes the swap on the next load (the
    *    sibling lives next to its target, NOT in `.temp/`, so the
    *    staging reaper can never collect the sole surviving copy).
    */
  def overwrite(p: Path, content: String): Unit = {
    val tmp = stageContent(content)
    try {
      if (fs.getScheme == "file")
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      else {
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
          fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            val staged = new Path(p.getParent, p.getName + ".new")
            fs.delete(staged, false)
            if (!fs.rename(tmp, staged))
              throw new java.io.IOException(s"overwrite failed staging: $p")
            fs.delete(p, false)
            if (!fs.rename(staged, p)) {
              // a concurrent reader's heal (readOverwritable / listNames)
              // may have completed OUR swap between the delete and this
              // rename — the staged content is then already live at the
              // target. Only a target that is missing or carries foreign
              // bytes is a real failure.
              val healed =
                try readString(p) == content catch { case _: Exception => false }
              if (!healed)
                throw new java.io.IOException(s"atomic overwrite failed: $p")
            }
        }
      }
    } finally if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  /** Read a target maintained by [[overwrite]], completing an
    * interrupted swap if only the `.new` sibling survived a crash.
    */
  def readOverwritable(p: Path): String = {
    if (!fs.exists(p)) {
      val staged = new Path(p.getParent, p.getName + ".new")
      // the heal is BEST-EFFORT: a read path must stay a read path when
      // the store denies mutations (scan-only credentials), and a
      // concurrent writer/reader may complete the swap first — fall back
      // to reading the surviving sibling directly
      val healed =
        try fs.exists(staged) && fs.rename(staged, p)
        catch { case _: Exception => false }
      if (!healed && fs.exists(staged) && !fs.exists(p)) return readString(staged)
    }
    readString(p)
  }

  def delete(p: Path, recursive: Boolean = false): Boolean = fs.delete(p, recursive)

  def rename(src: Path, dst: Path): Boolean = {
    val parent = dst.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    fs.rename(src, dst)
  }

  def listNames(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else {
      val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      // complete any [[overwrite]] swap a crash interrupted: a `.new`
      // sibling whose target is missing IS the newest (and only) copy.
      // Pure in-memory check when no orphan exists — no extra RPC on
      // the hot instant-listing path.
      val orphans = names.filter(n =>
        n.endsWith(".new") && !names.contains(n.stripSuffix(".new")))
      if (orphans.isEmpty) names.filterNot(_.endsWith(".new"))
      else {
        // best-effort, like readOverwritable: a rename denied to
        // scan-only credentials (or lost to a concurrent healer) must
        // not fail the listing — an orphan that stays unhealed is still
        // surfaced under its TARGET name, and readOverwritable falls
        // back to the `.new` sibling when the target is missing
        orphans.foreach { n =>
          try fs.rename(new Path(dir, n), new Path(dir, n.stripSuffix(".new")))
          catch { case _: Exception => () }
        }
        val after = fs.listStatus(dir).toSeq.map(_.getPath.getName)
        (after.filterNot(_.endsWith(".new")) ++
          after.filter(n => n.endsWith(".new") &&
              !after.contains(n.stripSuffix(".new")))
            .map(_.stripSuffix(".new"))).distinct
      }
    }

  def partitionDir(partition: String): Path =
    if (partition.isEmpty) basePath else new Path(basePath, partition)

  def dataFilePath(partition: String, fileName: String): Path =
    new Path(partitionDir(partition), fileName)

  /** `partition/fileName` (the deletedFiles / clean-plan encoding) → full
    * data-file path. Empty partition (non-partitioned tables) supported.
    */
  def dataFilePathOf(pf: String): Path = {
    val i = pf.lastIndexOf('/')
    dataFilePath(pf.substring(0, math.max(i, 0)), pf.substring(i + 1))
  }
}

object GraftStorage {
  val MetaDirName = ".graft"
}

/** Java-serializable wrapper for a Hadoop Configuration (which is
  * Writable but not Serializable) so executor-side tasks can open the
  * table's FileSystem with the driver's exact settings — required for
  * distributed commit publication.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** The active timeline: ordered instants parsed from `.graft/` file names.
  * (ref: hudi-common/.../timeline/HoodieTimeline.java:46-84)
  */
final class GraftTimeline(storage: GraftStorage) {

  def reload(): GraftTimeline = this // stateless — always reads storage

  /** All instants (any state), ascending by (ts, action). */
  def instants: Seq[GraftInstant] =
    storage
      .listNames(storage.metaDir)
      .flatMap(GraftInstant.fromFileName)
      .sortBy(i => (i.ts, i.action))

  def completed: Seq[GraftInstant] = instants.filter(_.isCompleted)

  def completedData: Seq[GraftInstant] =
    completed.filter(i => GraftAction.DataActions.contains(i.action))

  def pending: Seq[GraftInstant] = instants.filterNot(_.isCompleted)

  def lastCompletedData: Option[GraftInstant] = completedData.lastOption

  // Instant files are immutable per state (a transition CREATES a new
  // file name; rollback deletes, and deleted instants are never listed
  // again), so parsed metadata can be memoized. Band reads consult each
  // commit's metadata several times — on object storage that is one GET
  // per consult without this. Bounded LRU: huge-commit file lists must
  // not pin the driver heap.
  private val metaCache =
    new java.util.LinkedHashMap[String, GraftCommitMetadata](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, GraftCommitMetadata]): Boolean =
        size > 256
    }

  def metadataOf(instant: GraftInstant): GraftCommitMetadata =
    metaCache.synchronized {
      val cached = metaCache.get(instant.fileName)
      if (cached != null) cached
      else {
        val m = Json.readCommitMetadata(
          storage.readString(new Path(storage.metaDir, instant.fileName)))
        metaCache.put(instant.fileName, m)
        m
      }
    }

  /** Completed data commits with begin < ts <= end (incremental pulls). */
  def dataInstantsBetween(begin: String, end: String): Seq[GraftInstant] =
    completedData.filter(i => i.ts > begin && i.ts <= end)

  /** The newest completed data instant an incremental CONSUMER may
    * advance its checkpoint to. Instant ts is the BEGIN time, so a
    * writer still in flight will complete BELOW newer already-completed
    * instants — a checkpoint advanced beyond it would skip that commit
    * forever (the reference's "hollow commit" guard: incremental readers
    * must not pass the earliest pending writer instant). Pending SERVICE
    * plans do not hold the floor: compaction/clustering complete at
    * their plan ts without pending commit markers and introduce no
    * logical data change an incremental consumer could miss. A crashed
    * writer's leftover markers pin the floor until rollbackFailedWrites
    * reclaims them — stalling beats silently losing a commit.
    */
  def safeIncrementalEnd: Option[String] = {
    // ONE listing snapshot feeds both the pending floor and the
    // completed ceiling: separate listings open a window where a writer
    // creates its requested marker after the floor listing and a LATER
    // writer completes before the ceiling listing — the checkpoint then
    // advances past the still-pending earlier commit and skips it
    // forever. With a single snapshot the race shrinks to the writer's
    // own ts-generation-to-marker-create gap, the protocol's intrinsic
    // minimum.
    val snap = instants
    val floor = snap
      .filter(i => !i.isCompleted && GraftAction.DataActions.contains(i.action))
      .map(_.ts).minOption
    val done = snap
      .filter(i => i.isCompleted && GraftAction.DataActions.contains(i.action))
      .map(_.ts)
    floor match {
      case Some(f) => done.filter(_ < f).lastOption
      case None    => done.lastOption
    }
  }

  // --- state transitions ----------------------------------------------

  /** `content` defaults to an empty body; service plans (compaction) put
    * their serialized plan here so the requested instant IS the plan file.
    */
  def createRequested(ts: String, action: String, content: String = "{}"): GraftInstant = {
    val i = GraftInstant(ts, action, GraftState.Requested)
    storage.createImmutable(new Path(storage.metaDir, i.fileName), content)
    i
  }

  def transitionToInflight(i: GraftInstant): GraftInstant = {
    val inflight = i.copy(state = GraftState.Inflight)
    storage.createImmutable(new Path(storage.metaDir, inflight.fileName), "{}")
    inflight
  }

  /** Completing writes the commit metadata as the instant file content —
    * the atomic "publish" of the transaction.
    */
  def transitionToCompleted(i: GraftInstant, meta: GraftCommitMetadata): GraftInstant = {
    val done = i.copy(state = GraftState.Completed)
    storage.createImmutable(new Path(storage.metaDir, done.fileName), Json.write(meta))
    // best-effort removal of the requested/inflight marker files
    storage.delete(new Path(storage.metaDir, i.copy(state = GraftState.Requested).fileName))
    storage.delete(new Path(storage.metaDir, i.copy(state = GraftState.Inflight).fileName))
    done
  }

  /** Remove every trace of an instant (rollback support). */
  def deleteInstant(i: GraftInstant): Unit =
    Seq(GraftState.Requested, GraftState.Inflight, GraftState.Completed).foreach { s =>
      storage.delete(new Path(storage.metaDir, i.copy(state = s).fileName))
    }

  // --- archived timeline ----------------------------------------------

  /** Append instants to the archive log and drop them from the active dir.
    * (ref: hudi-common/.../HoodieTimelineArchiveLog.java:120-194)
    */
  def archive(toArchive: Seq[GraftInstant]): Unit = {
    if (toArchive.isEmpty) return
    if (!storage.fs.exists(storage.archiveDir)) storage.fs.mkdirs(storage.archiveDir)
    toArchive.foreach { i =>
      val src = new Path(storage.metaDir, i.fileName)
      if (storage.exists(src)) {
        storage.rename(src, new Path(storage.archiveDir, i.fileName))
      }
    }
  }

  def archivedInstants: Seq[GraftInstant] =
    storage
      .listNames(storage.archiveDir)
      .flatMap(GraftInstant.fromFileName)
      .sortBy(i => (i.ts, i.action))

  def archivedMetadataOf(instant: GraftInstant): GraftCommitMetadata =
    Json.readCommitMetadata(
      storage.readString(new Path(storage.archiveDir, instant.fileName)))
}

/** Monotonic commit-timestamp generator: `yyyyMMddHHmmssSSS`.
  * (ref: HoodieActiveTimeline.createNewInstantTime — second granularity;
  * we use millis plus a monitor-guarded monotonic bump so rapid local
  * commits stay distinct.)
  */
object InstantTimeGenerator {
  // guarded by the object monitor in next() — a plain var, no second
  // synchronization mechanism layered on top
  private var last: String = ""
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmssSSS")
    .withZone(java.time.ZoneOffset.UTC)

  def next(): String = synchronized {
    var candidate = fmt.format(java.time.Instant.now())
    if (candidate <= last) candidate = (BigInt(last) + 1).toString()
    last = candidate
    candidate
  }
}
