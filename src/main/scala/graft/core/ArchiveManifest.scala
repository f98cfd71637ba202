package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoders, SparkSession}

/** Archive-manifest storage — the Delta-checkpoint analogue of the
  * timeline (ref: the planning problem HoodieBackedTableMetadata.java's
  * HFile metadata table exists to solve).
  *
  * Earlier rounds stored the whole checkpoint as ONE pretty-printed JSON
  * document; at the 100 TB shape (~10⁶ live file entries) that is
  * ~260 MB of text and a ~10 s single-threaded json4s parse on first
  * touch per process (measured in PlanningScaleSpec). This format splits
  * it:
  *
  *  - `<ts>.manifest.files.<uuid>/` — the file entries as PARQUET,
  *    written and read as a Spark job (the cold load at 1M entries is a
  *    distributed columnar decode, not a giant text parse). The dir name
  *    is attempt-unique so two racing archivers can never interleave
  *    writes into one directory.
  *  - `<ts>.manifest` — a small JSON header (everything but `files`,
  *    plus the exact files-dir name), published ATOMICALLY
  *    (createImmutable) only after the parquet dir is complete: a
  *    listing never selects a half-written checkpoint, and the loser of
  *    a marker race deletes its own orphan dir. The marker create is
  *    also what makes a retried archive at the same boundary KEEP the
  *    prior attempt's content (manifests are immutable once published —
  *    expandedManifest memoizes by name).
  *
  * Legacy single-JSON manifests (no `manifest.format` key) stay fully
  * readable.
  */
object ArchiveManifest {
  val FormatKey = "manifest.format"
  val FilesDirKey = "manifest.files.dir"

  /** Test-only fault-injection seam, fired just before the marker
    * publish: lets specs simulate a transient create failure or a racing
    * archiver landing its marker first. No-op in production.
    */
  private[graft] var markerFault: () => Unit = () => ()

  /** Publish `meta` as the checkpoint for `archiveTs`. No-op when a
    * manifest for the boundary already exists.
    */
  def write(
      spark: SparkSession,
      storage: GraftStorage,
      archiveTs: String,
      meta: GraftCommitMetadata): Unit = {
    val marker = new Path(storage.archiveDir, s"$archiveTs.manifest")
    if (storage.exists(marker)) return
    val dirName = s"$archiveTs.manifest.files.${java.util.UUID.randomUUID}"
    val filesDir = new Path(storage.archiveDir, dirName)
    // a handful of parquet files keeps both the write and the cold read
    // parallel without drowning small tables in tiny files
    val parts = math.max(1, math.min(64, meta.files.size / 250000)).toInt
    spark.createDataset(meta.files)(Encoders.product[WriteFileInfo])
      .repartition(parts)
      .write.mode("overwrite").parquet(filesDir.toString)
    val header = meta.copy(files = Seq.empty,
      extra = meta.extra + (FormatKey -> "parquet") + (FilesDirKey -> dirName))
    try { markerFault(); storage.createImmutable(marker, Json.write(header)) }
    catch {
      case e: java.io.IOException =>
        // Three distinct outcomes hide behind one exception type, and
        // only reading the surviving marker tells them apart:
        //  - OUR marker was actually published and a post-create step
        //    threw (createImmutable's tmp cleanup): the marker
        //    references THIS attempt's dir — success; the dir must
        //    survive, deleting it would orphan a published manifest.
        //  - a racing archiver published the boundary first: its marker
        //    references its OWN dir — this attempt's dir is an orphan
        //    to delete, then swallow.
        //  - the create genuinely failed (no marker): delete the orphan
        //    and rethrow — returning normally without a published
        //    manifest would let the caller archive the instants off the
        //    active timeline with no checkpoint holding their file
        //    entries (silent committed-data loss from every view).
        if (!storage.exists(marker)) {
          storage.delete(filesDir, recursive = true) // genuine failure
          throw e
        }
        val survivor = // None = marker present but unreadable right now
          try Json.readCommitMetadata(storage.readOverwritable(marker))
            .extra.get(FilesDirKey)
          catch { case _: Throwable => None }
        if (survivor.contains(dirName)) () // ours — published, keep dir
        else if (survivor.isDefined)
          storage.delete(filesDir, recursive = true) // lost the race
        else throw e // can't prove ownership: keep the dir (recoverable
        // orphan at worst) and surface the failure rather than risk
        // deleting the dir a published marker references
    }
  }

  /** Load a manifest (either format) back into full commit metadata. */
  def read(
      spark: SparkSession,
      storage: GraftStorage,
      name: String): GraftCommitMetadata = {
    val header = Json.readCommitMetadata(
      storage.readOverwritable(new Path(storage.archiveDir, name)))
    if (!header.extra.get(FormatKey).contains("parquet")) header
    else {
      val dir = new Path(storage.archiveDir, header.extra(FilesDirKey))
      val enc = Encoders.product[WriteFileInfo]
      // read with the encoder's schema pinned: file-entry fields added in
      // future versions must ship a default-filling migration, exactly
      // like the json4s-defaults contract of the legacy format
      val files = spark.read.schema(enc.schema).parquet(dir.toString)
        .as[WriteFileInfo](enc).collect().toSeq
      header.copy(files = files)
    }
  }
}
