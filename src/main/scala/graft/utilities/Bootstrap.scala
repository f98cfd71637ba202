package graft.utilities

import org.apache.spark.sql.SparkSession

import graft.GraftTable
import graft.core.GraftTableConfig
import graft.write.{GraftWriteClient, WriteConfig}

/** Bootstrap: adopt an existing (non-graft) parquet dataset as a graft
  * table.
  *
  * FULL_RECORD mode re-writes the data once through bulk_insert, after
  * which every graft operation (upsert, incremental pull, time travel,
  * services) applies — the reference's FULL_RECORD bootstrap converges to
  * the same one-time rewrite
  * (ref: SparkBootstrapCommitActionExecutor.java, BootstrapMode.java:29-34).
  * METADATA_ONLY adopts the source files IN PLACE — no data is copied or
  * rewritten. Unlike the reference's skeleton stitching
  * (HoodieBootstrapRelation.scala:1-195, which reads a skeleton file AND
  * the source file per row), the meta columns are synthesized inside the
  * scan from the same keygen expressions the writer uses, so reads stay
  * one-file and pay zero amplification; groups convert to normal internal
  * files lazily on their first rewrite (upsert / compaction / clustering).
  */
object Bootstrap {

  /** Create `targetPath` as a graft table containing the source dataset;
    * returns the bootstrap commit instant.
    */
  def fullRecord(
      spark: SparkSession,
      sourceDir: String,
      targetPath: String,
      config: GraftTableConfig,
      wc: WriteConfig = WriteConfig(),
      sourceFormat: String = "parquet"): String = {
    val df = spark.read.format(sourceFormat).load(sourceDir)
    val table = GraftTable.create(spark, targetPath, config)
    new GraftWriteClient(table, wc).bulkInsert(df)
  }

  /** Adopt the source dataset without rewriting it: every source file
    * becomes a file group referenced by path in the manifest (with key
    * ranges, column stats and blooms computed in one distributed pass).
    * The source must be in `config.baseFileFormat`, carry its partition
    * values as real columns, and keep each file within one partition.
    * Returns the bootstrap commit instant.
    */
  def metadataOnly(
      spark: SparkSession,
      sourceDir: String,
      targetPath: String,
      config: GraftTableConfig,
      wc: WriteConfig = WriteConfig()): String = {
    val table = GraftTable.create(spark, targetPath, config)
    new GraftWriteClient(table, wc).bootstrapMetadataOnly(sourceDir)
  }

  /** Per-partition mode routing in ONE bootstrap call (ref:
    * hudi-client/hudi-client-common/.../bootstrap/selector/
    * BootstrapRegexModeSelector.java): partitions whose path matches
    * `partitionRegex` (anchored, whole-path match like the reference's
    * Pattern.matches) take `regexMode`; every other partition takes the
    * opposite mode. Lands as two commits — METADATA_ONLY adoption first,
    * then a FULL_RECORD bulk_insert of the remaining partitions' rows —
    * mirroring the reference's paired bootstrap instants (metadata
    * bootstrap at 00000000000001, full bootstrap at 00000000000002).
    * Lazy conversion is preserved: adopted groups stay external until
    * their first rewrite. Returns the commit instants (1 or 2 — a mode
    * that matched no partition writes nothing).
    */
  def selective(
      spark: SparkSession,
      sourceDir: String,
      targetPath: String,
      config: GraftTableConfig,
      partitionRegex: String,
      regexMode: String = "METADATA_ONLY",
      wc: WriteConfig = WriteConfig(),
      sourceFormat: String = "parquet"): Seq[String] = {
    require(Seq("METADATA_ONLY", "FULL_RECORD").contains(regexMode.toUpperCase),
      s"unknown bootstrap mode '$regexMode'")
    java.util.regex.Pattern.compile(partitionRegex) // fail fast on a bad regex
    val metaOnMatch = regexMode.equalsIgnoreCase("METADATA_ONLY")

    val table = GraftTable.create(spark, targetPath, config)
    val w = new GraftWriteClient(table, wc)
    val src = spark.read.format(sourceFormat).load(sourceDir)
    // BOTH sides route on the writer's own partition-path expression at
    // ROW level, so a source file whose rows all belong to the
    // full-record side never trips the meta side's single-partition
    // requirement; rlike is anchored to mirror the reference selector's
    // Pattern.matches (codegen'd — no UDF on the scan)
    val partCol = graft.write.KeyGen.partExpr(config)
    val rowMatches = partCol.rlike(s"^(?:$partitionRegex)$$")
    val metaRowKeep = if (metaOnMatch) rowMatches else !rowMatches
    val fullSide = src.filter(if (metaOnMatch) !rowMatches else rowMatches)

    val metaTs =
      try Some(w.bootstrapMetadataOnly(sourceDir,
        partitionKeepExpr = Some(metaRowKeep)))
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("matched none") =>
          None
      }
    val fullTs =
      if (fullSide.isEmpty) None
      else Some(new GraftWriteClient(GraftTable.load(spark, targetPath), wc)
        .bulkInsert(fullSide))
    (metaTs.toSeq ++ fullTs.toSeq)
  }
}
