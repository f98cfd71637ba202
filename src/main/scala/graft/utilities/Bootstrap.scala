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
}
