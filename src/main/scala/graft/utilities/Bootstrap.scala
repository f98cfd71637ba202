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
  * METADATA_ONLY skeleton stitching (keeping the original files and
  * zipping meta columns at read time, HoodieBootstrapRelation.scala:1-195)
  * is a documented non-goal: it trades a one-time rewrite for permanent
  * two-file read amplification on every query.
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
}
