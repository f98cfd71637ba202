package graft.utilities

import org.apache.spark.sql.SparkSession

import graft.GraftTable
import graft.read.GraftReadClient

/** Export the latest (or as-of) snapshot of a graft table to a plain
  * columnar dataset, or re-materialize it as a fresh graft table.
  *
  * (ref: hudi-utilities/.../HoodieSnapshotExporter.java — output formats
  * `hudi|parquet|orc`, partition-preserving copy. The `hudi` output mode
  * maps to [[Bootstrap.fullRecord]]-style re-ingest; the columnar modes
  * are one distributed snapshot read + partitioned write, so export cost
  * is a single pass over live data regardless of table history.)
  */
object SnapshotExporter {

  /** Write the snapshot as plain `format` files under `outputDir`,
    * preserving the table's partition layout via `partitionBy`. Meta
    * columns are dropped — the export is a clean handoff dataset.
    */
  def exportColumnar(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      format: String = "parquet",
      asOf: Option[String] = None): Unit = {
    val table = GraftTable.load(spark, tablePath)
    val rc = new GraftReadClient(table)
    val df = rc.snapshotData(asOf)
    val parts = table.config.partitionSourceFields
    val w = df.write.mode("overwrite").format(format)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).save(outputDir)
  }

  /** Re-materialize the snapshot as a new graft table at `outputDir`
    * (the reference's `--output-format hudi`): a fresh single-commit
    * table with the same key/partition config — history, tombstones and
    * delta debt are left behind.
    */
  def exportAsGraft(
      spark: SparkSession,
      tablePath: String,
      outputDir: String,
      asOf: Option[String] = None): String = {
    val table = GraftTable.load(spark, tablePath)
    val df = new GraftReadClient(table).snapshotData(asOf)
    // the snapshot carries LOGICAL column names, which become the new
    // table's physical names — copying the rename map would remap them
    // back to the source's old physical names on the next write
    val target = GraftTable.create(spark, outputDir,
      table.config.copy(columnRenames = Map.empty))
    new graft.write.GraftWriteClient(target).bulkInsert(df)
  }
}
