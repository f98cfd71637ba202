package graft.write

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.GraftTableConfig

/** Record-key / partition-path rendering as Catalyst column expressions,
  * shared by the write path (meta-column injection) and the
  * metadata-only-bootstrap read path (which synthesizes the same meta
  * columns over the original files at scan time — same expressions, so a
  * bootstrapped row and a written row always render identical keys).
  * (ref: hudi-client/.../keygen/KeyGenUtils.java,
  * TimestampBasedAvroKeyGenerator.java, CustomAvroKeyGenerator.java)
  */
object KeyGen {

  /** Concatenated record key; null/empty components fail the job loudly
    * (a silently empty key would collide every such row under one key).
    * `nameOf` maps config (logical) field names to the physical columns
    * of the frame being keyed.
    */
  def keyExpr(cfg: GraftTableConfig, nameOf: String => String = identity): Column =
    concat_ws(":", cfg.recordKeyFields.map(nameOf).map { f =>
      when(col(f).isNull || col(f).cast("string") === "", raise_error(concat(
        lit(s"record key field '$f' is null or empty for key "),
        concat_ws(":", cfg.recordKeyFields.map(nameOf).map(k => col(k).cast("string")): _*))))
        .otherwise(col(f).cast("string"))
    }: _*)

  /** Null/empty partition components route to the `default` partition —
    * concat_ws would silently DROP the component and collapse the path
    * depth, mixing partitions (ref: KeyGenUtils.getPartitionPath null →
    * DEFAULT_PARTITION_PATH "default").
    */
  private def defaulted(c: Column): Column =
    coalesce(nullif(c, lit("")), lit("default"))

  def partExpr(cfg: GraftTableConfig, nameOf: String => String = identity): Column =
    (cfg.partitionFields, cfg.partitionTimestampFormat) match {
      case (Seq(f), Some(fmt)) if !f.contains(':') =>
        // timestamp-based keygen: epoch seconds or timestamp/date column
        // -> formatted bucket (ref: TimestampBasedAvroKeyGenerator.java)
        defaulted(date_format(col(nameOf(f)).cast("timestamp"), fmt))
      case (fields, _) if fields.isEmpty => lit("")
      case (fields, fmtOpt) =>
        // composite partitioning with optional per-field `:timestamp` /
        // `:simple` type suffixes (ref: CustomAvroKeyGenerator)
        concat_ws("/", fields.map { spec =>
          spec.split(':') match {
            case Array(f, "timestamp") => defaulted(date_format(
              col(nameOf(f)).cast("timestamp"), fmtOpt.getOrElse("yyyy-MM-dd")))
            case Array(f, _) => defaulted(col(nameOf(f)).cast("string"))
            case _ => defaulted(col(nameOf(spec)).cast("string"))
          }
        }: _*)
    }

  /** Deterministic file-group id for a metadata-only-bootstrapped source
    * file, derived purely from `input_file_name()` — the SAME expression
    * runs in the bootstrap stats job and in every later scan of the file,
    * so the group id needs no driver-side lookup table at read time.
    */
  def externalFileIdExpr: Column =
    concat(lit("boot-"), lower(hex(xxhash64(input_file_name()))))
}
