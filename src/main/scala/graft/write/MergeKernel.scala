package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared broadcast merge kernel: `old` rows stream from their scan
  * through a broadcast-hash LEFT join against the (already
  * latest-per-key) `inc` rows, and a per-column winner expression
  * reproduces the latest-wins window semantics — incoming beats stored
  * for "overwrite_latest"; "event_time" keeps the stored row when its
  * precombine value is strictly larger (nulls rank last, ties go to the
  * incoming side, which is by construction the newer commit).
  *
  * Used by the COW update write path, the MOR snapshot read, and MOR
  * compaction — one implementation so the three stay semantically
  * identical with the clustered-window fallback (pinned by the
  * both-paths test). Preconditions: at most one `inc` row per key; every
  * `inc` key that has no `old` row must be handled by the CALLER (the
  * broadcast left join only emits old-side rows).
  */
private[graft] object MergeKernel {

  /** @param valueCols every non-key column; `old` columns missing from it
    *                  are null-filled with the incoming side's type
    *                  (schema evolution).
    */
  def broadcastWinner(
      old: DataFrame,
      inc: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      payloadClass: String,
      precombineField: Option[String]): DataFrame = {
    val In = "_g_in_"
    val incR = inc.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(In + c)): _*)
    val oldFull = valueCols.foldLeft(old)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(inc.schema(c).dataType)))
    val joined = oldFull.join(broadcast(incR), keyCols, "left")
    val present = col(In + graft.core.MetaColumns.CommitTime).isNotNull
    val wins: Column = (payloadClass, precombineField) match {
      case ("event_time", Some(pc)) if valueCols.contains(pc) =>
        val nPc = col(In + pc)
        val oPc = col(pc)
        (nPc.isNotNull && (oPc.isNull || nPc >= oPc)) ||
          (nPc.isNull && oPc.isNull)
      case _ => lit(true)
    }
    val takeNew = present && wins
    joined.select(keyCols.map(col) ++ valueCols.map(c =>
      when(takeNew, col(In + c)).otherwise(col(c)).as(c)): _*)
  }
}
