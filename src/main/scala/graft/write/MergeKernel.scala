package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.MetaColumns

/** The shared merge kernels used by the COW update write path, the MOR
  * snapshot read, and MOR compaction — one implementation so the paths
  * stay semantically identical with each other (pinned by the
  * both-paths test).
  *
  * Payload semantics (ref: OverwriteWithLatestAvroPayload.java:50-66,
  * DefaultHoodieRecordPayload.java:55-75,
  * OverwriteNonDefaultsWithLatestAvroPayload.java):
  *   - "overwrite_latest": the row from the newest commit wins whole.
  *   - "event_time": the row with the larger precombine value wins whole
  *     (nulls rank last; ties go to the newer commit).
  *   - "overwrite_non_defaults": the newest commit wins the row, but a
  *     data field that is null (= default) in the winner falls back to
  *     the newest OLDER version's non-null value — the pairwise
  *     "only overwrite with non-default fields" combine folded over
  *     versions. A tombstone is a barrier: versions at or below the
  *     newest tombstone never contribute fields (a delete + re-insert
  *     must not resurrect pre-delete values, exactly like the
  *     reference's merge handle where the stored record is gone).
  */
private[graft] object MergeKernel {

  /** Marker column emitted by [[collapseVersions]] when the collapsed
    * history contained a tombstone — consumed by [[broadcastWinner]] to
    * stop stored-row fields from leaking through a delete.
    */
  val TombBarrier = "_g_tomb_barrier"

  /** Columns emitted by an event_time [[collapseVersions]] in
    * `withBarrier` mode: the largest tombstone ordering in the collapsed
    * history (and whether any tombstone existed at all) — consumed by
    * [[broadcastWinner]] to kill base rows a delta tombstone out-ordered
    * even when a LATER delta revived the key with a smaller ordering.
    */
  val KillFloor = "_g_kill_floor"
  val KillAny = "_g_kill_any"

  /** Engine bookkeeping columns that may ride through a merge frame.
    * Matched EXACTLY — a user data column that merely starts with "_g"
    * (say `_growth`) must still participate in the
    * overwrite_non_defaults field fold.
    */
  private val internalCols: Set[String] = Set(
    TombBarrier, KillFloor, KillAny, "_g_cum_tomb", "_g_group", "_g_surv",
    GraftWriteClient.ColKey, GraftWriteClient.ColPart,
    GraftWriteClient.ColIdxPart, GraftWriteClient.ColTargetFile,
    GraftWriteClient.ColRank, GraftWriteClient.ColHashFrac,
    GraftWriteClient.ColDeleteFlag,
    GraftWriteClient.StagePartCol, GraftWriteClient.StageFileCol)

  private def isDataCol(c: String): Boolean =
    !MetaColumns.AllWithDeleted.contains(c) && !internalCols.contains(c)

  /** Collapse multiple versions of each key to one row. `partCols`
    * clusters versions of one key; `order` ranks them NEWEST FIRST.
    * Default payloads keep the rank-1 row whole; "overwrite_non_defaults"
    * additionally folds each data column to its newest non-null value
    * above the tombstone barrier. With `withBarrier` the output carries
    * [[TombBarrier]] (and, for event_time, [[KillFloor]]/[[KillAny]]) —
    * drop them before unioning with plain frames.
    *
    * "event_time" with `precombine` applies COMMIT-FOLD semantics: a
    * tombstone kills only rows of STRICTLY EARLIER commits whose
    * ordering it beats (nulls rank last; an equal ordering loses to the
    * newer tombstone), and rows of later commits never see it. That is
    * exactly what replaying each commit as a COW rewrite yields — the
    * rewrite drops dead rows physically and forgets them — so the MOR
    * delta merge and compaction agree with the COW path bit-for-bit
    * regardless of when compaction runs. Without this, a tombstone
    * lingering in a delta would out-order a later stale re-insert that
    * the COW path (which no longer remembers the delete) accepts.
    * (ref: DefaultHoodieRecordPayload.java:55-75 — the reference's
    * delta-scanner semantics are compaction-timing-dependent here; the
    * fold picks the deterministic COW answer for both paths.)
    */
  def collapseVersions(
      df: DataFrame,
      partCols: Seq[Column],
      order: Seq[Column],
      payloadClass: String,
      rankCol: String,
      withBarrier: Boolean = false,
      precombine: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(order: _*)
    val eventTimeFold = payloadClass == "event_time" &&
      precombine.exists(df.columns.contains) &&
      df.columns.contains(MetaColumns.IsDeleted) &&
      df.columns.contains(MetaColumns.CommitTime)
    if (eventTimeFold) {
      val pc = col(precombine.get)
      val del = col(MetaColumns.IsDeleted)
      val cNum = col(MetaColumns.CommitTime).cast("long")
      val wLater = Window.partitionBy(partCols: _*).orderBy(cNum)
        .rangeBetween(1L, Window.unboundedFollowing)
      val laterDelMax = max(when(del, pc)).over(wLater)
      val laterDelAny = max(when(del, lit(1))).over(wLater)
      val survives = !del && when(pc.isNull, laterDelAny.isNull)
        .otherwise(laterDelMax.isNull || pc > laterDelMax)
      val surv = "_g_surv"
      // survivors outrank tombstones; within each class the caller's
      // NEWEST-FIRST order picks the winner. A key with no survivor
      // still emits its best tombstone so pairwise consumers see the
      // delete (plain callers drop tombstones downstream).
      val wRank = Window.partitionBy(partCols: _*)
        .orderBy(col(surv).desc +: order: _*)
      val based = df.withColumn(surv, survives.cast("int"))
      val withFloor =
        if (!withBarrier) based
        else {
          val wFull = Window.partitionBy(partCols: _*)
          based
            .withColumn(KillFloor, max(when(del, pc)).over(wFull))
            .withColumn(KillAny, max(when(del, lit(1))).over(wFull).isNotNull)
        }
      withFloor.withColumn(rankCol, row_number().over(wRank))
        .filter(col(rankCol) === 1)
        .drop(rankCol, surv)
    } else if (payloadClass != "overwrite_non_defaults") {
      // Default payloads keep the whole newest row — when every ranking
      // column is a plain `desc` (nulls last), that is exactly
      // max_by(row, struct(rank children)): one aggregate whose PARTIAL
      // combines duplicates map-side, so the exchange carries one row
      // per (task, key) instead of every version, and the rank columns
      // drop out of the sort entirely (the struct-typed buffer plans as
      // SortAggregate, which still orders by the GROUP key — the win is
      // the map-side combine and the narrower sort, not zero sorting).
      // Struct comparison is field-lexicographic with nulls smallest, so
      // a null ranking component loses the max — identical to
      // desc_nulls_last. The aggregate requires the same
      // ClusteredDistribution the window did (any caller-supplied
      // (partition, group) clustering still satisfies it — no new
      // shuffle). Mixed/ascending orderings (none today) keep the window
      // fallback.
      val rankChildren =
        order.map(org.apache.spark.sql.graft.Shims.descNullsLastChild)
      if (rankChildren.forall(_.isDefined)) {
        val ord = struct(rankChildren.map(_.get): _*)
        val cols = df.columns.toSeq
        df.groupBy(partCols: _*)
          .agg(max_by(struct(cols.map(col): _*), ord).as(rankCol))
          .select(cols.map(c => col(rankCol).getField(c).as(c)): _*)
      } else {
        df.withColumn(rankCol, row_number().over(w))
          .filter(col(rankCol) === 1)
          .drop(rankCol)
      }
    } else {
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tomb =
        if (df.columns.contains(MetaColumns.IsDeleted))
          col(MetaColumns.IsDeleted).cast("int")
        else lit(0)
      // rows at or below the newest tombstone (scanning newest-first)
      // contribute nothing; the newest row itself keeps its own values
      val cumTomb = "_g_cum_tomb"
      val masked = df.withColumn(cumTomb, sum(tomb).over(cum))
      // ONE projection for every folded column (identical window spec →
      // one Window operator): a per-column withColumn fold nests
      // O(columns) Projects, the plan-explosion shape that makes the
      // analyzer quadratic (or stack-overflow) on wide schemas
      val folded = masked.select(masked.columns.map { c =>
        if (isDataCol(c))
          first(when(col(cumTomb) === 0, col(c)), ignoreNulls = true)
            .over(full).as(c)
        else col(c)
      }.toIndexedSeq: _*)
      val withB =
        if (withBarrier)
          folded.withColumn(TombBarrier, max(tomb).over(full) > 0)
        else folded
      withB.withColumn(rankCol, row_number().over(w))
        .filter(col(rankCol) === 1)
        .drop(rankCol, cumTomb)
    }
  }

  /** Driver-side latest-per-key collapse for DEFAULT payloads, for
    * callers about to collect the collapsed result anyway (the MOR
    * broadcast merge and compaction's mirror of it): collect the RAW
    * rows — the plan is a pure projected scan, so the job has NO
    * exchange and no aggregate — and fold newest-per-key in a driver
    * hashmap. The ordering compare is the same field-lexicographic
    * newest-first the max_by plan computes; every part/order column is a
    * non-null string meta column (commit time, zero-padded seqno), so a
    * binary UTF8String compare IS the struct compare. Only valid for
    * payloads whose collapse keeps the newest row whole (not event_time
    * commit-fold, not overwrite_non_defaults) — callers gate on that.
    * Input volume is the raw delta row count, which is exactly what the
    * callers' manifest row gate already bounds.
    */
  def collapseLatestDriver(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String]): (Array[org.apache.spark.sql.catalyst.InternalRow],
        Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) = {
    val (rows, attrs) = org.apache.spark.sql.graft.Shims.collectInternal(df)
    val names = attrs.map(_.name)
    val pIdx = partCols.map(names.indexOf).toArray
    val oIdx = orderCols.map(names.indexOf).toArray
    require(pIdx.forall(_ >= 0) && oIdx.forall(_ >= 0),
      s"collapseLatestDriver: missing columns in ${names.mkString(",")}")
    def beats(a: org.apache.spark.sql.catalyst.InternalRow,
        b: org.apache.spark.sql.catalyst.InternalRow): Boolean = {
      var i = 0
      while (i < oIdx.length) {
        val c = a.getUTF8String(oIdx(i)).compareTo(b.getUTF8String(oIdx(i)))
        if (c != 0) return c > 0
        i += 1
      }
      false
    }
    val best = new java.util.HashMap[Seq[String],
      org.apache.spark.sql.catalyst.InternalRow](rows.length * 2)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val k: Seq[String] = pIdx.toIndexedSeq.map(r.getString)
      val cur = best.get(k)
      if (cur == null || beats(r, cur)) best.put(k, r)
      i += 1
    }
    (best.values.toArray(
      new Array[org.apache.spark.sql.catalyst.InternalRow](best.size)), attrs)
  }

  /** Broadcast merge: `old` rows stream from their scan through a
    * broadcast-hash LEFT join against the (already latest-per-key) `inc`
    * rows, and per-column winner expressions reproduce the payload
    * semantics. Preconditions: at most one `inc` row per key; every
    * `inc` key that has no `old` row must be handled by the CALLER (the
    * broadcast left join only emits old-side rows).
    *
    * @param valueCols every non-key column; `old` columns missing from it
    *                  are null-filled with the incoming side's type
    *                  (schema evolution).
    */
  /** Column-name prefix of the incoming side inside the broadcast-winner
    * join (see [[broadcastWinner]] / [[broadcastWinnerShaped]]).
    */
  val InPrefix = "_g_in_"

  def broadcastWinner(
      old: DataFrame,
      inc: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      payloadClass: String,
      precombineField: Option[String]): DataFrame = {
    val In = InPrefix
    val barrierIn = inc.columns.contains(TombBarrier)
    val floorIn = inc.columns.contains(KillFloor)
    val incR = inc.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(In + c)) ++
        (if (barrierIn) Seq(col(TombBarrier).as(In + TombBarrier)) else Seq.empty) ++
        (if (floorIn) Seq(col(KillFloor).as(In + KillFloor),
          col(KillAny).as(In + KillAny)) else Seq.empty): _*)
    broadcastWinnerShaped(old, incR, keyCols, valueCols, payloadClass, precombineField)
  }

  /** [[broadcastWinner]] over an `incR` ALREADY in joined shape: key
    * columns under their own names, every other column under
    * [[InPrefix]]. Lets a caller holding the incoming side as a
    * LocalRelation rename it zero-copy (Shims.renamedLocalDf) instead of
    * handing the optimizer a Project-over-LocalRelation it would
    * eagerly evaluate row-by-row with interpreted expressions.
    */
  def broadcastWinnerShaped(
      old: DataFrame,
      incR: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      payloadClass: String,
      precombineField: Option[String]): DataFrame = {
    val In = InPrefix
    val barrierIn = incR.columns.contains(In + TombBarrier)
    val floorIn = incR.columns.contains(In + KillFloor)
    val oldFull = valueCols.foldLeft(old)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(incR.schema(In + c).dataType)))
    val joined = oldFull.join(broadcast(incR), keyCols, "left")
    val present = col(In + graft.core.MetaColumns.CommitTime).isNotNull
    val wins: Column = (payloadClass, precombineField) match {
      case ("event_time", Some(pc)) if valueCols.contains(pc) =>
        val nPc = col(In + pc)
        val oPc = col(pc)
        val pair = (nPc.isNotNull && (oPc.isNull || nPc >= oPc)) ||
          (nPc.isNull && oPc.isNull)
        if (!floorIn) pair
        else {
          // the commit-fold kill floor: some collapsed tombstone
          // out-ordered the old row even if a later delta revived the
          // key with a smaller ordering — the old row is dead either
          // way, so the incoming winner (live row or tombstone) takes
          // the slot (equal orderings lose to the newer tombstone via
          // the pairwise >=)
          // base rows come from strictly earlier commits than any delta
          // tombstone, and the fold's survival test is pc > laterDelMax —
          // so an EQUAL ordering also dies ('>=', not '>'), keeping the
          // broadcast plan bit-identical with the window/clustered fold
          val oldKilled = when(col(pc).isNull,
            coalesce(col(In + KillAny), lit(false)))
            .otherwise(col(In + KillFloor).isNotNull && col(In + KillFloor) >= col(pc))
          oldKilled || pair
        }
      case _ => lit(true)
    }
    val takeNew = present && wins
    val nonDefaults = payloadClass == "overwrite_non_defaults"
    val barrier =
      if (barrierIn) coalesce(col(In + TombBarrier), lit(false)) else lit(false)
    def winner(c: String): Column = {
      val newVal =
        if (nonDefaults && isDataCol(c))
          when(barrier, col(In + c)).otherwise(coalesce(col(In + c), col(c)))
        else col(In + c)
      when(takeNew, newVal).otherwise(col(c)).as(c)
    }
    joined.select(keyCols.map(col) ++ valueCols.map(winner): _*)
  }
}
