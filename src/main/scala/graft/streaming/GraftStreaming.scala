package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.StructType

import graft.GraftTable
import graft.core.MetaColumns
import graft.read.GraftReadClient
import graft.spark.{GraftOptions, GraftWriter}

/** Structured Streaming endpoints of the graft format.
  *
  * Sink: every micro-batch runs a normal batch write (default upsert),
  * made idempotent across query restarts by recording the batch id in
  * the commit metadata and skipping batches at-or-below the last
  * committed id (ref: HoodieStreamingSink.scala:70-135 — same
  * batch-id-in-commit protocol).
  *
  * Source: offsets are commit instants; each batch is the incremental
  * read between two instants (ref: HoodieStreamSource.scala:49-190,
  * HoodieSourceOffset). The table's commit timeline IS the changelog —
  * no extra state beyond Spark's own offset log.
  */
object GraftStreaming {
  /** Commit-metadata key carrying the sink's micro-batch id. */
  val BatchIdKey = "streaming.batch.id"
  /** Commit-metadata key carrying the streaming query id. */
  val QueryIdKey = "streaming.query.id"
}

/** Offset = completed commit instant timestamp (lexicographically
  * ordered, same as the timeline).
  */
case class GraftSourceOffset(ts: String) extends V1Offset {
  override def json: String = ts
}

object GraftSourceOffset {
  /** Any V1/serialized offset → ours (our json IS the instant ts). */
  def of(o: V1Offset): GraftSourceOffset = o match {
    case g: GraftSourceOffset => g
    case other                => GraftSourceOffset(other.json)
  }

  /** V2 (admission-control) offsets deserialize the same way. */
  def ofV2(
      o: org.apache.spark.sql.connector.read.streaming.Offset): GraftSourceOffset =
    o match {
      case g: GraftSourceOffset => g
      case other                => GraftSourceOffset(other.json)
    }
}

final class GraftStreamingSink(
    sqlContext: SQLContext,
    parameters: Map[String, String]) extends Sink {

  private val path = parameters.getOrElse(GraftOptions.Path,
    sys.error("'path' must be specified for the graft streaming sink"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    // the engine sets this local property on the stream-execution
    // thread; it is stable across restarts from the same checkpoint
    // (runId is not), so it identifies the logical query
    val queryId =
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
    // replay guard: a restarted query re-delivers the last uncommitted
    // batch; anything at-or-below the last batch id committed BY THIS
    // QUERY has already been durably written. Batch ids are scoped to a
    // query's checkpoint: a DIFFERENT query (fresh checkpoint, ids
    // restarting at 0) writing to the same table is new data, not a
    // replay — without the query-id comparison its first batches would
    // be silently dropped until its ids caught up with the previous
    // query's. Commits from versions that recorded no query id keep the
    // old skip-by-batch-id semantics. The scan finds the last commit
    // attributable to THIS query — not merely the last streaming commit:
    // with TWO queries interleaving on one table, query A's restart-
    // redelivered batch must be recognized as a replay even when query B
    // committed last (stopping at B's commit would apply A's batch twice).
    // Legacy commits (no recorded query id, written by older versions)
    // keep EXACTLY their old semantics: they matched any query only while
    // being the single most recent streaming commit. Matching them at any
    // depth would let one ancient legacy batch id silently swallow every
    // NEW query's first batches forever (ids restart at 0 per checkpoint).
    if (GraftTable.exists(spark, path)) {
      val table = GraftTable.load(spark, path)
      val lastOfThisQuery = table.timeline.completedData.reverseIterator
        .map(i => table.timeline.metadataOf(i).extra)
        .filter(_.contains(GraftStreaming.BatchIdKey))
        .zipWithIndex
        .collectFirst {
          case (ex, _) if ex.get(GraftStreaming.QueryIdKey)
            .exists(q => queryId.contains(q)) => ex
          case (ex, 0) if !ex.contains(GraftStreaming.QueryIdKey) => ex
        }
      val replayed =
        lastOfThisQuery.exists(_(GraftStreaming.BatchIdKey).toLong >= batchId)
      if (replayed) return
    }
    val batchDf = Shims.asBatchDf(data)
    GraftWriter.write(spark, SaveMode.Append, parameters, batchDf,
      extra = Map(GraftStreaming.BatchIdKey -> batchId.toString) ++
        queryId.map(GraftStreaming.QueryIdKey -> _))
  }

  override def toString: String = s"GraftStreamingSink[$path]"
}

final class GraftStreamSource(
    sqlContext: SQLContext,
    path: String,
    parameters: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = sqlContext.sparkSession
  private def table = GraftTable.load(spark, path)

  /** `incremental.format=cdc` switches batches from collapsed incremental
    * rows to the per-commit change feed (_change_type / _change_ordinal +
    * data columns), so a downstream stream sees inserts, update pre/post
    * images and deletes rather than only the latest row images — the
    * streaming face of GraftReadClient.changes (ref: the reference's CDC
    * streaming read, hoodie.datasource.query.incremental.format=cdc).
    */
  private val cdc =
    parameters.get(GraftOptions.IncrementalFormat).contains("cdc")

  /** Admission control: at most this many commit instants per
    * micro-batch (option `read.stream.maxInstantsPerBatch`). A stream
    * (re)starting against a long backlog otherwise replays the WHOLE
    * backlog as one giant batch — at scale that batch is the job that
    * never finishes. Bounding the offset makes catch-up incremental and
    * checkpointable; the hollow-commit guard still caps the window's
    * end (the reference's DeltaStreamer bounds catch-up the same way
    * through its source limit).
    */
  private val maxInstants =
    parameters.get(GraftOptions.MaxInstantsPerBatch).map(_.toInt)

  private def cappedEnd(t: GraftTable, from: Option[String]): Option[String] = {
    val safe = t.timeline.safeIncrementalEnd
    maxInstants match {
      case None => safe
      case Some(n) =>
        require(n > 0, s"${GraftOptions.MaxInstantsPerBatch} must be > 0, got $n")
        safe.map { end =>
          val window = t.timeline.completedData.map(_.ts)
            .filter(ts => from.forall(_ < ts) && ts <= end)
          if (window.size <= n) end else window.take(n).last
        }
    }
  }

  /** Incremental-read schema: meta columns ++ data columns (tombstones
    * already dropped by the read); change-feed schema under cdc.
    */
  override def schema: StructType = GraftStreamSource.schemaOf(spark, path, cdc)

  /** Admission control replaces [[getOffset]]: the engine hands the
    * committed start offset in, so catch-up capping needs no self-kept
    * position. Under Trigger.AvailableNow the end is additionally
    * frozen at prepare time — batches drain the backlog in capped
    * windows and the query terminates AT the frozen point even while
    * new commits keep landing (same protocol as Spark's own
    * FileStreamSource).
    */
  @volatile private var availableNowCap: Option[Option[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.timeline.safeIncrementalEnd)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    table.timeline.safeIncrementalEnd.map(GraftSourceOffset(_)).orNull

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val t = table
    val from = Option(startOffset).map(GraftSourceOffset.ofV2(_).ts)
    val capped = cappedEnd(t, from)
    // freeze at the prepared point under AvailableNow (an empty table at
    // prepare time means: drain nothing)
    val end = availableNowCap match {
      case Some(prepared) =>
        prepared.flatMap(p => capped.map(c => if (c < p) c else p))
      case None => capped
    }
    end.filter(e => from.forall(_ < e)).map(GraftSourceOffset(_)).orNull
  }

  /** Legacy pull path — not called once SupportsAdmissionControl is
    * detected (Spark 4.x always detects it), kept correct for
    * completeness. It has no access to the committed start offset, so
    * the per-batch instant cap CANNOT apply here: capping from the
    * timeline start would return the first-n-commits offset forever and
    * stall the stream after one batch. Uncapped, it returns the full
    * safe backlog as one batch — the hollow-commit guard inside
    * safeIncrementalEnd still never advances past the earliest pending
    * writer instant, whose commit would otherwise complete BELOW later
    * instants and be skipped forever.
    */
  override def getOffset: Option[V1Offset] =
    table.timeline.safeIncrementalEnd.map(GraftSourceOffset(_))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val begin = start.map(GraftSourceOffset.of(_).ts).getOrElse("")
    val endTs = GraftSourceOffset.of(end).ts
    val read = new GraftReadClient(table)
    val df = if (cdc) read.changes(begin, Some(endTs))
             else read.incremental(begin, Some(endTs))
    Shims.asStreamingDf(spark, df)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$path]"
}

object GraftStreamSource {
  def schemaOf(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cdc: Boolean = false): StructType = {
    val table = GraftTable.load(spark, path)
    val stored = table.storedFileSchema
      .getOrElse(sys.error(s"graft table at $path has no commits yet — " +
        "the streaming source needs at least one commit to derive a schema"))
    if (cdc) {
      // the change-feed schema (_change_* + data columns) differs from the
      // stored schema; derive it from an empty-band changes() plan (zero
      // commits in the band → no scans, driver-cheap)
      val last = table.timeline.lastCompletedData.map(_.ts).getOrElse("")
      new GraftReadClient(table).changes(last, Some(last)).schema
    } else {
      // logical names: batches come from the read client, which applies
      // the rename map — the declared schema must match
      table.logicalizeSchema(StructType(stored
        .filterNot(_.name == MetaColumns.IsDeleted)))
    }
  }
}
