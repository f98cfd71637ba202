package graft.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.GraftTable
import graft.core.{GraftTableConfig, GraftTableType}
import graft.read.GraftReadClient
import graft.write.{GraftWriteClient, WriteConfig}

/** The Spark DataSource entry point: `format("graft")`.
  *
  * Write:
  * {{{
  *   df.write.format("graft")
  *     .option("recordkey.field", "id")            // required on create
  *     .option("partitionpath.field", "region")    // optional
  *     .option("precombine.field", "ts")           // optional
  *     .option("table.type", "cow")                // cow | mor
  *     .option("operation", "upsert")              // see GraftOptions.Operations
  *     .mode(SaveMode.Append)
  *     .save(path)
  * }}}
  * Read:
  * {{{
  *   spark.read.format("graft")
  *     .option("query.type", "snapshot")  // snapshot | read_optimized | incremental
  *     .option("as.of.instant", ts)       // time travel (snapshot/read_optimized)
  *     .option("begin.instant", ts)       // incremental band (exclusive)
  *     .option("end.instant", ts)         // incremental band (inclusive)
  *     .load(path)
  * }}}
  *
  * Dispatch shape mirrors the reference datasource
  * (ref: hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/hudi/
  * DefaultSource.scala:111-247; save-mode semantics
  * HoodieSparkSqlWriter.scala:62-258), re-expressed over the Graft
  * client APIs: the relation hands Catalyst the engine's declarative
  * DataFrame (latest-slice parquet scan / MOR merge), so pushdown,
  * pruning and codegen flow through the format boundary.
  */
class DefaultSource extends DataSourceRegister
    with CreatableRelationProvider
    with RelationProvider
    with SchemaRelationProvider
    with StreamSinkProvider
    with StreamSourceProvider {

  override def shortName(): String = "graft"

  // ---- read ----------------------------------------------------------

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext, parameters)

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation =
    GraftRelation(sqlContext, parameters) // schema always comes from the table

  // ---- write ---------------------------------------------------------

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      df: DataFrame): BaseRelation = {
    GraftWriter.write(sqlContext.sparkSession, mode, parameters, df)
    GraftRelation(sqlContext, parameters)
  }

  // ---- structured streaming -----------------------------------------
  // (ref: DefaultSource.createSink :175-186 / createSource dispatch)

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink =
    new graft.streaming.GraftStreamingSink(sqlContext, parameters)

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse(GraftOptions.Path,
      sys.error("'path' must be specified for the graft streaming source"))
    (shortName(), schema.getOrElse(
      graft.streaming.GraftStreamSource.schemaOf(sqlContext.sparkSession, path,
        cdc = parameters.get(GraftOptions.IncrementalFormat).contains("cdc"))))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val path = parameters.getOrElse(GraftOptions.Path,
      sys.error("'path' must be specified for the graft streaming source"))
    new graft.streaming.GraftStreamSource(sqlContext, path, parameters)
  }
}

/** Option names of the graft format. */
object GraftOptions {
  val Path = "path"
  val Operation = "operation" // default "upsert"
  val QueryType = "query.type" // snapshot | read_optimized | incremental
  val AsOfInstant = "as.of.instant"
  val BeginInstant = "begin.instant"
  val EndInstant = "end.instant"
  /** `cdc` switches incremental reads to the per-commit change feed
    * (GraftReadClient.changes), mirroring
    * hoodie.datasource.query.incremental.format=cdc. */
  val IncrementalFormat = "incremental.format"
  /** Wide-band CDC reads on clusters with executor churn: chunk the
    * change-feed plan through parquet on the table's storage instead of
    * executor-local checkpoint blocks. Default false (localCheckpoint). */
  val CdcReliableCheckpoint = "cdc.reliable.checkpoint"
  /** Streaming-source admission control: at most this many commit
    * instants per micro-batch, so a (re)start against a long backlog
    * catches up in bounded, checkpointable steps instead of one giant
    * batch (the reference's DeltaStreamer bounds catch-up the same way
    * through its source limit). */
  val MaxInstantsPerBatch = "read.stream.maxInstantsPerBatch"
  /** Partition-path glob scoping incremental / CDC reads to matching
    * partitions — file-group pruning, non-matching partitions are never
    * scanned (ref: hoodie.datasource.read.incr.path.glob). */
  val IncrPathGlob = "incr.path.glob"
  val TableName = "table.name"
  val TableType = "table.type" // cow | mor
  val RecordKeyField = "recordkey.field"
  val PartitionPathField = "partitionpath.field"
  val PrecombineField = "precombine.field"
  val PayloadClass = "payload.class" // overwrite_latest | event_time
  val PartitionsToDelete = "partitions.to.delete" // comma-separated
  val IncludeMetaFields = "include.meta.fields"
  // writer sizing knobs (defaults in WriteConfig)
  val TargetFileSize = "target.file.size"
  val SmallFileLimit = "small.file.limit"
  val Parallelism = "parallelism"
  val BulkInsertSortMode = "bulk_insert.sort.mode"
  val InlineCompactDeltaCommits = "compact.inline.max.delta.commits"
  val InlineClusterCommits = "cluster.inline.max.commits"
  val InsertDropDups = "insert.drop.duplicates"
  val InlineClean = "clean.automatic"
  val CleanRetainCommits = "clean.retain.commits"
  /** Global index: keys unique table-wide, updates may move partitions. */
  val IndexGlobal = "index.global"
  /** Base data-file format at table creation: parquet (default) | orc. */
  val BaseFileFormat = "base.file.format"
  /** Comma-separated data columns to collect per-file min/max stats for
    * (read-time data skipping; see graft.core.ColumnStats). */
  val ColStatsColumns = "col.stats.columns"
  val LockProviderKey = "lock.provider" // none | jvm | file | jdbc
  val LockTimeoutMs = "lock.timeout.ms"
  /** JDBC URL of the lock database (lock.provider=jdbc). */
  val LockJdbcUrl = "lock.jdbc.url"
  /** Timestamp-based key generator partition format (e.g. yyyy-MM-dd). */
  val KeygenTimestampFormat = "keygen.timestamp.format"
  /** Operational metrics (see graft.metrics.GraftMetrics): turn emission
    * on, pick the reporter (inmemory | console | jmx), set the console
    * period — so DataSource writes, SQL DML, the ingest runner and the
    * streaming sink surface metrics without code. */
  val MetricsOn = "metrics.on"
  val MetricsReporter = "metrics.reporter"
  val MetricsReportPeriodSec = "metrics.report.period.sec"

  val Operations: Set[String] = Set(
    "upsert", "insert", "bulk_insert", "delete",
    "insert_overwrite", "insert_overwrite_table", "delete_partition")

  def writeConfig(parameters: Map[String, String]): WriteConfig = {
    val base = WriteConfig()
    base.copy(
      targetFileSizeBytes =
        parameters.get(TargetFileSize).map(_.toLong).getOrElse(base.targetFileSizeBytes),
      smallFileLimitBytes =
        parameters.get(SmallFileLimit).map(_.toLong).getOrElse(base.smallFileLimitBytes),
      parallelism = parameters.get(Parallelism).map(_.toInt).getOrElse(base.parallelism),
      bulkInsertSortMode =
        parameters.getOrElse(BulkInsertSortMode, base.bulkInsertSortMode),
      inlineCompactDeltaCommits = parameters.get(InlineCompactDeltaCommits)
        .map(_.toInt).getOrElse(base.inlineCompactDeltaCommits),
      inlineClusterCommits = parameters.get(InlineClusterCommits)
        .map(_.toInt).getOrElse(base.inlineClusterCommits),
      insertDropDups = parameters.get(InsertDropDups)
        .map(_.toBoolean).getOrElse(base.insertDropDups),
      inlineClean =
        parameters.get(InlineClean).map(_.toBoolean).getOrElse(base.inlineClean),
      cleanRetainCommits = parameters.get(CleanRetainCommits)
        .map(_.toInt).getOrElse(base.cleanRetainCommits),
      globalIndex =
        parameters.get(IndexGlobal).map(_.toBoolean).getOrElse(base.globalIndex),
      colStatsColumns = parameters.get(ColStatsColumns)
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.colStatsColumns),
      lockProvider = parameters.getOrElse(LockProviderKey, base.lockProvider),
      lockTimeoutMs = parameters.get(LockTimeoutMs)
        .map(_.toLong).getOrElse(base.lockTimeoutMs),
      lockJdbcUrl = parameters.getOrElse(LockJdbcUrl, base.lockJdbcUrl),
      metricsOn = parameters.get(MetricsOn)
        .map(_.toBoolean).getOrElse(base.metricsOn),
      metricsReporter = parameters.getOrElse(MetricsReporter, base.metricsReporter),
      metricsReportPeriodSec = parameters.get(MetricsReportPeriodSec)
        .map(_.toInt).getOrElse(base.metricsReportPeriodSec))
  }

  def tableConfig(path: String, parameters: Map[String, String]): GraftTableConfig = {
    val keys = parameters.getOrElse(RecordKeyField,
      sys.error(s"option '$RecordKeyField' is required to create a graft table"))
    GraftTableConfig(
      tableName = parameters.getOrElse(TableName,
        path.stripSuffix("/").split('/').last),
      tableType = parameters.getOrElse(TableType, GraftTableType.Cow),
      recordKeyFields = keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
      partitionFields = parameters.get(PartitionPathField).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      precombineField = parameters.get(PrecombineField),
      payloadClass = parameters.getOrElse(PayloadClass, "overwrite_latest"),
      partitionTimestampFormat = parameters.get(KeygenTimestampFormat),
      baseFileFormat = parameters.getOrElse(BaseFileFormat, "parquet"))
  }
}

/** Batch write dispatch with save-mode semantics.
  * (ref: HoodieSparkSqlWriter.scala:62-258)
  */
object GraftWriter {
  import GraftOptions._

  def write(
      spark: SparkSession,
      mode: SaveMode,
      parameters: Map[String, String],
      df: DataFrame,
      extra: Map[String, String] = Map.empty): Unit = {
    val path = parameters.getOrElse(Path, sys.error("'path' must be specified"))
    val exists = GraftTable.exists(spark, path)

    mode match {
      case SaveMode.ErrorIfExists if exists =>
        sys.error(s"Graft table already exists at $path (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists =>
        return
      case _ =>
    }

    val requested = parameters.getOrElse(Operation, "upsert").toLowerCase
    require(Operations.contains(requested), s"unknown operation '$requested'")
    // Overwrite on an existing table = replace its content
    // (ref: HoodieSparkSqlWriter WriteOperationType resolution for
    // SaveMode.Overwrite → INSERT_OVERWRITE_TABLE)
    val operation =
      if (mode == SaveMode.Overwrite && exists &&
        !requested.startsWith("insert_overwrite")) "insert_overwrite_table"
      else requested

    val table =
      if (exists) GraftTable.load(spark, path)
      else GraftTable.create(spark, path, tableConfig(path, parameters))
    val writer = new GraftWriteClient(table,
      writeConfig(parameters).copy(commitExtra = extra))

    operation match {
      case "upsert"                 => writer.upsert(df)
      case "insert"                 => writer.insert(df)
      case "bulk_insert"            => writer.bulkInsert(df)
      case "delete"                 => writer.delete(df)
      case "insert_overwrite"       => writer.insertOverwrite(df)
      case "insert_overwrite_table" => writer.insertOverwriteTable(df)
      case "delete_partition" =>
        val parts = parameters.getOrElse(PartitionsToDelete,
          sys.error(s"operation delete_partition requires '$PartitionsToDelete'"))
        writer.deletePartitions(parts.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    }
  }
}

/** Read relation: resolves the query-type DataFrame from the table and
  * surfaces it through the V1 relation API with column pruning + filter
  * pushdown INTO the inner plan (so parquet sees PushedFilters) and
  * zero row conversion (`needConversion = false`, the rows handed back
  * are the inner plan's InternalRows — the same trick the reference's
  * relations use). Also insertable, so SQL `INSERT INTO` works on
  * catalog tables `USING graft`.
  */
class GraftRelation private (
    val sqlContext: SQLContext,
    val table: GraftTable,
    /** The datasource/catalog OPTIONS this relation was resolved with —
      * writer-affecting options (index.global, sizing, inline services)
      * must reach SQL DML writers too, not only the path-based API.
      */
    val parameters: Map[String, String],
    mkDf: (Option[String => Boolean], graft.core.FileSlice => Boolean) => DataFrame,
    override val schema: StructType)
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** Writer config derived from the relation's options. */
  def writeConfig: WriteConfig = GraftOptions.writeConfig(parameters)

  override def needConversion: Boolean = false

  // every filter is re-applied by Spark above us — pushdown here is a
  // strict optimization, never a correctness dependency
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    // the file list is resolved HERE, at scan time, never cached in the
    // relation — Spark's catalog caches resolved relations, and a write
    // between resolution and scan (SQL DML, INSERT INTO, a concurrent
    // writer) must be visible to the next query
    val df = mkDf(
      GraftRelation.partitionCandidates(table.config, filters),
      graft.core.ColumnStats.keepSlice(
        filters.toSeq, GraftRelation.statsResolver(table),
        stitching = table.config.payloadClass == "overwrite_non_defaults"))
    val filtered = filters.flatMap(GraftRelation.translateFilter)
      .foldLeft(df)((d, c) => d.filter(c))
    val projected = filtered.select(requiredColumns.toSeq.map(col): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** SQL INSERT INTO / INSERT OVERWRITE.
    * (ref: InsertIntoHoodieTableCommand.scala — INTO maps to the insert
    * operation, OVERWRITE to insert_overwrite_table)
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val writer = new GraftWriteClient(table, writeConfig)
    if (overwrite) writer.insertOverwriteTable(data) else writer.insert(data)
  }
}

object GraftRelation {
  import GraftOptions._

  def apply(sqlContext: SQLContext, parameters: Map[String, String]): GraftRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse(Path, sys.error("'path' must be specified"))
    val table = GraftTable.load(spark, path)
    val queryType = parameters.getOrElse(QueryType, "snapshot")
    val includeMeta = parameters.get(IncludeMetaFields).map(_.toBoolean)
      .getOrElse(queryType == "incremental")

    def mkDf(
        partitions: Option[String => Boolean],
        keepSlice: graft.core.FileSlice => Boolean): DataFrame = {
      val read = new GraftReadClient(table)
      val keep: String => Boolean = p => partitions.forall(_(p))
      val df = queryType match {
        case "snapshot" =>
          read.snapshot(parameters.get(AsOfInstant), keep, keepSlice)
        case "read_optimized" =>
          read.readOptimized(parameters.get(AsOfInstant), keep, keepSlice)
        case "incremental" if parameters.get(IncrementalFormat).contains("cdc") =>
          // change feed: one row per change with _change_type/_change_ordinal
          // (no meta columns — the include-meta drop below is a no-op)
          read.changes(
            parameters.getOrElse(BeginInstant, ""), parameters.get(EndInstant),
            parameters.get(CdcReliableCheckpoint).exists(_.toBoolean),
            parameters.get(IncrPathGlob))
        case "incremental" =>
          // commit-based band; `incr.path.glob` scopes it to matching
          // partitions (file-group pruning, not a row filter)
          read.incremental(
            parameters.getOrElse(BeginInstant, ""), parameters.get(EndInstant),
            parameters.get(IncrPathGlob))
        case other =>
          sys.error(s"unknown $QueryType '$other' " +
            "(expected snapshot | read_optimized | incremental)")
      }
      // Batch/snapshot reads default to the user's data columns so SQL
      // `INSERT INTO t SELECT *`-style position matching works;
      // incremental reads default to including meta columns (the
      // _graft_commit_time band is their point). `include.meta.fields`
      // overrides either way.
      if (includeMeta) df else df.drop(graft.core.MetaColumns.All: _*)
    }
    // Relation schema comes from the stored schema, NOT from building the
    // scan plan: every read path returns (meta ++ data) minus the
    // tombstone flag, minus meta when excluded — constructing the full
    // MOR-merge/incremental plan just to read its schema would cost
    // O(timeline) driver work twice per resolution.
    val schema = table.storedFileSchema match {
      case _ if queryType == "incremental" &&
        parameters.get(IncrementalFormat).contains("cdc") =>
        // change-feed schema (_change_* + data columns) differs from the
        // stored schema — build the (cheap, group-scoped) plan for it
        mkDf(None, _ => true).schema
      case Some(full) =>
        val dropped = (if (includeMeta) Seq.empty[String] else graft.core.MetaColumns.All) :+
          graft.core.MetaColumns.IsDeleted
        table.logicalizeSchema(
          StructType(full.filterNot(f => dropped.contains(f.name))))
      case None => mkDf(None, _ => true).schema // empty table: zero-row plan, cheap
    }
    new GraftRelation(sqlContext, table, parameters, mkDf, schema)
  }

  /** Manifest-level partition pruning for the SQL scan: turns the query's
    * pushed filters on partition source fields (EqualTo / EqualNullSafe /
    * In / GreaterThan[OrEqual] / LessThan[OrEqual]) into a predicate over
    * the manifest's partition-path strings, using the writer's exact
    * rendering rules (null/empty → 'default', composite fields joined by
    * '/'). The result is a SUPERSET-sound prune — Spark re-applies every
    * filter above the relation, so keeping an extra partition (or
    * returning None = no pruning) is always safe; a partition is dropped
    * only when NO value that renders to its path segment could satisfy
    * the conjunctive pushed filters. Timestamp-formatted fields and value
    * types whose string rendering could diverge from Catalyst's cast are
    * left unconstrained. Unlike equality-only candidate enumeration, a
    * predicate composes partial constraints: `dt >= '2024-01' AND region
    * = 'eu'` prunes on both fields even though neither pins the full
    * path. At scale this skips listing, footers, and tasks for every
    * non-matching partition (ref: HoodieFileIndex.prunePartition,
    * hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/hudi/HoodieFileIndex.scala:204-230).
    */
  def partitionCandidates(
      cfg: GraftTableConfig, filters: Array[Filter]): Option[String => Boolean] = {
    if (cfg.partitionFields.isEmpty) return None
    // single-field timestamp keygen formats the value — not mappable here
    if (cfg.partitionTimestampFormat.isDefined && cfg.partitionFields.size == 1 &&
      !cfg.partitionFields.head.contains(':')) return None

    def render(v: Any): Option[String] = v match {
      case null => Some("default")
      case s: String => Some(if (s.isEmpty) "default" else s)
      case _: Int | _: Long | _: Short | _: Byte | _: Boolean => Some(v.toString)
      case _ => None // float/timestamp renderings can diverge — skip
    }

    def integral(v: Any): Option[Long] = v match {
      case i: Int   => Some(i.toLong)
      case l: Long  => Some(l)
      case s: Short => Some(s.toLong)
      case b: Byte  => Some(b.toLong)
      case _        => None
    }

    // Spark's default UTF8_BINARY collation orders strings by UTF-8 bytes
    // = by code point; java.lang.String.compareTo orders by UTF-16 unit,
    // which diverges above the BMP — compare code points to stay sound.
    def cpCompare(a: String, b: String): Int = {
      val ai = a.codePoints().iterator(); val bi = b.codePoints().iterator()
      while (ai.hasNext && bi.hasNext) {
        val c = Integer.compare(ai.nextInt(), bi.nextInt())
        if (c != 0) return c
      }
      java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
    }

    // Range filter on one field → segment predicate. cmpOk receives
    // compare(segmentValue, literal). Integral: 'default' is null only →
    // a range rejects it; unparseable segments are kept (sound). String:
    // 'default' renders null, "", OR the literal value "default" — null
    // never satisfies a range, so keep iff "" or "default" would.
    def rangePred(v: Any, cmpOk: Int => Boolean): Option[String => Boolean] =
      integral(v) match {
        case Some(n) => Some { seg =>
          if (seg == "default") false
          else seg.toLongOption.forall(l => cmpOk(java.lang.Long.compare(l, n)))
        }
        case None => v match {
          case s: String => Some { seg =>
            val couldBe = if (seg == "default") Seq("", "default") else Seq(seg)
            couldBe.exists(c => cmpOk(cpCompare(c, s)))
          }
          case _ => None
        }
      }

    def fieldPred(f: String, flt: Filter): Option[String => Boolean] = flt match {
      case EqualTo(a, v) if a.equalsIgnoreCase(f) =>
        render(v).map(r => (seg: String) => seg == r)
      case EqualNullSafe(a, v) if a.equalsIgnoreCase(f) =>
        render(v).map(r => (seg: String) => seg == r)
      case In(a, vs) if a.equalsIgnoreCase(f) =>
        val rendered = vs.toSeq.map(render)
        if (rendered.forall(_.isDefined)) {
          val set = rendered.flatten.toSet
          Some((seg: String) => set.contains(seg))
        } else None
      case GreaterThan(a, v) if a.equalsIgnoreCase(f)        => rangePred(v, _ > 0)
      case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase(f) => rangePred(v, _ >= 0)
      case LessThan(a, v) if a.equalsIgnoreCase(f)           => rangePred(v, _ < 0)
      case LessThanOrEqual(a, v) if a.equalsIgnoreCase(f)    => rangePred(v, _ <= 0)
      case _ => None
    }

    // per partition field: the conjunction of every usable pushed filter
    // (pushed filters are conjunctive); empty = field unconstrained
    val perField: Seq[Seq[String => Boolean]] = cfg.partitionFields.map { spec =>
      val parts = spec.split(':')
      if (parts.length > 1 && parts(1) == "timestamp") Seq.empty
      else filters.toSeq.flatMap(fieldPred(parts(0), _))
    }
    if (perField.forall(_.isEmpty)) None
    else Some { path =>
      val segs = path.split("/", -1)
      // a value containing '/' breaks segment alignment — keep (sound)
      segs.length != perField.length ||
        perField.iterator.zip(segs.iterator).forall {
          case (preds, seg) => preds.forall(_(seg))
        }
    }
  }

  /** Maps a pushed-filter attribute (logical name) to the physical
    * column-stats key and its data type, resolving case-insensitively
    * through the rename map and the stored physical schema. None = column
    * unknown (no pruning for filters on it).
    */
  def statsResolver(table: GraftTable): graft.core.ColumnStats.Resolver =
    table.storedFileSchema match {
      case None => _ => None
      case Some(schema) =>
        val logicalToPhysical = table.config.columnRenames.map(_.swap)
        attr => {
          val phys = logicalToPhysical.collectFirst {
            case (l, p) if l.equalsIgnoreCase(attr) => p
          }.getOrElse(attr)
          schema.find(_.name.equalsIgnoreCase(phys))
            .map(f => (f.name, f.dataType))
        }
    }

  /** sources.Filter → Column; None = not pushable (Spark re-applies all
    * filters above the relation regardless).
    */
  def translateFilter(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toSeq.map(lit): _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case Not(c)                   => translateFilter(c).map(!_)
    case And(l, r) =>
      (translateFilter(l), translateFilter(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (Some(a), None)    => Some(a) // partial AND is still sound
        case (None, Some(b))    => Some(b)
        case _                  => None
      }
    case Or(l, r) =>
      for (a <- translateFilter(l); b <- translateFilter(r)) yield a || b
    case _ => None
  }
}
