package graft.utilities

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, row_number, upper}

import graft.GraftTable
import graft.spark.{GraftOptions, GraftWriter}

/** Configuration of one ingest pipeline: a DFS source directory, an
  * optional SQL transformer, and a graft target table.
  *
  * @param sourcePath     directory whose data files are ingested
  * @param sourceFormat   parquet | json | csv (any Spark batch format)
  * @param transformerSql SQL over the temp view `source` applied to each
  *                       batch before writing (ref: the reference's
  *                       SqlQueryBasedTransformer)
  * @param transformers   additional SQL transformers applied IN ORDER
  *                       after `transformerSql`, each seeing the previous
  *                       output as the view `source` (ref: the
  *                       reference's ChainedTransformer)
  * @param transformerSqlFile DFS path of a `;`-separated SQL template
  *                       file run between `transformerSql` and
  *                       `transformers`; side-effect statements (CACHE
  *                       TABLE ...) keep the running payload, the last
  *                       result-bearing statement is the batch (ref:
  *                       SqlFileBasedTransformer.java:56-82)
  * @param targetPath     graft table base path (created on first run)
  * @param operation      write operation per batch (default upsert)
  * @param tableOptions   graft datasource options (recordkey.field, ...)
  * @param cdcOpColumn    CDC apply mode: name of the op column in the
  *                       source (I/U/D convention of change-capture
  *                       feeds). Rows with op D delete their key, I/U
  *                       upsert, all in ONE mixed commit per batch; the
  *                       op column itself is not stored (ref: the
  *                       reference's AWSDmsTransformer +
  *                       AWSDmsAvroPayload OP_FIELD handling — a missing
  *                       op column means insert)
  * @param kafkaPayload   when set, the source rows are Kafka-schema
  *                       frames (binary `value` + topic/partition/offset
  *                       metadata) and each batch is decoded through
  *                       [[IngestRunner.decodeKafkaFrame]] before the
  *                       transformer chain
  * @param flattenNested  flatten nested struct columns into `_`-joined
  *                       top-level columns before the SQL transformers
  *                       ([[IngestRunner.flatten]])
  * @param sourceOptions  reader options passed through to the Spark
  *                       batch source — header/delimiter/inferSchema for
  *                       csv, multiLine for json, a DDL `schema` entry to
  *                       fix column types without inference (ref:
  *                       CsvDFSSource.java:64-75's
  *                       hoodie.deltastreamer.csv.* passthrough)
  * @param maxBytesPerRound cap on source bytes per sync round (the
  *                       reference's `sourceLimit`); a backlog drains
  *                       over several checkpointed commits, oldest
  *                       mod-times first, never splitting an mtime group
  * @param datePartition  prune a date-partitioned source tree to the
  *                       lookback window before listing (see
  *                       [[DatePartitionConfig]])
  * @param avroReaderSchema with `sourceFormat = "avro"`: optional reader
  *                       schema (Avro JSON) resolving schema evolution
  *                       across the source files; absent, each batch is
  *                       read with the writer schema sniffed from its
  *                       first file (see [[AvroDecode.readAvroFiles]])
  */
final case class IngestConfig(
    sourcePath: String,
    sourceFormat: String = "parquet",
    transformerSql: Option[String] = None,
    transformerSqlFile: Option[String] = None,
    transformers: Seq[String] = Seq.empty,
    targetPath: String,
    operation: String = "upsert",
    tableOptions: Map[String, String] = Map.empty,
    cdcOpColumn: Option[String] = None,
    kafkaPayload: Option[KafkaPayloadConfig] = None,
    flattenNested: Boolean = false,
    avroReaderSchema: Option[String] = None,
    sourceOptions: Map[String, String] = Map.empty,
    maxBytesPerRound: Option[Long] = None,
    datePartition: Option[DatePartitionConfig] = None)

/** Date-partitioned source listing window (ref: the reference's
  * DatePartitionPathSelector configs `datepartitioned.selector.{depth,
  * lookback.days,currentdate}` and `date.format`): date dirs named
  * `yyyy-MM-dd` or `field=yyyy-MM-dd` sit `depth` levels below the
  * source root; only those within `lookbackDays` of `currentDate`
  * (defaults to today — tests pin it) are listed for fresh files.
  */
final case class DatePartitionConfig(
    depth: Int,
    lookbackDays: Int = 2,
    dateFormat: String = "yyyy-MM-dd",
    currentDate: Option[String] = None)

/** Decoding of a Kafka-shaped record frame — the schema every Kafka
  * consumer surface hands over (`key` and `value` binary, plus `topic`,
  * `partition`, `offset`, `timestamp`), whether it arrives through
  * Structured Streaming's kafka source, a batch archive dump, or a
  * fixture (ref: hudi-utilities/.../sources/JsonKafkaSource.java —
  * value bytes JSON-decoded against the provided schema;
  * AvroKafkaSource.java is the same seam with an Avro decoder —
  * `format = "avro"` here, decoded by [[AvroDecode]] on avro-core).
  *
  * @param valueSchemaDdl   DDL of the decoded value ("id BIGINT, name STRING");
  *                         ignored (may be empty) when `format` is avro —
  *                         the Avro writer schema defines the columns
  * @param keepMetaColumns  surface topic/partition/offset/timestamp/key as
  *                         `_kafka_*` columns next to the decoded fields —
  *                         (`_kafka_topic`,`_kafka_partition`,`_kafka_offset`)
  *                         is the natural record key for exactly-once
  *                         upserts under re-delivery, and `_kafka_timestamp`
  *                         a natural precombine (ref: KafkaOffsetGen.java
  *                         offset-range tracking)
  * @param jsonOptions      passed to `from_json`; `mode` defaults to
  *                         FAILFAST so a corrupt record fails the batch
  *                         loudly instead of silently writing nulls
  * @param dropUndecodable  route corrupt records out of the batch instead
  *                         of failing it (PERMISSIVE + drop null rows;
  *                         for avro, skip values the datum reader rejects)
  * @param format           value encoding: `json` (default) or `avro`
  * @param avroSchemaJson   the Avro writer schema (JSON) when `format` is
  *                         avro; load from an .avsc on DFS with
  *                         [[AvroDecode.schemaFromFile]] for the
  *                         reference's file-based-schema-provider shape
  * @param avroConfluentWireFormat values carry the Confluent 5-byte
  *                         header (magic + schema id) before the datum —
  *                         stripped per [[AvroDecode.decodeFrame]]
  * @param schemaRegistryUrl with `format = "avro"` and no explicit
  *                         `avroSchemaJson`: resolve the writer schema
  *                         from a Confluent-compatible registry by the
  *                         id embedded in the batch's first framed value
  *                         (implies `avroConfluentWireFormat`; ref:
  *                         SchemaRegistryProvider.java). One writer
  *                         schema per batch, the same contract as the
  *                         reference's provider
  * @param schemaRegistryAuth config-based registry credentials —
  *                         `basic.auth.user.info` = "user:pass" or
  *                         `bearer.auth.token` = token (the Confluent
  *                         client's config keys; takes precedence over
  *                         URL userinfo, so secrets can stay out of
  *                         connection strings)
  */
final case class KafkaPayloadConfig(
    valueSchemaDdl: String,
    keepMetaColumns: Boolean = true,
    jsonOptions: Map[String, String] = Map.empty,
    dropUndecodable: Boolean = false,
    format: String = "json",
    avroSchemaJson: Option[String] = None,
    avroConfluentWireFormat: Boolean = false,
    schemaRegistryUrl: Option[String] = None,
    schemaRegistryAuth: Map[String, String] = Map.empty)

object KafkaPayloadConfig {
  /** Avro-value frame config (ref: AvroKafkaSource.java:49). */
  def avro(
      schemaJson: String,
      keepMetaColumns: Boolean = true,
      dropUndecodable: Boolean = false,
      confluentWireFormat: Boolean = false): KafkaPayloadConfig =
    KafkaPayloadConfig("", keepMetaColumns, Map.empty, dropUndecodable,
      format = "avro", avroSchemaJson = Some(schemaJson),
      avroConfluentWireFormat = confluentWireFormat)
}

/** JDBC pull source: connection + table + optional incremental column
  * (ref: hudi-utilities/.../sources/JdbcSource.java Config — url, user,
  * password, driver.class, table.name, incr.column.name, extra.options).
  *
  * @param url               JDBC url (`jdbc:derby:...`, `jdbc:postgresql:...`)
  * @param table             table name (or a `(subquery) alias` the DB accepts)
  * @param incrementalColumn monotonically increasing column for checkpointed
  *                          pulls (an id sequence or update timestamp). None =
  *                          full refetch each round, no checkpoint recorded.
  * @param extraOptions      passed through to Spark's JDBC reader
  *                          (fetchsize, partitionColumn/numPartitions, ...)
  */
final case class JdbcSourceConfig(
    url: String,
    table: String,
    user: String = "",
    password: String = "",
    driver: String = "",
    incrementalColumn: Option[String] = None,
    extraOptions: Map[String, String] = Map.empty)

/** DeltaStreamer-equivalent ingest runner: source -> transformer ->
  * upsert, with the resume checkpoint stored IN the commit metadata so a
  * restarted runner continues exactly where the last durable commit left
  * off — no side-channel state
  * (ref: hudi-utilities/.../deltastreamer/HoodieDeltaStreamer.java:756,
  * checkpoint protocol DeltaSync.java:311-400, DFS sources under
  * hudi-utilities/.../sources/ whose checkpoint is the max file
  * modification time already processed).
  *
  * Kafka-style sources need no equivalent here: Structured Streaming into
  * [[graft.streaming.GraftStreamingSink]] already provides offset-tracked
  * continuous ingest; this runner covers the batch/cron DFS pull that the
  * reference's DeltaStreamer serves in production.
  */
object IngestRunner {

  /** Commit-metadata key carrying the source checkpoint
    * (ref: DeltaSync CHECKPOINT_KEY).
    */
  val CheckpointKey = "ingest.checkpoint"

  /** Write one synced batch. Plain mode dispatches through the
    * datasource writer; CDC mode turns op-D rows into keyed deletes and
    * everything else into upserts, committed together (the graft
    * mergeWrite commit — no per-op partitioning of the batch). A batch
    * without the op column is plain inserts, like the reference
    * transformer that adds `Op = I` when absent.
    */
  private def writeBatch(
      spark: SparkSession, cfg: IngestConfig, batch: DataFrame, ckpt: String): Unit =
    writeBatch(spark, cfg, batch, extra = Map(CheckpointKey -> ckpt))

  private def writeBatch(
      spark: SparkSession, cfg: IngestConfig, batch: DataFrame,
      extra: Map[String, String]): Unit =
    cfg.cdcOpColumn.filter(batch.columns.contains) match {
      case None =>
        GraftWriter.write(
          spark, SaveMode.Append,
          cfg.tableOptions ++ Map(
            GraftOptions.Path -> cfg.targetPath,
            GraftOptions.Operation -> cfg.operation),
          batch,
          extra = extra)
      case Some(op) =>
        val del = "_g_cdc_delete"
        val marked = batch
          .withColumn(del, upper(col(op).cast("string")) === "D")
          .drop(op)
        val table = GraftTable.getOrCreate(spark, cfg.targetPath,
          GraftOptions.tableConfig(cfg.targetPath, cfg.tableOptions))
        new graft.write.GraftWriteClient(table,
          GraftOptions.writeConfig(cfg.tableOptions)
            .copy(commitExtra = extra))
          .mergeWrite(marked, del)
    }

  /** Decode a Kafka-schema frame's binary JSON `value` into typed
    * columns (see [[KafkaPayloadConfig]]). Pure column expressions
    * evaluated inside the scan task — no shuffle, no driver round-trip
    * at any scale (`from_json` itself is a CodegenFallback expression,
    * so it splits the whole-stage-codegen span; that is the standard
    * cost of JSON parsing in Spark and per-row work is parser-bound
    * either way). Works the same on a batch frame and a streaming one.
    */
  def decodeKafkaFrame(rawDf: DataFrame, cfg: KafkaPayloadConfig): DataFrame = {
    import org.apache.spark.sql.functions.{decode => _, _}
    require(rawDf.columns.contains("value"),
      s"Kafka frame must carry a `value` column; got ${rawDf.columns.mkString(", ")}")
    // null values are compacted-topic tombstones, not payloads: JSON
    // parsing would pass them through as all-null data rows (from_json of
    // null is null, so neither the corrupt-record column nor FAILFAST
    // fires) and a keyed write then fails or upserts garbage. Deletes
    // belong in a cdcOpColumn feed; tombstone frames are dropped here.
    val df = rawDf.filter(col("value").isNotNull)
    if (cfg.format == "avro") {
      val schema = cfg.avroSchemaJson
        .orElse(cfg.schemaRegistryUrl.map { url =>
          // fetch-by-id seam: the Confluent frame's first value names its
          // writer schema; ids are immutable so the fetch memoizes. One
          // driver-side limit(1) job — the id, not the data, is needed
          val first = df.select("value").limit(1).collect()
          require(first.nonEmpty,
            "cannot resolve a registry schema id from an empty batch; " +
              "set avroSchemaJson for empty-batch tolerance")
          SchemaRegistryProvider.fetchById(url,
            SchemaRegistryProvider.wireSchemaId(first.head.getAs[Array[Byte]](0)),
            cfg.schemaRegistryAuth)
        })
        .getOrElse(sys.error(
          "format=avro needs avroSchemaJson (see AvroDecode.schemaFromFile) " +
            "or schemaRegistryUrl"))
      return AvroDecode.decodeFrame(df, schema, cfg.keepMetaColumns,
        cfg.dropUndecodable,
        cfg.avroConfluentWireFormat || cfg.schemaRegistryUrl.nonEmpty)
    }
    val parsed = "_g_kafka_parsed"
    val corrupt = "_g_kafka_corrupt"
    val meta = Seq("topic", "partition", "offset", "timestamp", "key")
      .filter(df.columns.contains)
      .map(c => col(c).as(s"_kafka_$c"))
    val fields = org.apache.spark.sql.types.StructType
      .fromDDL(cfg.valueSchemaDdl).fieldNames.toSeq
    if (cfg.dropUndecodable) {
      // PERMISSIVE from_json yields a row of NULLS for a corrupt record
      // (not a null struct), indistinguishable from legitimate all-null
      // data — the corrupt-record column disambiguates
      val opts = cfg.jsonOptions +
        ("mode" -> "PERMISSIVE") + ("columnNameOfCorruptRecord" -> corrupt)
      df.withColumn(parsed, from_json(col("value").cast("string"),
          s"${cfg.valueSchemaDdl}, $corrupt STRING", opts))
        .filter(col(s"$parsed.$corrupt").isNull)
        .select(fields.map(f => col(s"$parsed.$f")) ++
          (if (cfg.keepMetaColumns) meta else Seq.empty): _*)
    } else {
      val opts = Map("mode" -> "FAILFAST") ++ cfg.jsonOptions
      df.withColumn(parsed,
          from_json(col("value").cast("string"), cfg.valueSchemaDdl, opts))
        .select(fields.map(f => col(s"$parsed.$f")) ++
          (if (cfg.keepMetaColumns) meta else Seq.empty): _*)
    }
  }

  /** Flatten nested STRUCT columns into top-level columns named by the
    * `_`-joined field path (`fare.currency` → `fare_currency`), depth
    * first in declaration order — the reference's flattening transformer
    * contract (ref: transform/FlatteningTransformer.java:56-83). Arrays
    * and maps pass through unexploded, exactly like the reference
    * ("currently doesn't unnest arrays"). Pure projection: column
    * expressions only, codegen-friendly, no shuffle.
    */
  def flatten(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.StructType
    def expand(c: Column, dt: org.apache.spark.sql.types.DataType,
        path: Seq[String]): Seq[Column] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          expand(c.getField(f.name), f.dataType, path :+ f.name))
      case _ => Seq(c.as(path.mkString("_")))
    }
    // backtick-quote top-level names (escaping embedded backticks by
    // doubling): a column literally named "a.b" would otherwise parse
    // as nested-field access
    df.select(df.schema.fields.toSeq.flatMap(f =>
      expand(col("`" + f.name.replace("`", "``") + "`"),
        f.dataType, Seq(f.name))): _*)
  }

  /** Apply the config's transformer chain: structural flattening first
    * (when configured), then `transformerSql`, then each of
    * `transformers` in order, every step reading the previous output as
    * the temp view `source`
    * (ref: SqlQueryBasedTransformer + FlatteningTransformer +
    * ChainedTransformer).
    */
  private def transform(
      spark: SparkSession, cfg: IngestConfig, raw: DataFrame): DataFrame = {
    val base = if (cfg.flattenNested) flatten(raw) else raw
    val fromFile = cfg.transformerSqlFile.toSeq.flatMap { f =>
      // a ;-separated template file; every statement runs in order over
      // the view `source`, the LAST result is the payload (ref:
      // SqlFileBasedTransformer.java:56-82 — CACHE TABLE prelude +
      // final SELECT)
      readUtf8(spark, f).split(';').map(_.trim).filter(_.nonEmpty).toSeq
    }
    val cacheTable = "(?is)\\s*CACHE\\s+(?:LAZY\\s+)?TABLE\\s+([\\w.]+).*".r
    // `source` (and any CACHE TABLE names) are SESSION-GLOBAL temp views:
    // two pipelines transforming concurrently on one SparkSession would
    // read each other's batches. spark.sql resolves views EAGERLY at
    // Dataset creation (the returned plan no longer references the view),
    // so serializing the chain closes the race without holding the lock
    // through the downstream write.
    transformMonitor.synchronized {
      (cfg.transformerSql.toSeq ++ fromFile ++ cfg.transformers)
        .foldLeft(base) { (df, sql) =>
          df.createOrReplaceTempView("source")
          // the template re-runs EVERY sync round, but CACHE TABLE x AS
          // fails once x exists — drop the previous round's view first
          // (dropTempView also uncaches its data)
          sql match {
            case cacheTable(name) => spark.catalog.dropTempView(name)
            case _                =>
          }
          val out = spark.sql(sql)
          // a side-effect statement (CACHE TABLE ...) keeps the running
          // payload; only a result-bearing statement replaces it
          if (out.schema.isEmpty) df else out
        }
    }
  }

  /** Serializes transformer-chain view registration (see [[transform]]). */
  private val transformMonitor = new Object

  /** Whole small text file off any Hadoop filesystem (SQL templates,
    * schema files).
    */
  private def readUtf8(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val in = p.getFileSystem(spark.sessionState.newHadoopConf()).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** The checkpoint of the last commit that recorded one, read newest
    * first from the target's timeline (ref: DeltaSync.java:311-355).
    */
  def lastCheckpoint(spark: SparkSession, targetPath: String): Option[String] =
    if (!GraftTable.exists(spark, targetPath)) None
    else {
      val t = GraftTable.load(spark, targetPath)
      t.timeline.completedData.reverseIterator
        .map(i => t.timeline.metadataOf(i).extra.get(CheckpointKey))
        .collectFirst { case Some(v) => v }
    }

  /** Data files under `dir` (recursive), skipping hidden/marker entries. */
  private def listDataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Seq.empty
      else if (st.isDirectory) listDataFiles(fs, st.getPath)
      else Seq(st)
    }
  }

  /** Prune a date-partitioned source tree to the lookback window —
    * `<root>/(any fixed levels)/<date or field=date>/...` with the date
    * dirs at exactly `depth` levels below the root (ref:
    * DatePartitionPathSelector.java:175-221). Only dirs whose date falls
    * in `[currentDate - lookbackDays, currentDate]` are listed further,
    * so a source holding years of daily drops costs a listing of the
    * window, not the history. A non-date name at the date depth is a
    * loud failure, like the reference's parse.
    */
  private def pruneDatePartitions(
      fs: FileSystem, root: Path, dp: DatePartitionConfig): Seq[Path] = {
    if (dp.depth <= 0) return Seq(root)
    var level: Seq[Path] = Seq(root)
    for (_ <- 0 until dp.depth)
      level = level.flatMap { p =>
        fs.listStatus(p).toSeq.filter { st =>
          st.isDirectory && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith(".")
        }.map(_.getPath)
      }
    val fmt = java.time.format.DateTimeFormatter.ofPattern(dp.dateFormat)
    val cur = dp.currentDate.map(java.time.LocalDate.parse)
      .getOrElse(java.time.LocalDate.now())
    val from = cur.minusDays(dp.lookbackDays.toLong)
    level.filter { p =>
      val name = p.getName
      val ds =
        if (!name.contains("=")) name
        else {
          val s = name.split("=")
          require(s.length == 2, s"date partition dir not in expected format: $name")
          s(1)
        }
      val d = java.time.LocalDate.parse(ds, fmt)
      !d.isBefore(from) && !d.isAfter(cur)
    }
  }

  /** Bound a round to ~`limit` bytes of source files, oldest mod-times
    * first, WITHOUT splitting an mtime group: the checkpoint is an mtime
    * with strictly-greater resume semantics, so cutting inside a group
    * would silently skip its same-mtime leftovers next round. The first
    * group always ships even when alone over the limit (ref:
    * DatePartitionPathSelector.java:146-160 — the break requires the
    * file's mtime to exceed the rolling checkpoint).
    */
  private def capByMtimeGroups(
      files: Seq[FileStatus], limit: Long): Seq[FileStatus] = {
    val groups = files.groupBy(_.getModificationTime).toSeq.sortBy(_._1)
    val out = Seq.newBuilder[FileStatus]
    var bytes = 0L
    var stop = false
    groups.foreach { case (_, grp) =>
      val sz = grp.map(_.getLen).sum
      if (!stop && (bytes == 0L || bytes + sz <= limit)) {
        out ++= grp
        bytes += sz
      } else stop = true
    }
    out.result()
  }

  /** One sync round: ingest source files newer than the stored
    * checkpoint; returns the new checkpoint, or None when the source had
    * nothing new. Files sharing the exact boundary mod-time are treated
    * as already processed (strictly-greater semantics), matching the
    * reference's DFSPathSelector contract that a batch's boundary instant
    * belongs to the batch that recorded it. With `maxBytesPerRound` a
    * too-large backlog drains across several commits (call until None);
    * with `datePartition` only the lookback window of a date-partitioned
    * tree is even listed.
    */
  def runOnce(spark: SparkSession, cfg: IngestConfig): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val srcDir = new Path(cfg.sourcePath)
    val fs = srcDir.getFileSystem(conf)
    val ckpt = lastCheckpoint(spark, cfg.targetPath).map(_.toLong).getOrElse(-1L)
    val roots = cfg.datePartition
      .map(pruneDatePartitions(fs, srcDir, _)).getOrElse(Seq(srcDir))
    val eligible = roots.flatMap(listDataFiles(fs, _))
      .filter(_.getModificationTime > ckpt)
    if (eligible.isEmpty) return None
    val fresh = cfg.maxBytesPerRound
      .map(capByMtimeGroups(eligible, _)).getOrElse(eligible)
    val newCkpt = fresh.map(_.getModificationTime).max

    // "avro" means Object Container Files, read through our splittable
    // avro-core scan (no spark-avro module on the classpath); everything
    // else is a Spark batch format (ref: AvroDFSSource.java vs
    // ParquetDFSSource/JsonDFSSource/CsvDFSSource)
    val raw =
      if (cfg.sourceFormat == "avro")
        AvroDecode.readAvroFiles(spark, fresh.map(_.getPath.toString),
          cfg.avroReaderSchema)
      else {
        val reader = spark.read.format(cfg.sourceFormat)
          .options(cfg.sourceOptions - "schema")
        cfg.sourceOptions.get("schema").foreach(reader.schema)
        reader.load(fresh.map(_.getPath.toString): _*)
      }
    val decoded = cfg.kafkaPayload.map(decodeKafkaFrame(raw, _)).getOrElse(raw)
    val batch = transform(spark, cfg, decoded)
    writeBatch(spark, cfg, batch, newCkpt.toString)
    Some(newCkpt.toString)
  }

  /** One-shot SQL backfill round (ref: SqlSource.java:36-50 — "used
    * mainly for backfill jobs"): the batch is `spark.sql(sourceSql)` over
    * any registered table/view, run through the same transformer chain
    * and CDC-aware write as a DFS batch. The recorded checkpoint CARRIES
    * FORWARD the target's last value — or none when the table has never
    * recorded one — so a backfill commit never disturbs the regular
    * incremental source's resume point (the reference re-stamps the
    * latest successful checkpoint for exactly this reason).
    */
  def runSqlOnce(spark: SparkSession, cfg: IngestConfig, sourceSql: String): Unit = {
    val batch = transform(spark, cfg, spark.sql(sourceSql))
    writeBatch(spark, cfg, batch,
      extra = lastCheckpoint(spark, cfg.targetPath).map(CheckpointKey -> _).toMap)
  }

  /** One JDBC sync round (ref: JdbcSource.java fetch/incrementalFetch/
    * checkpoint): with no stored checkpoint the whole table is pulled;
    * afterwards the pull is `WHERE incrColumn > checkpoint`, pushed INTO
    * the database as a dbtable subquery so the DB's own index serves the
    * scan — Spark never sees already-synced rows. The new checkpoint is
    * `max(incrColumn)` of the pulled batch rendered as a string, stored
    * through the same commit-metadata protocol as the DFS source, and the
    * batch is persisted across the (max, write) pair so a concurrent DB
    * writer can't desync checkpoint from data. Strictly-greater
    * semantics, like the reference: rows that later land with an
    * incremental value <= the recorded checkpoint are never pulled — use
    * an insert-ordered sequence or a commit timestamp as the column.
    * Returns the new checkpoint; None when the source had nothing new OR
    * the round was a full refresh (incrementalColumn = None), which
    * records no checkpoint of its own and carries the target's last one
    * forward untouched.
    */
  def runJdbcOnce(
      spark: SparkSession, cfg: IngestConfig, jdbc: JdbcSourceConfig): Option[String] = {
    val ckpt = lastCheckpoint(spark, cfg.targetPath).getOrElse("")
    val raw = jdbcBatchFrame(spark, jdbc, ckpt)
    jdbc.incrementalColumn match {
      case Some(c) =>
        val pulled = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        try {
          val newCkpt = pulled.agg(
            org.apache.spark.sql.functions.max(col(c)).cast("string")).head.getString(0)
          if (newCkpt == null) None // empty batch: no commit, keep checkpoint
          else {
            writeBatch(spark, cfg, transform(spark, cfg, pulled), newCkpt)
            Some(newCkpt)
          }
        } finally pulled.unpersist()
      case None =>
        // full-refresh mode records NO checkpoint of its own — carry the
        // target's last one forward (like runSqlOnce) so a mixed
        // pipeline's incremental resume point survives. Storing "" here
        // would reset the resume point AND wedge a DFS-fed target whose
        // next round parses the checkpoint as a number.
        writeBatch(spark, cfg, transform(spark, cfg, raw),
          extra = lastCheckpoint(spark, cfg.targetPath).map(CheckpointKey -> _).toMap)
        None
    }
  }

  /** The un-pulled batch frame for one JDBC sync round: the incremental
    * `WHERE incrColumn > ckpt` subquery (empty ckpt = full table) with
    * stride partitioning resolved. Exposed so tests can assert the plan
    * shape (partition count) without driving a full ingest round;
    * package-private so external callers can't bypass runJdbcOnce's
    * checkpoint/commit protocol with an arbitrary ckpt string.
    */
  private[graft] def jdbcBatchFrame(
      spark: SparkSession, jdbc: JdbcSourceConfig, ckpt: String): DataFrame = {
    // DataFrameReader is MUTABLE — every metadata probe gets its own
    // instance so a probe's dbtable never leaks into the batch pull
    def baseReader() = {
      var r = spark.read.format("jdbc")
        .option("url", jdbc.url).options(jdbc.extraOptions)
      if (jdbc.user.nonEmpty)
        r = r.option("user", jdbc.user).option("password", jdbc.password)
      if (jdbc.driver.nonEmpty) r = r.option("driver", jdbc.driver)
      r
    }
    var reader = baseReader()
    // Incremental column's DB type: one metadata round-trip on the plain
    // table, fetched only when a decision needs it (checkpoint quoting,
    // auto-partitioned pulls).
    lazy val incrType: Option[org.apache.spark.sql.types.DataType] =
      jdbc.incrementalColumn.flatMap(c =>
        baseReader().option("dbtable", jdbc.table).load().schema
          .find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    // Quoting follows the incremental column's DB type, not the
    // checkpoint's rendering: a DOUBLE max like '1.0E7' fails a digits
    // regex yet must stay unquoted (strict-typed DBs reject DOUBLE >
    // CHAR), and a numeric-looking VARCHAR checkpoint must stay quoted to
    // keep the string-max semantics it was recorded under.
    // The column gets ANSI double quotes: Spark's JDBC writer creates
    // case-sensitive lowercase identifiers, which an unquoted name
    // would fail to resolve on case-folding DBs (Derby, Postgres).
    lazy val ckptLiteral: String = incrType match {
      case Some(_: org.apache.spark.sql.types.NumericType) => ckpt
      case _ => s"'${ckpt.replace("'", "''")}'"
    }
    val dbtable = jdbc.incrementalColumn match {
      case Some(c) if ckpt.nonEmpty =>
        s"""(SELECT * FROM ${jdbc.table} WHERE "$c" > $ckptLiteral) g_incr"""
      case _ => jdbc.table
    }
    reader = reader.option("dbtable", dbtable)
    // Parallel pull: a big backlog through one JDBC connection is the
    // scale bottleneck. When the caller asks for `numPartitions` without
    // an explicit partitionColumn, derive stride bounds from the DB's own
    // min/max of the incremental column over THIS batch (one 1-row query
    // the DB serves from its index) so the batch arrives as numPartitions
    // concurrent range scans. Integral columns only — Spark parses the
    // bounds as longs. Spark leaves the first/last stride predicates
    // unbounded, so rows landing between the bounds probe and the pull
    // are still fetched; the checkpoint stays max(pulled), unaffected.
    val autoPartition =
      jdbc.extraOptions.get("numPartitions").exists(_.toInt > 1) &&
        !jdbc.extraOptions.contains("partitionColumn")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    (jdbc.incrementalColumn, if (autoPartition) incrType else None) match {
      case (Some(c), Some(ByteType | ShortType | IntegerType | LongType)) =>
        val batchFilter = if (ckpt.nonEmpty) s""" WHERE "$c" > $ckptLiteral""" else ""
        val boundsTable =
          s"""(SELECT MIN("$c") AS g_lo, MAX("$c") AS g_hi FROM ${jdbc.table}$batchFilter) g_bounds"""
        val bdf = baseReader().option("dbtable", boundsTable).load()
        val bounds = bdf.select(bdf.columns.map(cn => col(cn).cast("long")): _*).head()
        if (!bounds.isNullAt(0) && bounds.getLong(0) < bounds.getLong(1))
          reader = reader
            .option("partitionColumn", c)
            .option("lowerBound", bounds.getLong(0).toString)
            .option("upperBound", bounds.getLong(1).toString)
      case _ => ()
    }
    reader.load()
  }

  /** Table-to-table incremental ETL: pull the SOURCE graft table's
    * commits after the stored checkpoint (checkpoint = last pulled
    * source instant), optionally transform, and write into the target —
    * the reference's HoodieIncrSource, which chains an incremental read
    * into a DeltaStreamer write so downstream tables stay in sync
    * without rescanning the source
    * (ref: hudi-utilities/.../sources/HoodieIncrSource.java).
    * `cfg.sourcePath` must be a graft table base path; `sourceFormat`
    * is ignored. Returns the new checkpoint (the last source instant
    * pulled), or None when the source has nothing new. Like the
    * reference source, hard deletes do not flow downstream (the
    * incremental view drops tombstones); model replicated deletes as
    * soft-delete columns in the data.
    */
  def runIncrementalOnce(spark: SparkSession, cfg: IngestConfig): Option[String] = {
    require(GraftTable.exists(spark, cfg.sourcePath),
      s"incremental ingest source is not a graft table: ${cfg.sourcePath}")
    val src = GraftTable.load(spark, cfg.sourcePath)
    val ckpt = lastCheckpoint(spark, cfg.targetPath).getOrElse("")
    // hollow-commit guard: see GraftTimeline.safeIncrementalEnd
    val latest = src.timeline.safeIncrementalEnd.getOrElse("")
    if (latest.isEmpty || latest <= ckpt) return None
    val read = new graft.read.GraftReadClient(src)
    val raw = read.dataOnly(read.incremental(ckpt, Some(latest)))
    val batch = transform(spark, cfg, raw)
    writeBatch(spark, cfg, batch, latest)
    Some(latest)
  }

  /** Table-to-table CDC ETL: like [[runIncrementalOnce]], but pulls the
    * source's per-commit CHANGE FEED (GraftReadClient.changes), so hard
    * deletes replicate downstream — the one thing a plain incremental
    * pull cannot see (tombstoned rows simply vanish from it). Per key,
    * the band's newest change wins (a delete then re-insert nets to the
    * re-insert); update pre-images are dropped; the surviving rows apply
    * as ONE mixed upsert/delete commit through the same path as the
    * op-column CDC apply mode. Transformers run on the change rows and
    * must carry `_change_type` and `_change_ordinal` through.
    * Checkpoint = last pulled source instant, stored in the commit.
    */
  def runCdcOnce(spark: SparkSession, cfg: IngestConfig): Option[String] = {
    require(GraftTable.exists(spark, cfg.sourcePath),
      s"CDC ingest source is not a graft table: ${cfg.sourcePath}")
    val src = GraftTable.load(spark, cfg.sourcePath)
    val ckpt = lastCheckpoint(spark, cfg.targetPath).getOrElse("")
    // hollow-commit guard: see GraftTimeline.safeIncrementalEnd
    val latest = src.timeline.safeIncrementalEnd.getOrElse("")
    if (latest.isEmpty || latest <= ckpt) return None
    val read = new graft.read.GraftReadClient(src)
    val ch = transform(spark, cfg, read.changes(ckpt, Some(latest)))
    require(ch.columns.contains("_change_type") && ch.columns.contains("_change_ordinal"),
      "CDC transformers must keep the _change_type and _change_ordinal columns")
    // newest change per key wins within the band. Key scope matches how
    // the TARGET applies keys: with a global index, a partition move in
    // the band arrives as delete(old partition) + insert(new partition)
    // that both resolve to the SAME target row — windowing them apart
    // would apply both in one commit with an arbitrary winner (the
    // _change_ordinal that encodes true order is dropped below), so the
    // window must collapse to record-key-only and let the band's newest
    // change win. Per-partition targets keep (partition, key): there the
    // two changes address distinct rows and both must apply.
    val targetWc = GraftOptions.writeConfig(cfg.tableOptions)
    val keyScope =
      if (targetWc.globalIndex) src.config.recordKeyFields
      else src.config.partitionSourceFields ++ src.config.recordKeyFields
    val keyCols = keyScope.map(src.logicalNameOf).distinct
    // within ONE commit a move is delete + insert at the SAME ordinal
    // (the change-set joins per commit); the net effect of that commit is
    // the row at its new partition, so non-deletes win the ordinal tie
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_change_ordinal").desc,
        (col("_change_type") === "delete").asc)
    val del = "_g_cdc_delete"
    val marked = ch
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("_g_cdc_rn", row_number().over(w))
      .filter(col("_g_cdc_rn") === 1)
      .withColumn(del, col("_change_type") === "delete")
      .drop("_g_cdc_rn", "_change_type", "_change_ordinal")
    val table = GraftTable.getOrCreate(spark, cfg.targetPath,
      GraftOptions.tableConfig(cfg.targetPath, cfg.tableOptions))
    new graft.write.GraftWriteClient(table,
      targetWc.copy(commitExtra = Map(CheckpointKey -> latest)))
      .mergeWrite(marked, del)
    Some(latest)
  }

  /** Continuous mode: poll-and-sync until `maxRounds` syncs ran or
    * `maxIdleRounds` consecutive polls found nothing
    * (ref: HoodieDeltaStreamer --continuous sync loop,
    * DeltaSync.java:262-306; inline compaction runs through the normal
    * post-write services of each commit).
    */
  def runContinuous(
      spark: SparkSession,
      cfg: IngestConfig,
      maxRounds: Int,
      maxIdleRounds: Int = 1,
      pollIntervalMs: Long = 0L): Int = {
    // per-round sync metrics when the table options turn metrics on
    // (ref: HoodieDeltaStreamerMetrics.overallTimerContext — the
    // fetch+transform+commit wall time of one sync round, the lag number
    // a continuous-ingest operator watches; commit-level metrics flow
    // from the write client independently)
    val metricsOn = graft.spark.GraftOptions.writeConfig(cfg.tableOptions).metricsOn
    // same naming rule as GraftOptions.tableConfig, without its
    // required-key validation (this loop may target an existing table)
    lazy val tn = cfg.tableOptions.getOrElse(
      graft.spark.GraftOptions.TableName,
      cfg.targetPath.stripSuffix("/").split('/').last)
    var synced = 0
    var idle = 0
    while (synced < maxRounds && idle < maxIdleRounds) {
      val t0 = System.nanoTime()
      runOnce(spark, cfg) match {
        case Some(_) =>
          synced += 1; idle = 0
          if (metricsOn) {
            val ms = (System.nanoTime() - t0) / 1000000
            graft.metrics.GraftMetrics.setGauge(s"$tn.ingest.syncDuration", ms)
            graft.metrics.GraftMetrics.time(s"$tn.ingest.syncTimer", ms)
            graft.metrics.GraftMetrics.inc(s"$tn.ingest.rounds")
          }
        case None =>
          idle += 1
          if (metricsOn) graft.metrics.GraftMetrics.inc(s"$tn.ingest.idlePolls")
      }
      if (pollIntervalMs > 0 && synced < maxRounds && idle < maxIdleRounds)
        Thread.sleep(pollIntervalMs)
    }
    synced
  }

  /** Multi-table ingest: one sync round per config, sequential driver
    * loop (ref: HoodieMultiTableDeltaStreamer.java).
    */
  def runMulti(spark: SparkSession, cfgs: Seq[IngestConfig]): Seq[Option[String]] =
    cfgs.map(runOnce(spark, _))

}
