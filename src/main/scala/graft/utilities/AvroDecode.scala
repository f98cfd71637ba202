package graft.utilities

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.avro.{Conversions, LogicalTypes, Schema}
import org.apache.avro.Schema.Type._
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericFixed, GenericRecord, IndexedRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Binary-Avro payload decoding for Kafka-shaped frames, built directly
  * on avro-core (`GenericDatumReader`) — no spark-avro module needed.
  *
  * This is the engine's equivalent of the reference's Avro source family:
  * the value bytes of each frame are decoded against a caller-provided
  * writer schema (the reference reads it off DFS through
  * `FilebasedSchemaProvider`) and surfaced as typed columns
  * (ref: hudi-utilities/src/main/java/org/apache/hudi/utilities/sources/
  * AvroKafkaSource.java:49-84, AvroDFSSource.java,
  * schema/FilebasedSchemaProvider.java:38-68).
  *
  * Scale notes: decoding runs entirely inside the scan task via
  * `mapPartitions` — one `Schema.Parser`/`GenericDatumReader` per
  * partition, the `BinaryDecoder` reused across rows, no shuffle and no
  * driver round-trip at any input size. The per-row cost is the Avro
  * parse itself, the same work `from_avro` would do (both sit outside
  * whole-stage codegen; JSON's `from_json` has the identical property).
  */
object AvroDecode {

  /** Spark type for an Avro schema. Unions are supported in the
    * `[null, T]` nullable-branch form (the shape every Avro-producing
    * pipeline uses for optional fields); multi-branch unions have no
    * Spark column type and fail loudly. Logical types map like
    * spark-avro: decimal(bytes|fixed) → DecimalType, date → DateType,
    * timestamp-millis/micros → TimestampType; other logical annotations
    * fall back to their base primitive.
    */
  def sparkType(s: Schema): DataType = s.getType match {
    case RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))
      })
    case UNION =>
      sparkType(unionBranch(s))
    case ARRAY =>
      ArrayType(sparkType(s.getElementType), containsNull = isNullable(s.getElementType))
    case MAP =>
      MapType(StringType, sparkType(s.getValueType),
        valueContainsNull = isNullable(s.getValueType))
    case STRING | ENUM => StringType
    case BYTES | FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _                       => BinaryType
      }
    case INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _                    => IntegerType
      }
    case LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          TimestampType
        case _ => LongType
      }
    case FLOAT   => FloatType
    case DOUBLE  => DoubleType
    case BOOLEAN => BooleanType
    case NULL    => NullType
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == NULL ||
      (s.getType == UNION && s.getTypes.asScala.exists(_.getType == NULL))

  /** The single non-null branch of a union (`[null, T]` or `[T]`). */
  private def unionBranch(s: Schema): Schema = {
    val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
    require(nonNull.size == 1,
      s"unsupported Avro union ${s}: only [null, T] unions map to a Spark column")
    nonNull.head
  }

  /** Avro datum → Spark external row value (Utf8 → String, ByteBuffer →
    * Array[Byte], logical decimal/date/timestamp → BigDecimal /
    * java.sql.Date / java.sql.Timestamp, record → Row, list/map → Scala).
    * Always copies byte content out of Avro's reused buffers — the
    * datum reader recycles records across rows.
    */
  private def convert(v: Any, s: Schema, dec: Conversions.DecimalConversion): Any = {
    if (v == null) return null
    s.getType match {
      case UNION =>
        val idx = GenericData.get.resolveUnion(s, v)
        convert(v, s.getTypes.get(idx), dec)
      case NULL => null
      case RECORD =>
        val rec = v.asInstanceOf[IndexedRecord]
        val fields = s.getFields
        val out = new Array[Any](fields.size)
        var i = 0
        while (i < fields.size) {
          out(i) = convert(rec.get(i), fields.get(i).schema, dec)
          i += 1
        }
        Row.fromSeq(out.toIndexedSeq)
      case ARRAY =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq
          .map(convert(_, s.getElementType, dec))
      case MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> convert(x, s.getValueType, dec) }
          .toMap
      case STRING | ENUM => v.toString
      case BYTES =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            dec.fromBytes(v.asInstanceOf[ByteBuffer].duplicate(), s, d)
          case _ =>
            val bb = v.asInstanceOf[ByteBuffer].duplicate()
            val a = new Array[Byte](bb.remaining())
            bb.get(a)
            a
        }
      case FIXED =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            dec.fromFixed(v.asInstanceOf[GenericFixed], s, d)
          case _ => v.asInstanceOf[GenericFixed].bytes.clone()
        }
      case INT =>
        s.getLogicalType match {
          case _: LogicalTypes.Date =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          case _ => v
        }
      case LONG =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            new java.sql.Timestamp(v.asInstanceOf[Long])
          case _: LogicalTypes.TimestampMicros =>
            val us = v.asInstanceOf[Long]
            val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            ts
          case _ => v
        }
      case _ => v // BOOLEAN, FLOAT, DOUBLE arrive as their boxed JVM type
    }
  }

  /** Decode a Kafka-schema frame's binary Avro `value` against
    * `schemaJson` (the writer schema, Avro JSON). Kafka metadata columns
    * surface as `_kafka_*` like the JSON path. Avro binary carries no
    * framing, so each value must be exactly one datum; a truncated or
    * garbled value throws (FAILFAST) or is dropped when
    * `dropUndecodable` — same corrupt-record contract as the JSON
    * decoder.
    *
    * `confluentWireFormat`: values produced by a Confluent-serializer
    * pipeline carry a 5-byte header (magic 0x0 + big-endian schema id)
    * before the Avro datum. The reference strips it via Confluent's
    * KafkaAvroDeserializer while forcing the provided source schema as
    * the reader (ref: deser/KafkaAvroSchemaDeserializer.java:68-77);
    * with no registry in the loop we do the same — validate the magic
    * byte, skip the id, decode with `schemaJson`. A wrong magic byte is
    * a corrupt record.
    */
  def decodeFrame(
      df: DataFrame,
      schemaJson: String,
      keepMetaColumns: Boolean = true,
      dropUndecodable: Boolean = false,
      confluentWireFormat: Boolean = false): DataFrame = {
    require(df.columns.contains("value"),
      s"Kafka frame must carry a `value` column; got ${df.columns.mkString(", ")}")
    val parsed = new Schema.Parser().parse(schemaJson)
    require(parsed.getType == RECORD,
      s"top-level Avro schema must be a record; got ${parsed.getType}")
    val valueStruct = sparkType(parsed).asInstanceOf[StructType]
    val meta =
      if (keepMetaColumns)
        Seq("topic", "partition", "offset", "timestamp", "key")
          .filter(df.columns.contains)
      else Seq.empty
    val in = df.select(col("value") +: meta.map(c => col(c).as(s"_kafka_$c")): _*)
    val outSchema = StructType(valueStruct.fields ++ in.schema.fields.drop(1))
    val nFields = valueStruct.fields.length
    val nMeta = meta.length
    in.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fields = schema.getFields
      val reader = new GenericDatumReader[GenericRecord](schema)
      val decConv = new Conversions.DecimalConversion()
      var decoder: BinaryDecoder = null
      var reuse: GenericRecord = null
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        try {
          // a null value (Kafka tombstone) carries no datum: referencing
          // bytes.length inside the catch's message would NPE a second
          // time and mask the real error
          require(bytes != null, "null Kafka value (compacted-topic " +
            "tombstone) — filter tombstones before decoding")
          val off =
            if (!confluentWireFormat) 0
            else {
              // >= 5: magic + 4-byte id with a ZERO-byte datum is a
              // well-formed frame (an empty record encodes to nothing)
              require(bytes.length >= 5 && bytes(0) == 0,
                s"not Confluent-framed: ${bytes.length} bytes, " +
                  s"magic ${if (bytes.isEmpty) "<none>" else bytes(0).toString}")
              5
            }
          decoder = DecoderFactory.get.binaryDecoder(bytes, off, bytes.length - off, decoder)
          reuse = reader.read(reuse, decoder)
          val out = new Array[Any](nFields + nMeta)
          var i = 0
          while (i < nFields) {
            out(i) = convert(reuse.get(i), fields.get(i).schema, decConv)
            i += 1
          }
          var j = 0
          while (j < nMeta) {
            out(nFields + j) = r.get(1 + j)
            j += 1
          }
          Iterator.single(Row.fromSeq(out.toIndexedSeq))
        } catch {
          case NonFatal(_) if dropUndecodable => Iterator.empty
          case NonFatal(e) =>
            throw new IllegalArgumentException(
              "undecodable Avro Kafka value (" +
                s"${if (bytes == null) "null" else bytes.length.toString} bytes); " +
                "set dropUndecodable to route corrupt records out", e)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Spark external row value → Avro datum against `s` (the writer
    * schema) — the exact inverse of [[convert]], used by
    * [[writeAvroFiles]]. Nulls pass through only when the schema has a
    * null branch.
    */
  private def toAvro(v: Any, s: Schema, dec: Conversions.DecimalConversion): Any = {
    if (v == null) {
      require(isNullable(s) || s.getType == NULL, s"null for non-nullable Avro $s")
      return null
    }
    s.getType match {
      case UNION => toAvro(v, unionBranch(s), dec)
      case RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        val fields = s.getFields
        var i = 0
        while (i < fields.size) {
          rec.put(i, toAvro(row.get(i), fields.get(i).schema, dec))
          i += 1
        }
        rec
      case ARRAY =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvro(_, s.getElementType, dec)).asJava
      case MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, x) => k -> toAvro(x, s.getValueType, dec) }.asJava
      case ENUM   => new GenericData.EnumSymbol(s, v.toString)
      case STRING => v.toString
      case BYTES =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            dec.toBytes(v.asInstanceOf[java.math.BigDecimal].setScale(d.getScale), s, d)
          case _ => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        }
      case FIXED =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            dec.toFixed(v.asInstanceOf[java.math.BigDecimal].setScale(d.getScale), s, d)
          case _ => new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
        }
      case INT =>
        s.getLogicalType match {
          case _: LogicalTypes.Date =>
            v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
          case _ => v
        }
      case LONG =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            v.asInstanceOf[java.sql.Timestamp].getTime
          case _: LogicalTypes.TimestampMicros =>
            val ts = v.asInstanceOf[java.sql.Timestamp]
            Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
              ts.getNanos / 1000L
          case _ => v
        }
      case _ => v // BOOLEAN, FLOAT, DOUBLE box as-is
    }
  }

  /** Distributed scan of Avro Object Container Files — the engine's
    * AvroDFSSource (ref: hudi-utilities/.../sources/AvroDFSSource.java:
    * 62-67, which delegates to AvroKeyInputFormat). OCF files are
    * block-structured behind 16-byte sync markers, so they SPLIT: each
    * task seeks to the first sync at-or-after its range start
    * (`DataFileReader.sync`) and drains blocks until one begins past its
    * range end (`pastSync`) — the same contract Hadoop's input format
    * uses, so a 10 GB file fans out across executors instead of pinning
    * one task. No driver round-trip of data; the driver only lists files
    * and plans ranges.
    *
    * `readerSchemaJson` resolves schema evolution (added fields take
    * their defaults, dropped fields are skipped — standard Avro reader/
    * writer resolution); when absent the writer schema is sniffed from
    * the first file's header.
    *
    * @param splitBytes target range size per task; defaults to
    *                   `spark.sql.files.maxPartitionBytes`
    */
  def readAvroFiles(
      spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String],
      readerSchemaJson: Option[String] = None,
      splitBytes: Long = 0L): DataFrame = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val conf = spark.sessionState.newHadoopConf()
    def list(p: Path): Seq[FileStatus] = {
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) Seq(st)
      else fs.listStatus(p).toSeq
        .filterNot(c => c.getPath.getName.startsWith("_") ||
          c.getPath.getName.startsWith("."))
        .flatMap(c => if (c.isDirectory) list(c.getPath) else Seq(c))
    }
    val files = paths.map(new Path(_)).flatMap(list).filter(_.getLen > 0)
    require(files.nonEmpty, s"no Avro files under ${paths.mkString(", ")}")
    val schemaJson = readerSchemaJson.getOrElse {
      val in = files.head.getPath.getFileSystem(conf).open(files.head.getPath)
      try {
        val s = new org.apache.avro.file.DataFileStream(
          in, new GenericDatumReader[GenericRecord]())
        val js = s.getSchema.toString
        s.close()
        js
      } finally in.close()
    }
    val readerSchema = new Schema.Parser().parse(schemaJson)
    require(readerSchema.getType == RECORD,
      s"top-level Avro schema must be a record; got ${readerSchema.getType}")
    val rowType = sparkType(readerSchema).asInstanceOf[StructType]
    val split = if (splitBytes > 0) splitBytes
      else spark.sessionState.conf.filesMaxPartitionBytes
    val ranges = files.flatMap { st =>
      (0L until st.getLen by split).map(off =>
        (st.getPath.toString, off, math.min(off + split, st.getLen)))
    }
    val serConf = new graft.core.SerializableHadoopConf(conf)
    val rows = spark.sparkContext
      .parallelize(ranges, ranges.size)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val fields = schema.getFields
        val n = fields.size
        val decConv = new Conversions.DecimalConversion()
        it.flatMap { case (pathStr, start, end) =>
          val datumReader = new GenericDatumReader[GenericRecord]()
          datumReader.setExpected(schema)
          val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
            new org.apache.avro.mapred.FsInput(new Path(pathStr), serConf.value),
            datumReader)
          reader.sync(start)
          Option(org.apache.spark.TaskContext.get).foreach(
            _.addTaskCompletionListener[Unit](_ => reader.close()))
          var reuse: GenericRecord = null
          new Iterator[Row] {
            def hasNext: Boolean = {
              val more = reader.hasNext && !reader.pastSync(end)
              if (!more) reader.close()
              more
            }
            def next(): Row = {
              reuse = reader.next(reuse)
              val out = new Array[Any](n)
              var i = 0
              while (i < n) {
                out(i) = convert(reuse.get(i), fields.get(i).schema, decConv)
                i += 1
              }
              Row.fromSeq(out.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rows, rowType)
  }

  /** Write `df` as Avro Object Container Files under `dir`, one file per
    * partition, written on the executors (no driver collect). The inverse
    * seam of [[readAvroFiles]] — it exists so round-trips and ingest
    * fixtures can produce real OCF inputs at any scale. `syncBytes`
    * bounds the approximate block size (small values create many sync
    * markers, which is what makes the files split-friendly).
    */
  def writeAvroFiles(
      df: DataFrame,
      schemaJson: String,
      dir: String,
      syncBytes: Int = 64 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    val parsed = new Schema.Parser().parse(schemaJson)
    require(parsed.getType == RECORD,
      s"top-level Avro schema must be a record; got ${parsed.getType}")
    val spark = df.sparkSession
    val serConf = new graft.core.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val names = df.schema.fieldNames
    val avroNames = parsed.getFields.asScala.map(_.name)
    require(avroNames == names.toBuffer,
      s"schema fields ${avroNames.mkString(",")} != df columns ${names.mkString(",")}")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val fields = schema.getFields
        val decConv = new Conversions.DecimalConversion()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$pid%05d.avro")
        val fs = path.getFileSystem(serConf.value)
        val out = fs.create(path, true)
        val writer =
          try {
            val w = new org.apache.avro.file.DataFileWriter(
              new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
            w.setSyncInterval(syncBytes)
            w.create(schema, out)
            w
          } catch {
            // a throw between fs.create and writer ownership would leak
            // the open stream (and its lease on HDFS-likes)
            case e: Throwable => out.close(); throw e
          }
        try {
          it.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < fields.size) {
              rec.put(i, toAvro(r.get(i), fields.get(i).schema, decConv))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
      }
    }
  }

  /** Read an Avro schema (.avsc JSON) off any Hadoop filesystem — the
    * reference's file-based schema provider seam
    * (ref: FilebasedSchemaProvider.java:55-60).
    */
  def schemaFromFile(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
