package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.file.DataFileStream
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** AvroStorage analog [R: src/org/apache/pig/builtin/AvroStorage.java]:
  * load/store Avro object-container files without the spark-avro
  * connector (absent in this offline environment) — built directly on
  * `avro` + `avro-mapred`, which DO ship with the Spark distribution.
  *
  * Scale design: reads go through `AvroKeyInputFormat`
  * (`newAPIHadoopFile`), so container files SPLIT at their sync markers
  * — a 100 TB Avro dataset fans out across executors exactly like
  * parquet does, no whole-file reads. Writes go through
  * `AvroKeyOutputFormat` (`saveAsNewAPIHadoopFile`), one container file
  * per partition. The writer schema is read once on the driver from the
  * first file header (the same discovery spark-avro performs); rows are
  * converted streaming per partition — records are materialized to Rows
  * immediately because the Hadoop record reader reuses its datum.
  *
  * Type surface (the subset the reference's AvroStorage maps to Pig
  * types, SURVEY.md §2.4): boolean/int/long/float/double/string/
  * bytes+fixed/enum(→string), array, map(string keys), nested record,
  * and `union[null, T]` as nullability. Logical types date and
  * timestamp-micros round-trip to DateType/TimestampType; other logical
  * types read as their underlying primitive. Multi-branch unions and
  * decimal are rejected loudly rather than silently coerced.
  */
object AvroStorage {

  // ---------------------------------------------------------------- read

  def avroLoader(spark: SparkSession, path: String): DataFrame =
    avroLoader(spark, path, None)

  /** Load with optional column pruning. When `columns` is given, a
    * projected READER schema (the requested fields only) is handed to
    * `AvroKeyInputFormat` via `avro.schema.input.key` — Avro's schema
    * resolution then binary-skips the dropped fields instead of
    * decoding them (the column-pruning analog for a row-major format;
    * a parquet scan prunes harder, but this is what Avro offers and it
    * matters at scale: a 2-column projection of a wide-text corpus
    * never materializes the text).
    */
  def avroLoader(spark: SparkSession, path: String,
                 columns: Option[Seq[String]]): DataFrame = {
    val writer = readWriterSchema(spark, path)
    val reader = columns match {
      case None => writer
      case Some(cols) =>
        val byName = writer.getFields.asScala.map(f => f.name -> f).toMap
        val keep = cols.map(c => byName.getOrElse(c,
          throw new IllegalArgumentException(
            s"column $c not in Avro writer schema ${writer.getFields.asScala.map(_.name).mkString("[", ",", "]")}")))
        Schema.createRecord(writer.getName, null, writer.getNamespace, false,
          keep.map(f => new Schema.Field(f.name, f.schema, null, f.defaultVal())).asJava)
    }
    val struct = avroToSpark(reader) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"top-level Avro schema must be a record, got $other")
    }
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, reader)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
    // convert inside the iterator, one record at a time: AvroKeyRecordReader
    // reuses its datum, so holding raw records past the next() call is unsafe
    val rows = rdd.mapPartitions(_.map { case (k, _) => recordToRow(k.datum(), struct) })
    spark.createDataFrame(rows, struct)
  }

  /** Driver-side schema discovery: first `.avro` (or `part-*`) file's
    * header under `path`. All files of one dataset are expected to share
    * the writer schema (true of anything [[storeAvro]] wrote).
    */
  private def readWriterSchema(spark: SparkSession, path: String): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus, not getFileStatus: newAPIHadoopFile itself expands
    // globs, so schema discovery must accept the same paths (a plain
    // file or dir is a 1-element glob match) — r17 review
    val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
    if (matches.isEmpty)
      throw new IllegalArgumentException(s"no files match $path")
    val file = matches.iterator
      .flatMap(m => if (m.isFile) Iterator(m.getPath)
        else fs.listStatus(m.getPath).iterator.map(_.getPath)
          .filter(f => f.getName.endsWith(".avro") || f.getName.startsWith("part-")))
      .toSeq.sortBy(_.getName)
      .headOption
      .getOrElse(throw new IllegalArgumentException(s"no avro files under $path"))
    val in = fs.open(file)
    try {
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  private[graft] def avroToSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      // the scaladoc's contract: decimal is rejected LOUDLY — returning
      // BinaryType here would hand callers the unscaled big-endian
      // bytes as if they were data (r17 review)
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Decimal])
        throw new IllegalArgumentException(
          s"unsupported Avro logical type decimal: $s — convert upstream")
      BinaryType
    case Schema.Type.ARRAY => ArrayType(avroToSpark(s.getElementType), containsNull = true)
    case Schema.Type.MAP => MapType(StringType, avroToSpark(s.getValueType), valueContainsNull = true)
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, avroToSpark(f.schema), nullable = isNullable(f.schema))
      })
    case Schema.Type.UNION => avroToSpark(nonNullBranch(s))
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The single non-null branch of a `union[null, T]`; anything wider is
    * rejected (the reference's Pig mapping has the same restriction for
    * types it can't represent).
    */
  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    if (branches.size != 1) throw new IllegalArgumentException(
      s"unsupported multi-branch Avro union: $s")
    branches.head
  }

  private[sources] def recordToRow(rec: GenericRecord, struct: StructType): Row = {
    // hot path: one Row per input record — fill a pre-sized array with a
    // while loop rather than mapping an immutable Seq (the decode is
    // row-at-a-time by nature; the least we can do is not double its
    // allocation rate)
    val fields = struct.fields
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = fromAvro(rec.get(i), fields(i).dataType)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, struct)
  }

  private def fromAvro(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8, String, EnumSymbol
      case BinaryType => v match {
        case b: ByteBuffer =>
          val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
        case f: GenericFixed => f.bytes().clone()
        case a: Array[Byte] => a
      }
      case TimestampType => // long micros (timestamp-micros logical type)
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType =>
        java.sql.Date.valueOf(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case ArrayType(el, _) =>
        // single pass into a pre-sized array (the old asScala.toSeq.map
        // copied every array twice on the decode hot path — r17 review)
        val c = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](c.size())
        val it = c.iterator()
        var i = 0
        while (it.hasNext) { out(i) = fromAvro(it.next(), el); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      case MapType(_, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> fromAvro(mv, vt)
        }.toMap
      case st: StructType => recordToRow(v.asInstanceOf[GenericRecord], st)
      case _ => v // boolean / int / long / float / double pass through
    }

  // --------------------------------------------------------------- write

  /** Store with overwrite semantics, matching the other `store*` helpers
    * in [[Loaders]]. One Avro container file per partition.
    */
  def storeAvro(df: DataFrame, path: String, recordName: String = "graft_record"): Unit = {
    val spark = df.sparkSession
    val avroSchema = sparkToAvroRecord(df.schema, recordName)
    val schemaJson = avroSchema.toString
    val struct = df.schema
    val pairs = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val nw = NullWritable.get()
      it.map(row => (new AvroKey[GenericRecord](rowToRecord(row, struct, schema)), nw))
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(hconf)
    // write to a temp sibling, swap on success: the old eager
    // fs.delete(target) ran BEFORE the lazy job, so overwriting a path
    // the frame was read from destroyed the input mid-plan, and any
    // job failure left neither old nor new data (r17 review)
    val tmp = new Path(target.getParent,
      s".${target.getName}_graft_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, avroSchema)
    try {
      pairs.saveAsNewAPIHadoopFile(tmp.toString, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
      if (fs.exists(target)) fs.delete(target, true)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"storeAvro: rename $tmp -> $target failed")
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  private[sources] def sparkToAvroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = sparkToAvro(f.dataType, s"${name}_${f.name}")
      val sch =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  private def sparkToAvro(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(el, containsNull) =>
      val e = sparkToAvro(el, s"${path}_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = sparkToAvro(vt, s"${path}_value")
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), v) else v)
    case st: StructType => sparkToAvroRecord(st, path)
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type for Avro store: $other (at $path)")
  }

  private[sources] def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val fieldSchema = unwrapNullable(schema.getFields.get(i).schema)
      rec.put(i, toAvro(row.get(i), st.fields(i).dataType, fieldSchema))
      i += 1
    }
    rec
  }

  /** Allocation-free for the common `union[null, T]` (this sits on the
    * per-row/per-element write path — r17 review); anything wider
    * still routes through nonNullBranch's loud rejection. */
  private def unwrapNullable(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val ts = s.getTypes
      if (ts.size == 2) {
        val a = ts.get(0)
        val b = ts.get(1)
        if (a.getType == Schema.Type.NULL) b
        else if (b.getType == Schema.Type.NULL) a
        else nonNullBranch(s)
      } else nonNullBranch(s)
    }

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case TimestampType => v match {
        case ts: java.sql.Timestamp =>
          Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
            ts.getNanos / 1000L
        case inst: java.time.Instant =>
          Math.multiplyExact(inst.getEpochSecond, 1000000L) + inst.getNano / 1000L
      }
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case ld: LocalDate => ld.toEpochDay.toInt
      }
      case ArrayType(el, _) =>
        val elemSchema = unwrapNullable(schema.getElementType)
        val out = new java.util.ArrayList[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(x => out.add(toAvro(x, el, elemSchema)))
        out
      case MapType(_, vt, _) =>
        val valSchema = unwrapNullable(schema.getValueType)
        val out = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach {
          case (k, mv) => out.put(k.toString, toAvro(mv, vt, valSchema))
        }
        out
      // sparkToAvro maps Short/Byte to Avro INT, so the VALUE must box
      // to Integer too: GenericData.resolveUnion's isInteger check is
      // `instanceof Integer`, and a boxed Short/Byte in union[null,int]
      // throws UnresolvedUnionException on the first non-null row
      // (r17 review, verified against the shipped avro 1.12.1)
      case ShortType => v.asInstanceOf[Short].toInt
      case ByteType => v.asInstanceOf[Byte].toInt
      case st: StructType => rowToRecord(v.asInstanceOf[Row], st, schema)
      case _ => v
    }
}
