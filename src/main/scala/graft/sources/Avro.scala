package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Self-contained Avro container-file source/sink over the core
  * `org.apache.avro` library that ships on Spark's classpath (the
  * `spark-avro` DataSource module is an external dependency and is
  * not available offline — same situation as Excel, solved the same
  * way: a small reader/writer over the public byte-level library,
  * not a scope note).
  *
  * Layout: the sink writes one Avro object-container file per
  * partition (executor-parallel, deflate-coded); the source lists the
  * directory and parallelizes PER FILE — the shape Avro data arrives
  * in at scale (a 100 TB Avro lake is many part files; within-file
  * sync-marker splitting is a further refinement a single reader
  * rarely needs when files are write-partitioned). Schema travels in
  * the container header, so reads need no inference pass.
  *
  * Type mapping (both directions): long/int/double/float/boolean/
  * string/bytes plus TIMESTAMP as the standard `timestamp-micros`
  * logical type; every field is written as the nullable union
  * `["null", T]` mirroring Spark's nullable columns. */
object Avro {

  /** Spark schema → Avro record schema (nullable-union fields). */
  def avroSchemaFor(st: StructType, name: String = "graft_row"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base: Schema = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"avro sink: unsupported column type ${other.simpleString} " +
            s"for field ${f.name}")
      }
      fs.name(f.name).`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), base)).withDefault(null)
    }.endRecord()
  }

  /** Avro record schema → Spark schema (inverse of [[avroSchemaFor]];
    * unwraps nullable unions). */
  def structFor(schema: Schema): StructType = {
    def unwrap(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    StructType(schema.getFields.asScala.map { f =>
      val s = unwrap(f.schema())
      val dt = s.getType match {
        case Schema.Type.LONG =>
          if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"avro source: unsupported avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable = true)
    }.toArray)
  }

  /** Executor-parallel sink: each partition writes
    * `part-<idx>.avro` under `dir` through the Hadoop FileSystem API
    * (works on any scheme the path names). */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st).toString
    val fieldTypes = st.fields.map(_.dataType)
    val spark = df.sparkSession
    val dPath = new Path(dir)
    val fs = dPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dPath)) fs.delete(dPath, true)
    fs.mkdirs(dPath)
    val confEntries = hadoopConfEntries(spark)
    val n = df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val part = new Path(s"$dir/part-$idx.avro")
      val pfs = part.getFileSystem(confFrom(confEntries))
      val out = pfs.create(part, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(schema, out)
      var c = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldTypes.length) {
          val v =
            if (row.isNullAt(i)) null
            else fieldTypes(i) match {
              case TimestampType => java.lang.Long.valueOf(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .instantToMicros(row.getTimestamp(i).toInstant))
              case BinaryType =>
                java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(i, v)
          i += 1
        }
        writer.append(rec)
        c += 1
      }
      writer.close()
      Iterator.single(c)
    }.count()
    require(n >= 0) // materialize the write job
  }

  /** Directory scan: schema from the first container header (no
    * inference pass over data), then one task per file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val dPath = new Path(dir)
    val fs = dPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dPath).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val confEntries = hadoopConfEntries(spark)
    val header = openReader(files.head, confFrom(confEntries))
    val avroSchema = header.getSchema
    header.close()
    val st = structFor(avroSchema)
    val schemaJson = avroSchema.toString
    val fieldTypes = st.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val expected = new Schema.Parser().parse(schemaJson)
        val reader = openReader(f, confFrom(confEntries), expected)
        // close exactly once, whether the iterator drains (hasNext
        // false), the consumer stops early (LIMIT — the task
        // completion listener fires), or both; a re-polled hasNext
        // after exhaustion must return false, not touch a closed
        // stream
        var closed = false
        def safeClose(): Unit = if (!closed) { closed = true; reader.close() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => safeClose())
        new Iterator[Row] {
          def hasNext: Boolean =
            !closed && { val h = reader.hasNext; if (!h) safeClose(); h }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fieldTypes.indices.map { i =>
              (rec.get(i), fieldTypes(i)) match {
                case (null, _) => null
                case (v, TimestampType) => java.sql.Timestamp.from(
                  org.apache.spark.sql.catalyst.util.DateTimeUtils
                    .microsToInstant(v.asInstanceOf[Long]))
                case (v, StringType) => v.toString
                case (v, BinaryType) =>
                  val bb = v.asInstanceOf[java.nio.ByteBuffer]
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case (v, _) => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, st)
  }

  /** The session's Hadoop configuration as a serializable entry list
    * — executor tasks must see the SAME conf the driver listed files
    * with (credentials, custom schemes); a bare `new Configuration()`
    * on the executor would silently drop every session setting. */
  private def hadoopConfEntries(spark: SparkSession): Array[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val buf = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.result()
  }

  private def confFrom(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def openReader(path: String, conf: Configuration,
                         expected: Schema = null)
      : DataFileReader[GenericRecord] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    val in = fs.open(p)
    val seekable = new org.apache.avro.file.SeekableInput {
      override def seek(pos: Long): Unit = in.seek(pos)
      override def tell(): Long = in.getPos
      override def length(): Long = status.getLen
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        in.read(b, off, len)
      override def close(): Unit = in.close()
    }
    val datumReader =
      if (expected == null) new GenericDatumReader[GenericRecord]()
      else new GenericDatumReader[GenericRecord](expected)
    new DataFileReader[GenericRecord](seekable, datumReader)
  }
}
